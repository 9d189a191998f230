package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CorpusSource, ExtractPipeline}

/** The spark-submit CLI surface end-to-end: flags parse, the pipeline runs,
  * --resume completes only missing work, and flag-driven config reaches the
  * kernel. */
class MainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("CLI: extract then resume is a no-op; flags reach the kernel") {
    val in = tmp("graft-main-in")
    CorpusSource.pages(spark, 64).write.mode("overwrite").parquet(in)
    val out = tmp("graft-main-out")

    val (buckets1, docs1) = Main.run(spark, Array(
      "--in", in, "--out", out, "--buckets", "6", "--mega-buckets", "2"))
    assert(buckets1 > 0 && docs1 == 64)

    // resume over a complete output reprocesses nothing
    val (buckets2, docs2) = Main.run(spark, Array(
      "--in", in, "--out", out, "--buckets", "6", "--mega-buckets", "2", "--resume"))
    assert(buckets2 == 0 && docs2 == 64)

    // a config flag must actually reach the kernel: tiny byte cap → all docs
    // truncated in lineage
    val out2 = tmp("graft-main-out2")
    Main.run(spark, Array(
      "--in", in, "--out", out2, "--buckets", "6", "--mega-buckets", "2",
      "--max-html-bytes", "64"))
    val truncated = ExtractPipeline.lineage(spark, out2)
      .agg(org.apache.spark.sql.functions.sum("truncatedDocs")).head.getLong(0)
    assert(truncated > 50, s"expected most docs truncated, got $truncated")

    intercept[RuntimeException](Main.run(spark, Array("--out", out)))
    intercept[IllegalArgumentException](
      Main.run(spark, Array("--in", in, "--out", out, "stray")))
  }
}
