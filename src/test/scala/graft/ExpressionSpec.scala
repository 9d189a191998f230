package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Corpus
import graft.expressions.GraftExpressions
import graft.extract.{ExtractConfig, Extractor}
import graft.pipeline.CorpusSource

/** The Catalyst-expression SQL surface must agree exactly with the kernel it
  * wraps, and the codegen'd token counter must stay inside WholeStageCodegen.
  */
class ExpressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("graft_extract_text(html) == Extractor.extract(html).text") {
    GraftExpressions.register(spark)
    CorpusSource.pages(spark, 56).createOrReplaceTempView("pages_expr_test")
    val got = spark.sql(
      "SELECT url, graft_extract_text(html) AS text FROM pages_expr_test")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    Corpus.pages(42L, 56).foreach { g =>
      val want = Extractor.extract(g.row.url, g.row.html, ExtractConfig()).text
      assert(got(g.row.url) == want, s"expression/kernel divergence at ${g.row.url}")
    }
  }

  test("graft_token_count matches size(split()) semantics on single-spaced text") {
    GraftExpressions.register(spark)
    import spark.implicits._
    val df = Seq("one two three", "a", "", "  padded  out  ", "tab\tsep\nnl")
      .toDF("s")
    val got = df.select(GraftExpressions.token_count(col("s")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 1L, 0L, 2L, 3L))
  }

  test("token counter runs inside WholeStageCodegen") {
    GraftExpressions.register(spark)
    val df = spark.range(100)
      .select(concat(lit("w"), col("id"), lit(" x y")).as("s"))
      .select(GraftExpressions.token_count(col("s")).as("n"))
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_token_count"), s"no codegen span in:\n$plan")
    assert(df.agg(sum("n")).head.getLong(0) == 300L)
  }
}
