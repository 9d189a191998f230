package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MultimodalFunctions
import graft.pipeline.CorpusSource

/** Multimodal plumbing: resize arithmetic (exact vs the reference's
  * DetResizeForTest type-0 semantics), frame-sample explode shape, and
  * determinism of the stubbed decodes. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("resizePlan matches the reference arithmetic exactly") {
    import spark.implicits._
    // expected values computed with the reference's formula
    // (limit 960, int() truncation, banker's round to 32, floor 32)
    val cases = Seq(
      (640, 480) -> (640, 480),
      (1920, 1080) -> (960, 544),
      (2048, 2048) -> (960, 960),
      (100, 3000) -> (32, 960),
      (31, 31) -> (32, 32),
      (960, 960) -> (960, 960),
      (1000, 500) -> (960, 480),
      (1008, 504) -> (960, 480))
    val in = cases.map { case ((w, h), _) => (s"u${w}x$h", w, h) }
      .toDF("url", "width", "height")
    val got = MultimodalFunctions.resizePlan(in)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> (r.getInt(3), r.getInt(4))).toMap
    for ((in2, want) <- cases)
      assert(got(in2) == want, s"$in2: got ${got(in2)}, reference says $want")
  }

  test("frameSample: per-frame rows, bounded, deterministic") {
    val pages = CorpusSource.pages(spark, 48)
    val frames = MultimodalFunctions.frameSample(pages, strideBytes = 1024, maxFrames = 5)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    val byUrl = rows.groupBy(_.getString(0))
    assert(byUrl.size == 48) // every page yields at least one frame
    byUrl.values.foreach { fs =>
      val idxs = fs.map(_.getInt(1)).sorted
      assert(idxs.head == 0 && idxs.length <= 5)
      assert(idxs.toSeq == (0 until idxs.length)) // contiguous frame indices
      // 25fps spacing
      fs.foreach(r => assert(r.getLong(2) == r.getInt(1) * 40L))
    }
    // deterministic across runs
    val again = MultimodalFunctions.frameSample(pages, 1024, 5)
      .collect().map(_.toString).sorted.toSeq
    assert(again == rows.map(_.toString).sorted.toSeq)
    // larger payloads yield more frames (up to the cap)
    val counts = byUrl.map { case (u, fs) => u -> fs.length }
    assert(counts.values.exists(_ == 5) && counts.values.exists(_ < 5))
  }
}
