package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Deterministic hash split (d39): threshold construction, stability under
  * reshuffle/parallelism, fraction accuracy, and the ID-keyed (not
  * content-keyed) contract.
  */
class SplitSpec extends AnyFunSuite {

  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("thresholds: cumulative 8-hex boundaries, order-preserving") {
    val ths = TextFunctions.hashSplitThresholds(
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    assert(ths == Seq(("train", "cccccccc"), ("val", "e6666666"), ("test", "ffffffff")))
    assert(TextFunctions.hashSplitThresholds(Seq(("all", 1.0))) == Seq(("all", "ffffffff")))
    intercept[IllegalArgumentException] {
      TextFunctions.hashSplitThresholds(Seq(("a", 0.5), ("b", 0.4)))
    }
  }

  test("split is a pure function of (doc_id, salt): partitioning-invariant") {
    val s = spark; import s.implicits._
    def run(parts: Int) = {
      val docs = s.range(0, 1000, 1, parts).select(col("id").as("doc_id"))
      TextFunctions.hashSplit(docs, Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    }
    assert(run(1) == run(7))
    // content changes don't move a document across splits (id-keyed)
    val a = TextFunctions.hashSplit(
      Seq((5L, "old text")).toDF("doc_id", "text"), Seq(("x", 1.0))).collect()
    val b = TextFunctions.hashSplit(
      Seq((5L, "new text")).toDF("doc_id", "text"), Seq(("x", 1.0))).collect()
    assert(a.head.getString(1) == b.head.getString(1)) // same bucket hex
  }

  test("fractions: 10k ids land within 2% of the requested split masses") {
    val s = spark; import s.implicits._
    val docs = s.range(10000).select(col("id").as("doc_id"))
    val counts = TextFunctions.hashSplit(docs,
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") / 10000.0 - 0.8) < 0.02, counts)
    assert(math.abs(counts("val") / 10000.0 - 0.1) < 0.02, counts)
    assert(math.abs(counts("test") / 10000.0 - 0.1) < 0.02, counts)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
