package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MetricsAggregator

/** RecMetric-graft aggregator: unit behavior + the corpus-level invariant that
  * extraction matches golden exactly (exactMatch == 1.0). */
class MetricsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("levenshtein basics") {
    import MetricsAggregator.levenshtein
    assert(levenshtein("", "") == 0)
    assert(levenshtein("abc", "abc") == 0)
    assert(levenshtein("abc", "abd") == 1)
    assert(levenshtein("kitten", "sitting") == 3)
    assert(levenshtein("", "xyz") == 3)
  }

  test("aggregator computes exact-match rate and mean normalized edit distance") {
    import spark.implicits._
    val pairs = Seq(
      MetricsAggregator.Pair("same", "same"),
      MetricsAggregator.Pair("abcd", "abcx"), // norm edit 0.25
      MetricsAggregator.Pair("", "")
    ).toDS()
    val m = MetricsAggregator.extractionQa(pairs).head()
    assert(m.total == 3L)
    assert(math.abs(m.exactMatch - 2.0 / 3.0) < 1e-12)
    assert(math.abs(m.meanNormEdit - 0.25 / 3.0) < 1e-12)
  }

  test("corpus extraction QA: exact match rate is 1.0 against golden (x08)") {
    val row = SparkEntry.queries("x08_extraction_qa")(spark, "").head()
    assert(row.getDouble(0) == 1.0, s"exactMatch=${row.getDouble(0)}")
    assert(row.getDouble(1) == 0.0)
    assert(row.getLong(2) == 280L)
  }

  test("det aggregator: global-sum precision/recall/hmean from hand-computed counts") {
    import spark.implicits._
    val pairs = Seq(
      // 2 of 3 predicted match; gt has 4 blocks (one missed entirely)
      MetricsAggregator.LabelPair(Seq("title", "content", "cell"),
        Seq("title", "content", "content", "content")),
      // perfect doc
      MetricsAggregator.LabelPair(Seq("content"), Seq("content")),
      // empty prediction, non-empty gt (decode loss): counts only toward gt
      MetricsAggregator.LabelPair(Seq(), Seq("content", "content"))
    ).toDS()
    val m = MetricsAggregator.detectionQa(pairs).head()
    assert(m.matched == 3L && m.det == 4L && m.gt == 7L)
    assert(math.abs(m.precision - 3.0 / 4.0) < 1e-12)
    assert(math.abs(m.recall - 3.0 / 7.0) < 1e-12)
    val p = 3.0 / 4.0; val r = 3.0 / 7.0
    assert(math.abs(m.hmean - 2 * p * r / (p + r)) < 1e-12)
  }

  test("corpus detection QA: span labels match golden exactly (x14, hmean 1.0)") {
    val row = SparkEntry.queries("x14_det_metric")(spark, "").head()
    assert(row.getDouble(0) == 1.0, s"precision=${row.getDouble(0)}")
    assert(row.getDouble(1) == 1.0, s"recall=${row.getDouble(1)}")
    assert(row.getDouble(2) == 1.0)
    assert(row.getLong(4) == row.getLong(5)) // det == gt block counts
  }
}
