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
}
