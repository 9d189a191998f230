package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** The incremental stream, drained, must equal the batch aggregation of the
  * same input (the oracle's invariant for s01). */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streamed windowed agg equals batch windowed agg") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStream.runStream(spark, dir).collect().map(_.toString).toSeq
    val batch = EventStream.runBatch(spark, dir).collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
