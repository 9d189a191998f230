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

  test("streaming extraction is byte-identical to batch extraction") {
    import graft.pipeline.{CorpusSource, Extract}
    val pages = CorpusSource.pages(spark, 96)
    val streamed = graft.streaming.PageStream.runStreamExtract(spark, pages)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
    val batch = Extract.run(pages).collect()
      .map(d => d.url -> (d.text, d.nSpans)).toMap
    assert(streamed.size == 96 && streamed == batch)
  }

  test("stateful sessionization emits exactly the closed sessions (batch-derived set)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStream.runStreamSessions(spark, dir)
      .collect().map(_.toString).toSeq
    // batch derivation of the SAME rule: gap-split per user in exact ms,
    // sessions closed iff end + gap < max(ts) − delay (the final watermark)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id").cast("long").as("user_id"),
        (unix_millis(col("ts").cast("timestamp"))).as("ms"))
    val mx = ev.agg(max(col("ms"))).head.getLong(0)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
    val batch = ev
      .withColumn("prev", lag(col("ms"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("ms") - col("prev") > 300000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ms")).as("session_start_ms"), max(col("ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .filter(col("session_end_ms") + 300000L < mx - 600000L)
      .select(col("user_id"), col("session_start_ms"), col("session_end_ms"),
        col("n_events"))
      .orderBy("user_id", "session_start_ms")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("at-least-once replay dedups to exactly-once: drained output equals the batch table") {
    val dir = "/root/testdata/sf0.001"
    // every staged file is redelivered once (2000 input rows for 1000 events);
    // dropDuplicatesWithinWatermark must emit each event EXACTLY once — a
    // redelivered row is either suppressed by state (inside the horizon) or
    // dropped as late data (behind the watermark), never re-emitted
    val streamed = EventStream.runStreamDedup(spark, dir)
      .collect().map(_.toString).toSeq
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "user_id", "event_type", "ts", "value")
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(streamed.size == 1000, s"expected 1000 exactly-once rows, got ${streamed.size}")
    assert(streamed == batch)
  }

  test("append-mode stream emits exactly the watermark-closed windows") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val appended = EventStream.runStreamAppend(spark, dir, "10 minutes")
      .collect().map(_.toString).toSeq
    // expected: batch agg restricted to windows with end <= max(ts) - delay
    val events = spark.read.parquet(s"$dir/events.parquet")
    val maxTs = events.agg(max(col("ts"))).head
      .getAs[java.time.LocalDateTime](0)
    val closedBound = maxTs.minusMinutes(10)
    val closed = EventStream.windowedAgg(events)
      .filter(col("window_start") + expr("INTERVAL 5 MINUTES") <= lit(closedBound))
      .orderBy("window_start", "event_type")
      .collect().map(_.toString).toSeq
    assert(appended.nonEmpty)
    assert(appended == closed,
      s"append emitted ${appended.size} windows, closed-filter expects ${closed.size}")
  }
}
