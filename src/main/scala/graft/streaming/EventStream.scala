package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the events table.
  *
  * The reference is pure batch (SURVEY.md §2.11 — no watermarks/state
  * anywhere), so streaming is not part of the extraction contract; this
  * module exists because a Spark-native engine for the same data should also
  * ingest the stream-shaped `events` table incrementally. The invariant that
  * makes it verifiable: a windowed streaming aggregation, drained to
  * completion, must equal the batch aggregation of the same input — which is
  * exactly how the driver's DuckDB oracle checks it (s01 query).
  */
object EventStream {

  /** Windowed aggregation logic, shared verbatim by the batch and streaming
    * paths (same Column expressions → provably same semantics). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run the aggregation as a real incremental stream over the parquet dir
    * (file-source micro-batches, one file per trigger), drain it, and return
    * the final result. Complete output mode — the stream's state store holds
    * the running windows, exactly the mapGroupsWithState-family machinery the
    * batch engine never needs. */
  def runStream(spark: SparkSession, dir: String): DataFrame = {
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    // stage into a directory of several files: the file stream source requires
    // a directory, and >1 file exercises real multi-micro-batch incremental
    // state (maxFilesPerTrigger=1 → 4 micro-batches)
    StreamHarness.runDrained(spark, "graft_stream", "complete") { staging =>
      batchDf.repartition(4).write.mode("overwrite").parquet(staging)
    } { staging =>
      windowedAgg(spark.readStream
        .schema(batchDf.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging))
    }.orderBy("window_start", "event_type")
  }

  /** Batch equivalent (the oracle's formulation). */
  def runBatch(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(spark.read.parquet(s"$dir/events.parquet"))
      .orderBy("window_start", "event_type")

  /** Production ingest shape: watermark + APPEND mode — state is bounded
    * (closed windows are evicted and emitted exactly once) instead of the
    * complete-mode running table whose state grows with the window count.
    * Drained over a finite input, the emitted set is exactly the CLOSED
    * windows: window_end ≤ max(event ts) − delay (the final no-data
    * micro-batch advances the watermark to the global max). That makes it
    * oracle-expressible (s02) — and the still-open tail windows are the
    * documented difference from the batch answer. */
  def runStreamAppend(spark: SparkSession, dir: String,
                      delay: String = "10 minutes"): DataFrame = {
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    StreamHarness.runDrained(spark, "graft_stream_append", "append") { staging =>
      // a real append-mode ingest consumes files in event-time order (a log
      // tail); round-robin staging would race the watermark ahead on the
      // first file and drop the rest as late data. Range-partition by ts and
      // force ascending modification times so the file source (oldest-first)
      // replays the month in order.
      batchDf.repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(staging)
      val parts = new java.io.File(staging).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      val mtimeBase = System.currentTimeMillis() - 1000000
      parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(mtimeBase + i * 10000) }
    } { staging =>
      spark.readStream
        .schema(batchDf.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        // watermarks require TIMESTAMP (instant); the table stores
        // TIMESTAMP_NTZ. The session is pinned to UTC so the round-trip is
        // lossless; the output window casts back to NTZ to match the
        // batch/oracle surface (s01).
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select(col("w.start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
    }.orderBy("window_start", "event_type")
  }
}
