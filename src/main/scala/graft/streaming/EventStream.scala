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
    // state (maxFilesPerTrigger=1 → 8 micro-batches)
    // restaged on every call: a cached copy keyed by path would silently
    // stream stale rows if the source file were regenerated in place
    val staging = s"/tmp/graft_stream_in_${math.abs(dir.hashCode)}"
    batchDf.repartition(8).write.mode("overwrite").parquet(staging)
    val queryName = s"graft_stream_${System.nanoTime()}"
    val stream = spark.readStream
      .schema(batchDf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staging)
    val q = windowedAgg(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
      .orderBy("window_start", "event_type")
  }

  /** Batch equivalent (the oracle's formulation). */
  def runBatch(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(spark.read.parquet(s"$dir/events.parquet"))
      .orderBy("window_start", "event_type")
}
