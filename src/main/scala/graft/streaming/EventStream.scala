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

  /** One emitted closed session (epochs in EXACT milliseconds — event times
    * carry sub-second fractions, and an integer-ms surface keeps the oracle
    * compare bit-exact where seconds would floor/round differently). */
  final case class SessionOut(user_id: Long, session_start_ms: Long,
                              session_end_ms: Long, n_events: Long)

  final case class SessionBuf(tss: List[Long])

  /** CUSTOM-STATE streaming sessionization (SURVEY §2.11's
    * mapGroupsWithState family): per user, buffer event times, split on
    * >`gapMs` gaps, and emit a session once the watermark has passed its
    * close boundary — `last + gap < watermark` STRICTLY, matching the
    * event-time-timeout firing rule (timeouts fire when wm > t), so the
    * drained emitted set is exactly the oracle's
    * `end_ms + gap_ms < max(ts)_ms − delay_ms` filter. Closure is safe by the
    * watermark contract: an event that could extend a closing session would
    * have ts < last+gap ≤ wm and be dropped as late data. State per user is
    * O(open-session events), evicted on close — bounded like s02's windows,
    * not complete-mode. */
  private def sessionFn(gapMs: Long)(
      uid: Long, it: Iterator[(Long, java.sql.Timestamp)],
      state: org.apache.spark.sql.streaming.GroupState[SessionBuf]): Iterator[SessionOut] = {
    val incoming = it.map(_._2.getTime).toList
    val buf = (state.getOption.map(_.tss).getOrElse(Nil) ++ incoming).sorted
    if (buf.isEmpty) { state.remove(); return Iterator.empty }
    val wmMs = state.getCurrentWatermarkMs()
    // gap-split the sorted buffer into sessions (all arithmetic in exact ms)
    val sessions = buf.tail.foldLeft(List(List(buf.head))) { (acc, t) =>
      if (t - acc.head.head <= gapMs) (t :: acc.head) :: acc.tail
      else List(t) :: acc
    }.map(_.reverse).reverse // each session ascending, sessions ascending
    val (closed, open) = sessions.partition(s => s.last + gapMs < wmMs)
    if (open.isEmpty) state.remove()
    else {
      state.update(SessionBuf(open.flatten))
      // EARLIEST open-session close boundary: a user can hold several open
      // sessions at once (no new data arriving for it), and a timeout at the
      // latest boundary would never fire for the earlier ones — each firing
      // closes what it can and re-arms at the next boundary.
      // Boundary note: Spark requires the armed timestamp be > watermark and
      // fires strictly past it, so when t == wm the arm clamps to wm+1 and a
      // FINAL watermark of exactly t+1 ms would leave that session unemitted
      // while the oracle counts it closed — a 1-ms alignment that is
      // irreducible under the >wm/> firing contract (any closure rule shifts
      // the same boundary). Everywhere t > wm the arming is exact.
      val t = open.head.last + gapMs
      state.setTimeoutTimestamp(math.max(t, wmMs + 1L))
    }
    closed.iterator.map(s => SessionOut(uid, s.head, s.last, s.length.toLong))
  }

  /** Streaming sessionization drained over the staged event log (same
    * time-ordered file replay as [[runStreamAppend]]). */
  def runStreamSessions(spark: SparkSession, dir: String,
                        delay: String = "10 minutes",
                        gapMs: Long = 300000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    StreamHarness.runDrained(spark, "graft_stream_sessions", "append") {
      stageOrderedByTs(batchDf)
    } { staging =>
      spark.readStream
        .schema(batchDf.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        .withColumn("ts", col("ts").cast("timestamp")) // NTZ → instant (UTC session)
        .withWatermark("ts", delay)
        .select(col("user_id").cast("long"), col("ts"))
        .as[(Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[SessionBuf, SessionOut](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionFn(gapMs))
        .toDF()
    }.orderBy("user_id", "session_start_ms")
  }

  /** Stage a batch DataFrame as a directory of files replayed in EVENT-TIME
    * order: a real append-mode ingest consumes a log tail, and round-robin
    * staging would race the watermark ahead on the first file and drop the
    * rest as late data. Range-partition by ts, sort within partitions, and
    * force ascending modification times so the file source (oldest-first)
    * replays the month in order. ONE definition — both append-mode surfaces
    * (windows s02, sessions s04) share the invariant. */
  private def stageOrderedByTs(batchDf: DataFrame)(staging: String): Unit = {
    batchDf.repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(staging)
    val parts = new java.io.File(staging).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val mtimeBase = System.currentTimeMillis() - 1000000
    parts.zipWithIndex.foreach { case (f, i) =>
      // fail LOUDLY: setLastModified returns false (no exception) on some
      // mounts, and with arbitrary task-completion mtimes the file source
      // replays out of event-time order — append-mode surfaces then drop
      // whole files as late data and silently diverge from the oracle
      require(f.setLastModified(mtimeBase + i * 10000),
        s"setLastModified failed for $f — replay order cannot be guaranteed")
    }
  }

  /** Exactly-once ingest dedup over an AT-LEAST-ONCE replay — the streaming
    * face of the pipeline's idempotent-commit story (north rule: a resumed
    * checkpoint redelivers its partition's rows; ExtractPipeline dedups by
    * bucket overwrite, a stream ingest dedups by key). Every staged file is
    * delivered TWICE (a `redeliver-` copy replayed right after its original);
    * `dropDuplicatesWithinWatermark(event_id)` suppresses the second
    * delivery while keeping state bounded by the watermark horizon — unlike
    * plain `dropDuplicates`, whose per-key state grows forever (at 10^12
    * events, the difference between a bounded state store and an unbounded
    * one). A redelivered row is either still inside the horizon (suppressed
    * by state) or already behind the watermark (dropped as late data) — both
    * paths keep the drained output exactly-once, so it equals the batch
    * table itself, which IS the oracle (s05). */
  def runStreamDedup(spark: SparkSession, dir: String,
                     delay: String = "10 minutes"): DataFrame = {
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    StreamHarness.runDrained(spark, "graft_stream_dedup", "append") { staging =>
      stageOrderedByTs(batchDf)(staging)
      val parts = new java.io.File(staging).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      parts.foreach { f =>
        val dup = new java.io.File(staging, f.getName.replace("part-", "redeliver-"))
        java.nio.file.Files.copy(f.toPath, dup.toPath)
        dup.setLastModified(f.lastModified() + 5000) // replay right after original
      }
    } { staging =>
      spark.readStream
        .schema(batchDf.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        .withColumn("ts", col("ts").cast("timestamp")) // NTZ → instant (UTC session)
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts").cast("timestamp_ntz").as("ts"), col("value"))
    }.orderBy("event_id")
  }

  /** Watermarked STREAM-STREAM inner join (the remaining Structured
    * Streaming primitive next to windows/custom state/dedup): purchases
    * joined to the same user's signups within a 6-hour attribution window.
    * Both sides carry watermarks and the join condition is time-bounded, so
    * Spark can size and EVICT join state from the two constraints — the
    * shape that stays bounded at 10^12 events, where an unbounded-state
    * stream join would accrete the whole log. Inner-join completeness:
    * every match is emitted as soon as both rows have arrived (emission
    * does not wait for the watermark); event-time-ordered replay keeps all
    * rows inside the horizon, so the drained output equals the batch join
    * of the same input — which IS the oracle (s06). Replay is 2 files per
    * trigger (2 incremental micro-batches + finals): a stream-stream join
    * materializes FOUR state-store instances per shuffle partition per
    * micro-batch, so 1-file triggers measured 2× the wall time for the
    * same verified result. */
  def runStreamJoin(spark: SparkSession, dir: String,
                    delay: String = "10 minutes"): DataFrame = {
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    StreamHarness.runDrained(spark, "graft_stream_join", "append") {
      stageOrderedByTs(batchDf)
    } { staging =>
      def src = spark.readStream
        .schema(batchDf.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(staging)
        .withColumn("ts", col("ts").cast("timestamp")) // NTZ → instant (UTC session)
      val signups = src.filter(col("event_type") === "signup")
        .withWatermark("ts", delay)
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("ts").as("signup_ts"))
      val purchases = src.filter(col("event_type") === "purchase")
        .withWatermark("ts", delay)
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("purchase_ts"), col("value"))
      signups.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("signup_ts") &&
          col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 6 HOURS"))
        .select(col("user_id"), col("signup_id"), col("purchase_id"),
          col("signup_ts").cast("timestamp_ntz").as("signup_ts"),
          col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"),
          col("value"))
    }.orderBy("signup_id", "purchase_id")
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
    StreamHarness.runDrained(spark, "graft_stream_append", "append") {
      stageOrderedByTs(batchDf)
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
        // the SHARED windowedAgg expressions (the file's one-definition
        // invariant — an inline copy here could silently diverge from the
        // batch/oracle surface); only the NTZ cast-back is layered on top
        .transform(windowedAgg)
        .withColumn("window_start", col("window_start").cast("timestamp_ntz"))
    }.orderBy("window_start", "event_type")
  }
}
