package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared drain-a-finite-stream lifecycle for the streaming surfaces: stage
  * inputs into a fresh temp dir (per-call: no cross-run collisions, stays in
  * sync if the source is regenerated), run the built stream into a memory
  * sink until drained, clean up, return the sink table. One definition so a
  * lifecycle fix (e.g. cleanup ordering) cannot miss a surface. */
private[streaming] object StreamHarness {

  def runDrained(spark: SparkSession, prefix: String, outputMode: String)
                (stage: String => Unit)(build: String => DataFrame): DataFrame = {
    val staging = java.nio.file.Files.createTempDirectory(prefix).toString
    val queryName = s"${prefix}_${System.nanoTime()}"
    // Stateful micro-batches are STATE-STORE-bound here, not data-bound: every
    // shuffle partition materializes its own store instance per stateful
    // operator per micro-batch (a stream-stream join keeps FOUR per
    // partition), so 32 partitions × stores × batches is pure commit/IO
    // overhead on these inputs. Cap the streaming queries at 8 — results are
    // partition-count-independent (oracle-pinned) — and restore the session
    // conf afterwards so batch queries keep their configured width. On a real
    // cluster the same knob is sized to executor count, not left at the
    // batch-shuffle width.
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, math.min(prev.toInt, 8).toString)
    try {
      // stage INSIDE the try: a staging failure (disk full mid-write) must
      // not leak the temp directory past the finally below
      stage(staging)
      val q = build(staging).writeStream
        .outputMode(outputMode)
        .format("memory")
        .queryName(queryName)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    } finally {
      spark.conf.set(key, prev)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
    }
    // materialize the drained rows (localCheckpoint — the repo's own
    // materialization discipline; released when the returned DF is GC'd),
    // then DROP the memory-sink table: each call registers a uniquely-named
    // temp view holding the whole result in driver memory, and without the
    // drop a long-lived session accumulates one per streaming invocation,
    // unbounded and unreleasable
    val out = spark.table(queryName).localCheckpoint()
    spark.catalog.dropTempView(queryName)
    out
  }
}
