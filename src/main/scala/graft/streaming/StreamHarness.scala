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
    stage(staging)
    val queryName = s"${prefix}_${System.nanoTime()}"
    val q = build(staging).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
    }
    spark.table(queryName)
  }
}
