package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.{ExtractConfig, Extractor, ExtractorState}
import graft.model.{PageRow, Span}

/** One extracted-output row as persisted (per-doc stage nanos ride along so the
  * per-partition lineage can be re-aggregated from *committed* data, never from
  * in-flight state — the write IS the checkpoint).
  */
final case class ExtractedRow(
    bucket: Int,
    url: String,
    text: String,
    nSpans: Int,
    spans: Seq[Span],
    charset: String,
    truncated: Boolean,
    docStatus: String, // "ok" | "pdf_partial" | "pdf_unparsed" (per-doc parse outcome)
    htmlBytes: Long,
    tokenizeNanos: Long,
    domNanos: Long,
    classifyNanos: Long,
    assembleNanos: Long
)

/** Pipeline config (bucket counts sized for the sandbox; at cluster scale
  * `numBuckets` would be O(10^5) for a 10^12-row table — the mechanism is
  * identical because buckets, not Spark partitions, are the checkpoint unit).
  */
final case class PipelineConf(
    numBuckets: Int = 64,
    /** payloads >= this many bytes are "mega documents": routed to dedicated
      * buckets so one outlier cannot straggle a bucket of normal pages — the
      * graft of the reference's recursive slice path for extreme-aspect inputs
      * (tools/infer/predict_det.py:307-408) expressed as partition routing. */
    megaBytes: Int = 1 << 20,
    megaBuckets: Int = 8,
    extract: ExtractConfig = ExtractConfig()
)

/** Checkpoint/resume extraction pipeline (north rule):
  *
  *  - every page gets a deterministic bucket = f(url, |html|): murmur3(url) mod
  *    numBuckets for normal pages, a dedicated mega-bucket range for outliers
  *    (size-balanced salting: the explicit skew handling of SURVEY.md §4.4);
  *  - extraction runs as one narrow mapPartitions after a single repartition
  *    on bucket (the only shuffle in the job);
  *  - output is written parquet partitioned BY bucket with dynamic partition
  *    overwrite → per-bucket idempotent commits (Iceberg-style overwrite-by-
  *    partition without needing the Iceberg runtime in this sandbox);
  *  - lineage rows (status, doc/byte counts, per-stage nanos ≡ the reference's
  *    time_dict, tools/infer/predict_system.py:77) are aggregated from the
  *    *written* files and appended to a lineage table — a bucket is "ok" iff
  *    its data is committed;
  *  - resume = re-run with `resume = true`: buckets already "ok" in lineage are
  *    filtered out of the input before the shuffle, everything else reruns;
  *    dynamic overwrite makes reruns of half-written buckets safe.
  */
object ExtractPipeline {

  def bucketOf(url: String, htmlLen: Int, conf: PipelineConf): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(if (url == null) "" else url)
    if (htmlLen >= conf.megaBytes)
      conf.numBuckets + Math.floorMod(h, conf.megaBuckets)
    else Math.floorMod(h, conf.numBuckets)
  }

  def lineageDir(outDir: String): String = s"$outDir/_lineage"
  def dataDir(outDir: String): String = s"$outDir/data"

  /** Buckets marked ok in the lineage table (empty if no lineage yet).
    * Existence is probed through Hadoop's FileSystem so --resume works on
    * HDFS/S3 paths too, not just local disk (a java.io.File probe is always
    * false off local disk and would silently reprocess every bucket). */
  def completedBuckets(spark: SparkSession, outDir: String): Set[Int] = {
    val path = new org.apache.hadoop.fs.Path(lineageDir(outDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Set.empty
    import spark.implicits._
    spark.read.parquet(lineageDir(outDir))
      .filter(col("status") === "ok")
      .select(col("bucket")).as[Int].collect().toSet
  }

  /** Run (or resume) the pipeline. Returns the number of buckets processed in
    * THIS run. `onlyBuckets` restricts processing (used by tests to simulate a
    * run that died before finishing every bucket).
    */
  def run(spark: SparkSession, pages: Dataset[PageRow], outDir: String,
          conf: PipelineConf = PipelineConf(), resume: Boolean = false,
          onlyBuckets: Option[Set[Int]] = None, attempt: Int = 0): Long = {
    import spark.implicits._
    // save/restore (the StreamHarness discipline): leaving `dynamic` set on
    // the shared session would silently change every LATER partitioned
    // overwrite in it from replace-table to replace-touched-partitions
    val overwriteKey = "spark.sql.sources.partitionOverwriteMode"
    val prevOverwrite = spark.conf.getOption(overwriteKey)
    spark.conf.set(overwriteKey, "dynamic")
    try runGuarded(spark, pages, outDir, conf, resume, onlyBuckets, attempt)
    finally prevOverwrite match {
      case Some(v) => spark.conf.set(overwriteKey, v)
      case None    => spark.conf.unset(overwriteKey)
    }
  }

  private def runGuarded(spark: SparkSession, pages: Dataset[PageRow],
                         outDir: String, conf: PipelineConf, resume: Boolean,
                         onlyBuckets: Option[Set[Int]], attempt: Int): Long = {
    import spark.implicits._

    val done: Set[Int] = if (resume) completedBuckets(spark, outDir) else Set.empty

    val bucketed = pages.map { p =>
      val len = if (p.html == null) 0 else p.html.length
      (bucketOf(p.url, len, conf), p)
    }.toDF("bucket", "page")

    val remaining0 =
      if (done.isEmpty) bucketed
      else bucketed.filter(!col("bucket").isin(done.toSeq: _*))
    val remaining = onlyBuckets match {
      case Some(bs) => remaining0.filter(col("bucket").isin(bs.toSeq: _*))
      case None     => remaining0
    }

    val totalParts = conf.numBuckets + conf.megaBuckets
    // set-of-buckets actually processed in THIS run (task retries may re-add —
    // harmless for a set); lineage must not re-mark stale buckets left in the
    // output dir by earlier runs with different inputs/configs
    val seenBuckets = spark.sparkContext.collectionAccumulator[Int]("bucketsWritten")
    val extracted = remaining
      .repartition(totalParts, col("bucket"))
      // size-ordered processing within each partition (SURVEY.md §4.3, the
      // reference's sort-crops-by-aspect-ratio idea): arena buffers grow
      // monotonically instead of oscillating, and the large stragglers of a
      // partition cluster at its tail
      .sortWithinPartitions(length(col("page.html")))
      .as[(Int, PageRow)]
      .mapPartitions { it =>
        val state = new ExtractorState()
        val localSeen = new java.util.HashSet[Int]()
        it.map { case (bucket, p) =>
          if (localSeen.add(bucket)) seenBuckets.add(bucket)
          val t0 = state.tokenizeNanos; val d0 = state.domNanos
          val c0 = state.classifyNanos; val a0 = state.assembleNanos
          val doc = Extractor.extract(p.url, p.html, conf.extract, state)
          ExtractedRow(bucket, doc.url, doc.text, doc.nSpans, doc.spans,
            doc.charset, doc.truncated, doc.status,
            if (p.html == null) 0L else p.html.length.toLong,
            state.tokenizeNanos - t0, state.domNanos - d0,
            state.classifyNanos - c0, state.assembleNanos - a0)
        }
      }

    extracted.write
      .partitionBy("bucket")
      .mode(SaveMode.Overwrite)
      .parquet(dataDir(outDir))

    // Lineage from committed data only: re-read exactly the buckets this run
    // wrote (never stale buckets left in the dir by earlier runs).
    import scala.jdk.CollectionConverters._
    val written = seenBuckets.value.asScala.toSet
    if (written.isEmpty) return 0L
    val touched = spark.read.parquet(dataDir(outDir))
      .filter(col("bucket").isin(written.toSeq: _*))
    val lineage = touched.groupBy(col("bucket")).agg(
      lit("ok").as("status"),
      lit(attempt).as("attempt"),
      count(lit(1)).as("docs"),
      sum(col("htmlBytes")).as("bytes"),
      sum(when(length(col("text")) === 0, 1L).otherwise(0L)).as("emptyDocs"),
      sum(when(col("truncated"), 1L).otherwise(0L)).as("truncatedDocs"),
      sum(when(col("docStatus") =!= "ok", 1L).otherwise(0L)).as("unparsedDocs"),
      sum(col("tokenizeNanos")).as("tokenizeNanos"),
      sum(col("domNanos")).as("domNanos"),
      sum(col("classifyNanos")).as("classifyNanos"),
      sum(col("assembleNanos")).as("assembleNanos")
    )
    // no pre-count: written.nonEmpty already guarantees rows (each written
    // bucket committed ≥1 row), and a count() here re-ran the whole lineage
    // aggregation as a second job before the write
    lineage.write.mode(SaveMode.Append).parquet(lineageDir(outDir))
    written.size.toLong
  }

  /** The final extracted table (all committed buckets). */
  def output(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(dataDir(outDir))

  /** The lineage/metrics table. */
  def lineage(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(lineageDir(outDir))
}
