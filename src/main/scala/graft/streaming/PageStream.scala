package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.extract.{ExtractConfig, Extractor, ExtractorState}
import graft.model.PageRow

/** Streaming EXTRACTION: the same pure per-row kernel runs unchanged over a
  * file stream of page batches — the incremental-crawl-ingest shape
  * (readStream → stateless mapPartitions transform → append sink). Because
  * extraction is a pure function of the row (north rule), the drained
  * streaming output is byte-identical to the batch extraction of the same
  * pages — asserted in StreamingSpec. No state store is involved at all:
  * new crawl files become new micro-batches, each extracted exactly once,
  * and the append sink is the same per-bucket idempotent write the batch
  * pipeline uses.
  */
object PageStream {

  /** Run extraction as a real incremental stream over `pages` (staged to a
    * temp dir of several files; one file per micro-batch), drain, and return
    * (url, text, n_spans, charset, status) for every page. */
  def runStreamExtract(spark: SparkSession, pages: Dataset[PageRow],
                       cfg: ExtractConfig = ExtractConfig()): DataFrame = {
    import spark.implicits._
    StreamHarness.runDrained(spark, "graft_page_stream", "append") { staging =>
      pages.repartition(4).write.mode("overwrite").parquet(staging)
    } { staging =>
      spark.readStream
        .schema(pages.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        .as[PageRow]
        .mapPartitions { it =>
          val state = new ExtractorState()
          it.map { p =>
            val d = Extractor.extract(p.url, p.html, cfg, state)
            (d.url, d.text, d.nSpans, d.charset, d.status)
          }
        }
        .toDF("url", "text", "n_spans", "charset", "status")
    }.orderBy("url")
  }
}
