package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.corpus.Corpus
import graft.extract.{ExtractConfig, Extractor, ExtractorState}
import graft.model.{ExtractedDoc, PageRow}

/** Distributed synthetic corpus source. Pure function of (seed, index), so the
  * corpus parallelizes embarrassingly via spark.range → mapPartitions with no
  * shuffle and no driver-side materialization (scales to any row count — the
  * sandbox proxy for reading the 10^12-row Iceberg pages table).
  */
object CorpusSource {
  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
            partitions: Int = 0): Dataset[PageRow] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    base.mapPartitions(_.map(i => Corpus.page(seed, i.toInt).row))
  }

  def goldenExpected(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[(String, String)] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val g = Corpus.page(seed, i.toInt)
      (g.row.url, g.expectedText)
    })
  }

  def goldenLabels(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[(String, Seq[String])] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val g = Corpus.page(seed, i.toInt)
      (g.row.url, g.expectedLabels: Seq[String])
    })
  }
}

/** The extraction stage: one narrow mapPartitions over pages — no shuffle
  * (SURVEY.md §3.1 recast: read → extract → write is a single Spark stage).
  * Arena state is constructed once per partition and reused across documents
  * (≡ the reference building its predictors once per process,
  * tools/infer/predict_system.py:47-75).
  */
object Extract {
  def run(pages: Dataset[PageRow], cfg: ExtractConfig = ExtractConfig()): Dataset[ExtractedDoc] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      val state = new ExtractorState()
      it.map(p => Extractor.extract(p.url, p.html, cfg, state))
    }
  }
}
