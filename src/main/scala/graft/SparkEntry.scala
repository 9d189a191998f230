package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusSource, Extract}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming: `x*` = extraction-engine queries over the synthesized
  * Common-Crawl-style pages corpus (north rule; no SQL oracle — verified
  * byte-exactly by the sbt golden suite instead); `q*` = relational recasts of
  * SURVEY.md §2 operators over the driver's parquet tables (DuckDB oracle);
  * `d*` = training-data ops over `documents`; `e*` = similarity ops over
  * `embeddings`.
  */
object SparkEntry {

  /** Flagship: full extraction pipeline over the synthesized golden corpus
    * (tokenize → arena DOM → block features → rule cascade → ordered spans →
    * assembled text). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    Extract.run(CorpusSource.pages(spark, 280))
      .toDF()
      .select(col("url"), col("text"), col("nSpans"), col("charset"), col("truncated"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extraction engine (pages corpus; golden-tested, rows-only here) ----
    "x01_extract" -> ((s, _) =>
      Extract.run(CorpusSource.pages(s, 280)).toDF()
        .select(col("url"), col("text"), col("nSpans").as("n_spans"),
          col("charset"), col("truncated"))),
    "x02_extract_spans" -> ((s, _) =>
      Extract.run(CorpusSource.pages(s, 280)).toDF()
        .select(col("url"), explode(col("spans")).as("s"))
        .select(col("url"), col("s.blockIdx").as("block_idx"),
          col("s.tagPath").as("tag_path"), col("s.start"), col("s.end"),
          col("s.label"), col("s.text"))),

    // ---- relational recasts (oracle-checked) ----
    // token counting over documents (SURVEY §2 text analysis)
    "d01_token_count" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id"))
  )

  def oracleSql: Map[String, String] = Map(
    "d01_token_count" ->
      """SELECT doc_id,
        |       len(string_split(text, ' '))::BIGINT AS n_tokens,
        |       length(text)::BIGINT AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
