package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Corpus
import graft.extract.ExtractConfig
import graft.pdf.PdfBranch
import graft.pipeline.{CorpusSource, PdfPagedExtract}

/** Tile-seam equivalence (SURVEY.md §7.4 hard part #3): the distributed
  * page-explode path must be byte-identical to the in-memory single-pass PDF
  * extraction for every document — splitting a mega-document across tasks may
  * never change its text.
  */
class PdfPagedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("page-explode extraction == single-pass extraction for all PDF fixtures") {
    val n = 160
    val exploded = PdfPagedExtract.run(CorpusSource.pages(spark, n, partitions = 16))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val goldens = Corpus.pages(42L, n).filter(g => PdfBranch.isPdf(g.row.html))
    assert(goldens.nonEmpty)
    goldens.foreach { g =>
      val single = PdfBranch.extract(g.row.url, g.row.html, ExtractConfig()).text
      assert(exploded(g.row.url) == single, s"tile-seam divergence at ${g.row.url}")
      assert(single == g.expectedText, s"golden divergence at ${g.row.url}")
    }
    // non-PDF pages must not leak into the exploded output
    assert(exploded.size == goldens.size)
  }

  test("an unparsable PDF payload yields a sentinel row, not silence") {
    import spark.implicits._
    // %PDF magic but no parsable structure → pdf_unparsed; the paged path
    // must report the same loss the single-pass path records (ADVICE r2)
    val junk = "%PDF-1.7\nthis is not a real pdf body".getBytes("UTF-8")
    val ds = spark.createDataset(Seq(
      graft.model.PageRow("u://broken", new java.sql.Timestamp(0L), junk, null, "en")))
    val rows = PdfPagedExtract.run(ds).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "u://broken")
    assert(rows(0).getString(1) == "")
    assert(rows(0).getString(2) == "pdf_unparsed")
    val single = PdfBranch.extract("u://broken", junk, ExtractConfig())
    assert(single.text == rows(0).getString(1))
    assert(single.status == rows(0).getString(2))
  }

  test("run() carries status/truncated: paged == single-pass on every PDF fixture") {
    val n = 160
    val byUrl = PdfPagedExtract.run(CorpusSource.pages(spark, n))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3)))).toMap
    Corpus.pages(42L, n).filter(g => PdfBranch.isPdf(g.row.html)).foreach { g =>
      val single = PdfBranch.extract(g.row.url, g.row.html, ExtractConfig())
      val (text, status, trunc) = byUrl(g.row.url)
      assert(text == single.text)
      assert(status == single.status, g.row.url)
      assert(trunc == single.truncated, g.row.url)
    }
  }

  test("a many-page document splits into that many independent page rows") {
    val payload = ("%PDF-GRAFT 1.0\n" + (0 until 50).map { i =>
      s"page 800 1200\nblock 50 100 700 80 page $i text here\nendpage"
    }.mkString("\n") + "\n").getBytes("UTF-8")
    val pages = PdfPagedExtract.splitPages(0L, "u", payload, ExtractConfig())
    assert(pages.length == 50)
    assert(pages.map(_.pageIdx) == (0 until 50))
    val single = PdfBranch.extract("u", payload, ExtractConfig()).text
    val reassembled = pages.map(PdfPagedExtract.layoutPage)
      .sortBy(_.pageIdx).map(_.text).filter(_.nonEmpty).mkString("\n\n")
    assert(reassembled == single)
  }
}
