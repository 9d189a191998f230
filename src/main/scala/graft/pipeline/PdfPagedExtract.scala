package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.extract.TextNormalizer
import graft.model.PageRow
import graft.pdf.PdfBranch

/** Mega-document tile-explode for the PDF branch (explicit skew handling,
  * SURVEY.md §4.4): a multi-page PDF payload is split into per-page rows, each
  * page is laid out independently (banded XY-cut), and the document is
  * reassembled by (url, page_idx) — the Spark recast of the reference's
  * slice-detect → offset-rebase → merge path (tools/infer/predict_system.py:
  * 86-107, check_and_read pdf explode at ppocr/utils/utility.py:119-152,
  * page concat at ppstructure/predict_system.py:343-388).
  *
  * Equivalence contract (tile seams must not change output): for every url,
  * `PdfPagedExtract.run(pages)` produces byte-identical text to the in-memory
  * single-pass `PdfBranch.extract` — property-tested in PdfPagedSpec. This is
  * the mechanism that lets one 10k-page PDF fan out across a cluster instead
  * of straggling one task.
  */
object PdfPagedExtract {

  final case class PdfPage(url: String, pageIdx: Int, pageW: Int, blocksSrc: String)
  final case class PageText(url: String, pageIdx: Int, text: String)

  /** Split a raw payload into per-page source fragments (cheap, streaming —
    * no layout work here; this is the explode side of the shuffle). */
  def splitPages(url: String, payload: Array[Byte]): Seq[PdfPage] = {
    if (!PdfBranch.isPdf(payload)) return Nil
    val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val out = Seq.newBuilder[PdfPage]
    var pageIdx = 0
    var curW = 0
    var inPage = false
    val buf = new StringBuilder
    for (line <- s.linesIterator) {
      if (line.startsWith("page ")) {
        if (inPage) { out += PdfPage(url, pageIdx, curW, buf.toString); pageIdx += 1; buf.clear() }
        val parts = line.split(" ")
        curW = if (parts.length >= 2) parts(1).toIntOption.getOrElse(0) else 0
        inPage = true
      } else if (line == "endpage") {
        if (inPage) { out += PdfPage(url, pageIdx, curW, buf.toString); pageIdx += 1; buf.clear() }
        inPage = false
      } else if (inPage) {
        buf.append(line).append('\n')
      }
    }
    if (inPage) out += PdfPage(url, pageIdx, curW, buf.toString)
    out.result()
  }

  /** Lay out one page (the per-tile work — independent, parallelizable). */
  def layoutPage(p: PdfPage): PageText = {
    val blocks = p.blocksSrc.linesIterator.zipWithIndex.flatMap { case (line, _) =>
      if (line.startsWith("block ")) {
        val parts = line.substring(6).split(" ", 5)
        if (parts.length == 5) {
          val txt = TextNormalizer.normalize(parts(4))
          if (txt.nonEmpty)
            Some(PdfBranch.PBlock(
              parts(0).toIntOption.getOrElse(0), parts(1).toIntOption.getOrElse(0),
              parts(2).toIntOption.getOrElse(0), parts(3).toIntOption.getOrElse(0),
              txt, 0, 0))
          else None
        } else None
      } else None
    }.toVector
    val ordered = PdfBranch.orderPage(p.pageW, blocks)
    PageText(p.url, p.pageIdx, ordered.map(_.text).mkString("\n\n"))
  }

  /** Distributed path: explode pages → per-page layout → reassemble by url.
    * One shuffle (the groupBy on url); page order restored by pageIdx sort
    * inside each group so the result is partition-order independent. The
    * payload is clamped to cfg.maxHtmlBytes BEFORE splitting, matching the
    * single-pass `PdfBranch.extract` truncation exactly. */
  def run(pages: Dataset[PageRow],
          cfg: graft.extract.ExtractConfig = graft.extract.ExtractConfig()): DataFrame = {
    import pages.sparkSession.implicits._
    pages
      .flatMap { p =>
        val payload =
          if (p.html != null && p.html.length > cfg.maxHtmlBytes)
            java.util.Arrays.copyOf(p.html, cfg.maxHtmlBytes)
          else p.html
        splitPages(p.url, payload)
      }
      .map(layoutPage)
      .groupByKey(_.url)
      .mapGroups { (url, it) =>
        val ordered = it.toArray.sortBy(_.pageIdx)
        (url, ordered.map(_.text).filter(_.nonEmpty).mkString("\n\n"))
      }
      .toDF("url", "text")
  }
}
