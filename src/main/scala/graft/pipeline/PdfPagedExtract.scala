package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.model.PageRow
import graft.pdf.PdfBranch

/** Mega-document tile-explode for the PDF branch (explicit skew handling,
  * SURVEY.md §4.4): a multi-page PDF payload is split into per-page rows, each
  * page is laid out independently (banded XY-cut), and the document is
  * reassembled by a per-row id — the Spark recast of the reference's
  * slice-detect → offset-rebase → merge path (tools/infer/predict_system.py:
  * 86-107, check_and_read pdf explode at ppocr/utils/utility.py:119-152,
  * page concat at ppstructure/predict_system.py:343-388).
  *
  * Both the %PDF-GRAFT mini format and real PDFs ride the same path: pages
  * come from `PdfBranch.parsePayload` and are re-serialized into the
  * line-per-block mini form for the explode, so the per-page layout work
  * (XY-cut) and the page-concat are format-agnostic. Scale note: for real
  * PDFs the structural parse (object scan + inflate) runs on the explode
  * side; at cluster scale the cheaper split would ship each page's still-
  * compressed content stream and inflate per task — same dataflow, deferred
  * decode. The sandbox keeps decode on the explode side for simplicity; the
  * layout work (the actual per-page CPU) is what gets distributed.
  *
  * Equivalence contract (tile seams must not change output): for every row,
  * `PdfPagedExtract.run(pages)` produces byte-identical text to the in-memory
  * single-pass `PdfBranch.extract` — property-tested in PdfPagedSpec. This is
  * the mechanism that lets one 10k-page PDF fan out across a cluster instead
  * of straggling one task.
  *
  * Reassembly keys on a per-row uid (partitionId ⊕ in-partition index), not
  * the url: real crawl data contains duplicate urls, and grouping by url
  * would interleave two distinct documents into one (ADVICE r1).
  */
object PdfPagedExtract {

  final case class PdfPage(rowUid: Long, url: String, pageIdx: Int, pageW: Int,
                           blocksSrc: String, status: String, truncated: Boolean)
  final case class PageText(rowUid: Long, url: String, pageIdx: Int, text: String,
                            status: String, truncated: Boolean)

  /** Split a payload into per-page block-source fragments via the shared
    * parser (mini format: line scan; real PDF: object scan + inflate).
    *
    * A payload whose parse yields NO pages (pdf_unparsed, or an empty but
    * well-formed file) emits a single sentinel page (pageIdx = -1, no blocks)
    * so the document cannot vanish from the reassembled output — the
    * single-pass `PdfBranch.extract` emits an empty-text row with the parse
    * status, and "decode loss is never silent" holds on this surface too. */
  def splitPages(rowUid: Long, url: String, payload: Array[Byte],
                 cfg: graft.extract.ExtractConfig,
                 byteTruncated: Boolean = false): Seq[PdfPage] = {
    // non-PDF (incl. null) payloads yield NOTHING here by CONTRACT, not by
    // accident (PdfPagedSpec pins it): this surface runs over a MIXED
    // corpus and extracts only the PDF branch — HTML rows flow through the
    // HTML path, and a sentinel row here would duplicate their urls across
    // the two branches. The cannot-vanish sentinel below covers payloads
    // that ARE PDFs but fail to parse — the loss that would otherwise be
    // silent within this branch.
    if (!PdfBranch.isPdf(payload)) return Nil
    val parsed = PdfBranch.parsePayload(payload, cfg)
    val truncated = byteTruncated || parsed.pagesTruncated
    if (parsed.pages.isEmpty)
      return Seq(PdfPage(rowUid, url, -1, 0, "", parsed.status, truncated))
    parsed.pages.zipWithIndex.map { case ((w, blocks), idx) =>
      val src = blocks.map(b => s"block ${b.x} ${b.y} ${b.w} ${b.h} ${b.text}")
        .mkString("\n")
      PdfPage(rowUid, url, idx, w, src, parsed.status, truncated)
    }
  }

  /** Lay out one page (the per-tile work — independent, parallelizable). */
  def layoutPage(p: PdfPage): PageText = {
    if (p.pageIdx < 0) // sentinel: no pages parsed, carry status only
      return PageText(p.rowUid, p.url, p.pageIdx, "", p.status, p.truncated)
    val blocks = p.blocksSrc.linesIterator.flatMap { line =>
      if (line.startsWith("block ")) {
        val parts = line.substring(6).split(" ", 5)
        if (parts.length == 5 && parts(4).nonEmpty)
          Some(PdfBranch.PBlock(
            parts(0).toIntOption.getOrElse(0), parts(1).toIntOption.getOrElse(0),
            parts(2).toIntOption.getOrElse(0), parts(3).toIntOption.getOrElse(0),
            parts(4), 0, 0))
        else None
      } else None
    }.toVector
    val ordered = PdfBranch.orderPage(p.pageW, blocks)
    PageText(p.rowUid, p.url, p.pageIdx, ordered.map(_.text).mkString("\n\n"),
      p.status, p.truncated)
  }

  /** Distributed path: explode pages → per-page layout → reassemble by row
    * uid. One shuffle (the groupBy); page order restored by pageIdx sort
    * inside each group so the result is partition-order independent. The
    * payload is clamped to cfg.maxHtmlBytes BEFORE splitting, matching the
    * single-pass `PdfBranch.extract` truncation exactly. */
  def run(pages: Dataset[PageRow],
          cfg: graft.extract.ExtractConfig = graft.extract.ExtractConfig()): DataFrame = {
    import pages.sparkSession.implicits._
    RowIds.keyed(pages)
      .flatMap { case (uid, p) =>
        val byteTrunc = p.html != null && p.html.length > cfg.maxHtmlBytes
        val payload =
          if (byteTrunc) java.util.Arrays.copyOf(p.html, cfg.maxHtmlBytes)
          else p.html
        splitPages(uid, p.url, payload, cfg, byteTruncated = byteTrunc)
      }
      .map(layoutPage)
      .groupByKey(_.rowUid)
      .mapGroups { (_, it) =>
        val ordered = it.toArray.sortBy(_.pageIdx)
        (ordered.head.url,
          ordered.map(_.text).filter(_.nonEmpty).mkString("\n\n"),
          ordered.head.status, ordered.exists(_.truncated))
      }
      .toDF("url", "text", "status", "truncated")
  }
}
