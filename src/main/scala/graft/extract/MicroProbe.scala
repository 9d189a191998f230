package graft.extract

import graft.corpus.Corpus
import graft.dom.{BlockSegmenter, SegKind}
import graft.htmltok.{Charsets, HtmlTokenizer}

/** Diagnostic decomposition of the kernel cost (not part of the contract). */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 7000
    val pages = (0 until n).map(i => Corpus.page(42L, i))
      .filter(g => !graft.pdf.PdfBranch.isPdf(g.row.html) && g.row.html.nonEmpty)
    val bytes = pages.map(_.row.html.length.toLong).sum
    val state = new ExtractorState()

    def time(label: String)(f: => Unit): Unit = {
      // warmup
      f
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s ${s}%.2fs  ${bytes / s / 1e6}%.1fMB/s")
    }

    time("tokenize") {
      pages.foreach(g => HtmlTokenizer.tokenize(g.row.html, state.toks))
    }
    time("tokenize+dom+segment") {
      pages.foreach { g =>
        HtmlTokenizer.tokenize(g.row.html, state.toks)
        state.dom.build(state.toks)
        BlockSegmenter.segment(state.dom, state.blocks)
      }
    }
    time("...+decode") {
      pages.foreach { g =>
        HtmlTokenizer.tokenize(g.row.html, state.toks)
        state.dom.build(state.toks)
        BlockSegmenter.segment(state.dom, state.blocks)
        val (cs, bom) = Charsets.sniff(g.row.html)
        val blocks = state.blocks
        var b = 0
        var acc = 0
        while (b < blocks.nBlocks) {
          val sb = new java.lang.StringBuilder(64)
          var s = blocks.segOff(b)
          val sEnd = blocks.segOff(b + 1)
          while (s < sEnd) {
            if (blocks.segKind(s) == SegKind.Text) {
              val from = math.max(blocks.segStart(s), bom)
              val len = blocks.segEnd(s) - from
              if (len > 0) sb.append(Entities.decode(new String(g.row.html, from, len, cs)))
            } else sb.append(' ')
            s += 1
          }
          acc += sb.length
          b += 1
        }
      }
    }
    time("...+normalize") {
      pages.foreach { g =>
        HtmlTokenizer.tokenize(g.row.html, state.toks)
        state.dom.build(state.toks)
        BlockSegmenter.segment(state.dom, state.blocks)
        val (cs, bom) = Charsets.sniff(g.row.html)
        val blocks = state.blocks
        var b = 0
        while (b < blocks.nBlocks) {
          val sb = new java.lang.StringBuilder(64)
          var s = blocks.segOff(b)
          val sEnd = blocks.segOff(b + 1)
          while (s < sEnd) {
            if (blocks.segKind(s) == SegKind.Text) {
              val from = math.max(blocks.segStart(s), bom)
              val len = blocks.segEnd(s) - from
              if (len > 0) {
                val dec = Entities.decode(new String(g.row.html, from, len, cs))
                sb.append(dec)
                if (blocks.segInLink(s)) TextNormalizer.countNonWs(dec)
              }
            } else sb.append(' ')
            s += 1
          }
          TextNormalizer.normalize(sb.toString)
          TextNormalizer.countNonWs(sb.toString)
          b += 1
        }
      }
    }
    time("full extract") {
      pages.foreach(g => Extractor.extract(g.row.url, g.row.html, ExtractConfig(), state))
    }
    time("tagPath per block") {
      pages.foreach { g =>
        HtmlTokenizer.tokenize(g.row.html, state.toks)
        state.dom.build(state.toks)
        BlockSegmenter.segment(state.dom, state.blocks)
        var b = 0
        while (b < state.blocks.nBlocks) {
          state.dom.tagPath(state.blocks.anchor(b))
          b += 1
        }
      }
    }
  }
}
