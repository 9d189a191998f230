package graft

import graft.corpus.Corpus
import graft.extract.{ExtractConfig, Extractor, ExtractorState}

/** Single-threaded microbench: corpus-gen cost vs extraction kernel cost,
  * per fixture category. Diagnostic only (not part of the driver contract).
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 7000
    // warmup
    val st0 = new ExtractorState()
    (0 until 1400).foreach { i =>
      val g = Corpus.page(42L, i); Extractor.extract(g.row.url, g.row.html, ExtractConfig(), st0)
    }
    // corpus gen
    var t0 = System.nanoTime()
    val pages = (0 until n).map(i => Corpus.page(42L, i))
    val genSec = (System.nanoTime() - t0) / 1e9
    val bytes = pages.map(_.row.html.length.toLong).sum
    // extraction, with per-category attribution
    val state = new ExtractorState()
    val catNanos = new java.util.TreeMap[String, Long]()
    val catBytes = new java.util.TreeMap[String, Long]()
    t0 = System.nanoTime()
    pages.foreach { g =>
      val s = System.nanoTime()
      Extractor.extract(g.row.url, g.row.html, ExtractConfig(), state)
      val d = System.nanoTime() - s
      catNanos.merge(g.category, d, (a: Long, b: Long) => a + b)
      catBytes.merge(g.category, g.row.html.length.toLong, (a: Long, b: Long) => a + b)
    }
    val exSec = (System.nanoTime() - t0) / 1e9
    println(f"docs=$n bytes=${bytes / 1e6}%.1fMB gen=${genSec}%.2fs extract=${exSec}%.2fs " +
      f"gen=${bytes / genSec / 1e6}%.1fMB/s extract=${bytes / exSec / 1e6}%.1fMB/s " +
      f"perDoc=${exSec * 1e6 / n}%.0fus")
    println(f"stages: tok=${state.tokenizeNanos / 1e9}%.2f dom=${state.domNanos / 1e9}%.2f " +
      f"cls=${state.classifyNanos / 1e9}%.2f asm=${state.assembleNanos / 1e9}%.2f")
    catNanos.forEach { (k, v) =>
      println(f"  $k: ${v / 1e9}%.2fs  ${catBytes.get(k) / (v / 1e9) / 1e6}%.1fMB/s")
    }
  }
}
