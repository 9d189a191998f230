package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Corpus
import graft.extract.{ExtractConfig, Extractor, ExtractorState}

/** The golden contract (BASELINE.json north rule): byte-identical extracted text
  * per url, for every fixture category, with arena state reused across documents
  * (as the pipeline does per partition). Reference analog: TIPC golden compare
  * (test_tipc/compare_results.py:11-60) made exact.
  */
class ExtractorGoldenSpec extends AnyFunSuite {

  private val N = 160 // 10 full cycles over the 16 fixture categories

  test("golden corpus: byte-identical extracted text per url (seed=42)") {
    val state = new ExtractorState() // shared across docs like a partition
    val failures = Corpus.pages(42L, N).flatMap { g =>
      val got = Extractor.extract(g.row.url, g.row.html, ExtractConfig(), state)
      val gotBytes = got.text.getBytes(StandardCharsets.UTF_8)
      val expBytes = g.expectedText.getBytes(StandardCharsets.UTF_8)
      if (!java.util.Arrays.equals(gotBytes, expBytes))
        Some(s"[${g.category}] ${g.row.url}\n--- expected:\n${g.expectedText}\n--- got:\n${got.text}\n")
      else None
    }
    assert(failures.isEmpty, s"\n${failures.size} mismatches; first 3:\n${failures.take(3).mkString("\n")}")
  }

  test("golden corpus: span labels match expected block labels") {
    val state = new ExtractorState()
    val failures = Corpus.pages(42L, N).flatMap { g =>
      val got = Extractor.extract(g.row.url, g.row.html, ExtractConfig(), state)
      val gotLabels = got.spans.map(_.label).toVector
      if (gotLabels != g.expectedLabels)
        Some(s"[${g.category}] ${g.row.url}: expected ${g.expectedLabels} got $gotLabels")
      else None
    }
    assert(failures.isEmpty, s"\n${failures.size} label mismatches; first 3:\n${failures.take(3).mkString("\n")}")
  }

  test("extraction is a pure function: fresh state == reused state") {
    val shared = new ExtractorState()
    Corpus.pages(7L, 28).foreach { g =>
      val a = Extractor.extract(g.row.url, g.row.html, ExtractConfig(), shared)
      val b = Extractor.extract(g.row.url, g.row.html, ExtractConfig(), new ExtractorState())
      assert(a.text == b.text, s"state-dependent extraction for ${g.row.url}")
      assert(a.spans == b.spans)
    }
  }

  test("truncation: payload above maxHtmlBytes is clamped and flagged") {
    val body = "<p>" + ("word " * 1000) + "</p>"
    val html = s"<html><body>$body</body></html>".getBytes(StandardCharsets.UTF_8)
    val cfg = ExtractConfig(maxHtmlBytes = 100)
    val doc = Extractor.extract("u", html, cfg)
    assert(doc.truncated)
    val full = Extractor.extract("u", html, ExtractConfig())
    assert(!full.truncated)
    assert(full.text.startsWith("word word"))
  }
}
