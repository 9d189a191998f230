package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{ExtractConfig, Extractor}

/** Parameter-forwarding tests (≡ the reference's
  * check_wrapper_simple_inference_param_forwarding, tests/testing_utils.py:
  * 6-37): every ExtractConfig knob must observably change behavior.
  */
class ConfigSurfaceSpec extends AnyFunSuite {

  private def page(body: String): Array[Byte] =
    s"<html><body>$body</body></html>".getBytes(StandardCharsets.UTF_8)

  test("maxHtmlBytes truncates and flags") {
    val html = page("<p>" + ("word " * 500) + "</p>")
    assert(Extractor.extract("u", html, ExtractConfig(maxHtmlBytes = 64)).truncated)
    assert(!Extractor.extract("u", html, ExtractConfig()).truncated)
  }

  test("maxBlocksPerDoc caps emitted spans") {
    val html = page((1 to 50).map(i => s"<p>paragraph number $i with enough words</p>").mkString)
    val capped = Extractor.extract("u", html, ExtractConfig(maxBlocksPerDoc = 5))
    assert(capped.nSpans == 5)
    val full = Extractor.extract("u", html, ExtractConfig())
    assert(full.nSpans == 50)
  }

  test("minContentChars drops short free-standing blocks") {
    val html = page("<div>tiny</div><p>a sufficiently long paragraph of words</p>")
    val strict = Extractor.extract("u", html, ExtractConfig(minContentChars = 10))
    assert(strict.text == "a sufficiently long paragraph of words")
    val lax = Extractor.extract("u", html,
      ExtractConfig(minContentChars = 2, shortChars = 0, dropScore = 0.0))
    assert(lax.text.startsWith("tiny"))
  }

  test("link-density gate ratio is honored") {
    // half the chars are link text → dropped at 1/3 threshold, kept at 2/3
    val html = page("""<div>plain words here and <a href="/x">linked words here and</a></div>""")
    val strict = Extractor.extract("u", html, ExtractConfig(linkDenN = 1, linkDenR = 3))
    assert(strict.text.isEmpty)
    val lax = Extractor.extract("u", html, ExtractConfig(linkDenN = 2, linkDenR = 3))
    assert(lax.text.nonEmpty)
  }

  test("dropScore gates low-scoring content blocks") {
    val html = page("<p>twentyfivecharsofcontentx</p>") // score = 25/200 = 0.125
    assert(Extractor.extract("u", html, ExtractConfig(dropScore = 0.5)).nSpans == 0)
    assert(Extractor.extract("u", html, ExtractConfig(dropScore = 0.05)).nSpans == 1)
  }
}
