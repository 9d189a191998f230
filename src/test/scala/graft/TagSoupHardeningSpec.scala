package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Extractor
import graft.htmltok.Charsets

/** Regressions for real-world tag-soup/charset behaviors found by review:
  * each of these silently emptied or corrupted extraction before the fix. */
class TagSoupHardeningSpec extends AnyFunSuite {

  private def extract(html: String): String =
    Extractor.extract("u", html.getBytes("UTF-8")).text

  test("omitted </head> (legal HTML5) must not swallow the body") {
    val got = extract(
      "<html><head><title>t</title><body><p>hello world this is enough content chars</p></body></html>")
    assert(got == "hello world this is enough content chars")
    // and without <body> either — a block tag alone closes head
    val got2 = extract(
      "<html><head><meta charset=\"utf-8\"><p>paragraph content with enough characters</p>")
    assert(got2 == "paragraph content with enough characters")
  }

  test("abruptly-closed comments <!--> and <!---> are complete comments") {
    assert(extract("<body><!--><p>hello world this is enough content chars</p></body>")
      == "hello world this is enough content chars")
    assert(extract("<body><!---><p>hello world this is enough content chars</p></body>")
      == "hello world this is enough content chars")
    // normal comments still swallow to their real close
    assert(extract("<body><!-- <p>not this</p> --><p>hello world this is enough content chars</p></body>")
      == "hello world this is enough content chars")
  }

  test("60k-deep nesting extracts without StackOverflowError") {
    val depth = 60000
    val sb = new StringBuilder("<html><body>")
    (0 until depth).foreach(_ => sb.append("<span>"))
    sb.append("deeply nested but perfectly extractable paragraph content")
    (0 until depth).foreach(_ => sb.append("</span>"))
    sb.append("</body></html>")
    val doc = Extractor.extract("u", sb.toString.getBytes("UTF-8"))
    assert(doc.text == "deeply nested but perfectly extractable paragraph content")
  }

  test("charset= inside an unrelated attribute value must not hijack the charset") {
    val html = "<html><head>" +
      "<meta name=\"description\" content=\"how to use charset=shift_jis in html\">" +
      "<meta charset=\"utf-8\"></head><body><p>café résumé with enough characters</p></body></html>"
    assert(Charsets.sniff(html.getBytes("UTF-8"))._1 == Charsets.Utf8)
    assert(extract(html) == "café résumé with enough characters")
  }

  test("XHTML-style <script/> opens a script: its body never leaks into text") {
    val got = extract("<body><script src=\"x\"/>if(a&&b){do_stuff();}</script>" +
      "<p>real paragraph with enough words here</p></body>")
    assert(got == "real paragraph with enough words here")
  }

  test("CDATA wrapper markup is stripped, inner text kept") {
    assert(extract("<body><p>before <![CDATA[inside cdata text]]> after enough words here</p></body>")
      == "before inside cdata text after enough words here")
  }

  test("iso-8859-1-labeled pages decode 0x80-0x9F as cp1252 punctuation") {
    val text = "it’s a test with enough characters here"
    val bytes = ("<html><head><meta charset=\"iso-8859-1\"></head><body><p>" +
      "its a test with enough characters here</p></body></html>")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) // 0x92 byte
    assert(Extractor.extract("u", bytes).text == text) // ’ not C1 control
  }

  test("unclosed CDATA at EOF keeps its last bytes") {
    // no "]]>" closer: the opener is stripped, ALL remaining bytes are content
    val got = Extractor.extract("u",
      "<body><p>start words enough here <![CDATA[tail kept".getBytes("UTF-8")).text
    assert(got == "start words enough here tail kept", got)
    // and "]]" without ">" is real content too
    val got2 = Extractor.extract("u",
      "<body><p>start words enough here <![CDATA[tail kept]]".getBytes("UTF-8")).text
    assert(got2 == "start words enough here tail kept]]", got2)
  }

  test("fuzz: random byte soup never throws and extracts deterministically") {
    val rng = new java.util.Random(1234)
    val fragments = Array("<div>", "</div>", "<p ", "class=\"x", "<!--", "-->",
      "<![CDATA[", "]]>", "<script>", "</script>", "<table><tr><td", "colspan=\"",
      "&amp;", "&#x", "<meta charset=\"", "text words here ", "\u00ff\u0080",
      "<", ">", "\"", "=", "<textarea>", "</head>", "<body", "%PDF-")
    for (trial <- 0 until 300) {
      val sb = new StringBuilder
      val parts = 3 + rng.nextInt(40)
      (0 until parts).foreach { _ =>
        if (rng.nextInt(4) == 0) {
          val junk = new Array[Byte](rng.nextInt(24))
          rng.nextBytes(junk)
          sb.append(new String(junk, java.nio.charset.StandardCharsets.ISO_8859_1))
        } else sb.append(fragments(rng.nextInt(fragments.length)))
      }
      val payload = sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val a = Extractor.extract(s"u$trial", payload)
      val b = Extractor.extract(s"u$trial", payload)
      assert(a.text == b.text && a.spans == b.spans, s"nondeterministic at trial $trial")
    }
  }
}
