package graft

import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{ExtractConfig, Extractor, ExtractorState}
import graft.htmltok.{HtmlTokenizer, TokenArena}

/** Property tests (SURVEY.md §5): the tokenizer never loses bytes — emitted
  * token ranges partition the input — and extraction is total + idempotent on
  * arbitrary byte soup (tag-soup contract, FIXTURES.md F09).
  */
class TokenizerPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val htmlish: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.const("<p>"), Gen.const("</p>"), Gen.const("<div class=\"x\">"),
      Gen.const("</div>"), Gen.const("<br>"), Gen.const("<"), Gen.const(">"),
      Gen.const("<!-- c -->"), Gen.const("<!--"), Gen.const("<script>a<b</script>"),
      Gen.const("<script>x"), Gen.const("&amp;"), Gen.const("&#65;"), Gen.const("&bogus;"),
      Gen.const("<a href=x>"), Gen.const("<![CDATA[z]]>"), Gen.const("<table><tr><td>"),
      Gen.const("</p "), Gen.const("<p attr='v\""), Gen.const(" "), Gen.const("\n"))
    Gen.listOf(frag).map(_.mkString)
  }

  test("token ranges partition the input byte-for-byte") {
    check(Prop.forAll(htmlish) { s =>
      val bytes = s.getBytes(StandardCharsets.UTF_8)
      val arena = new TokenArena()
      HtmlTokenizer.tokenize(bytes, arena)
      var pos = 0
      var ok = true
      var i = 0
      while (i < arena.size && ok) {
        ok = arena.starts(i) == pos && arena.ends(i) >= arena.starts(i)
        pos = arena.ends(i)
        i += 1
      }
      ok && pos == bytes.length
    })
  }

  test("extraction is total and idempotent on arbitrary byte soup") {
    val anyBytes: Gen[Array[Byte]] =
      Gen.oneOf(
        htmlish.map(_.getBytes(StandardCharsets.UTF_8)),
        Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    val state = new ExtractorState()
    check(Prop.forAll(anyBytes) { bytes =>
      val a = Extractor.extract("u", bytes, ExtractConfig(), state)
      val b = Extractor.extract("u", bytes, ExtractConfig(), state)
      a.text == b.text && a.spans == b.spans
    })
  }

  test("pdf XY-cut ordering is a permutation and deterministic") {
    import graft.pdf.PdfBranch
    val blockGen = for {
      x <- Gen.chooseNum(0, 700); y <- Gen.chooseNum(0, 1100)
      w <- Gen.chooseNum(10, 760); h <- Gen.chooseNum(10, 200)
    } yield PdfBranch.PBlock(x, y, w, h, s"t$x$y", 0, 0)
    check(Prop.forAll(Gen.listOf(blockGen).map(_.toVector)) { blocks =>
      val a = PdfBranch.orderPage(800, blocks)
      val b = PdfBranch.orderPage(800, blocks)
      a == b && a.groupBy(identity).map { case (k, v) => (k, v.size) } == blocks.groupBy(identity).map { case (k, v) => (k, v.size) }
    })
  }

  test("implied end tags: a new tr/td/dt closes open cells/rows/items") {
    import graft.dom.DomArena
    def paths(html: String): Vector[String] = {
      val toks = new TokenArena()
      HtmlTokenizer.tokenize(html.getBytes(StandardCharsets.UTF_8), toks)
      val dom = new DomArena().build(toks)
      (0 until dom.nNodes).map(dom.tagPath).toVector
    }
    // omitted </td></tr>: the second row must be a SIBLING of the first,
    // never nested inside the first cell
    val p1 = paths("<table><tr><td>A<tr><td>B</table>")
    assert(p1.exists(_.endsWith("table/tr/td")), p1)
    assert(!p1.exists(_.contains("td/tr")), s"row nested in cell: $p1")
    // omitted </dt>: dd is a sibling item under dl, not a child of dt
    val p2 = paths("<dl><dt>Term<dd>Def</dl>")
    assert(p2.exists(_.endsWith("dl/dd")), p2)
    assert(!p2.exists(_.contains("dt/dd")), s"dd nested in dt: $p2")
    // a new cell closes the open cell even across a div wrapper
    val p3 = paths("<table><tr><td><div>x<td>y</table>")
    assert(!p3.exists(_.contains("td/div/td")), s"cell nested in cell: $p3")
  }
}
