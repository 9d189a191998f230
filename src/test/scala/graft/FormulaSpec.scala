package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{ExtractConfig, Extractor, ExtractorState, Labels}

/** Formula branch (MathML → TeX-source regions): the graft of the
  * reference's `equation` layout label + LaTeX recognizer + markdown render
  * (ppstructure/predict_system.py:171-174, recovery_to_markdown.py:170-171).
  *
  * Contract under test:
  *  - `<annotation encoding=*tex*>` is the preferred source; when present the
  *    MathML presentation linearization is suppressed (no double emit);
  *  - non-TeX `<annotation>` / `<annotation-xml>` bodies never surface;
  *  - a block that is exactly one formula → span label `formula`, span text =
  *    the RAW source, assembled as `$$source$$`; inside a table cell or list
  *    item the render is inline `$source$`;
  *  - mixed text + math keeps inline `$…$` delimiters inside ordinary text.
  */
class FormulaSpec extends AnyFunSuite {

  private def extract(html: String) =
    Extractor.extract("http://t/x", html.getBytes(StandardCharsets.UTF_8))

  private val page = "<html><body>%s</body></html>"

  test("display math with TeX annotation: formula span, raw source, $$ render") {
    val html = page.format(
      """<p>The quadratic formula is well known.</p>
        |<p><math display="block"><semantics><mrow><mi>x</mi><mo>=</mo><mfrac><mrow><mo>-</mo><mi>b</mi></mrow><mrow><mn>2</mn><mi>a</mi></mrow></mfrac></mrow>
        |<annotation encoding="application/x-tex">x = \frac{-b}{2a}</annotation></semantics></math></p>""".stripMargin)
    val doc = extract(html)
    assert(doc.spans.map(_.label) == List(Labels.Content, Labels.Formula))
    assert(doc.spans(1).text == "x = \\frac{-b}{2a}") // raw source, no delimiters
    assert(doc.text ==
      "The quadratic formula is well known.\n\n$$x = \\frac{-b}{2a}$$")
  }

  test("TeX annotation suppresses the presentation linearization (no double emit)") {
    val html = page.format(
      """<p>Euler: <math><semantics><mrow><mi>e</mi><mo>=</mo><mn>2.718</mn></mrow><annotation encoding="application/x-tex">e \approx 2.718</annotation></semantics></math> indeed.</p>""")
    val doc = extract(html)
    assert(doc.text == "Euler: $e \\approx 2.718$ indeed.")
    assert(!doc.text.contains("e=2.718")) // presentation must not leak
  }

  test("MathML without annotation: linearized presentation as the source") {
    val html = page.format(
      """<p>Solve <math><mi>x</mi><mo>=</mo><mn>2</mn></math> for x in this sentence.</p>""")
    val doc = extract(html)
    assert(doc.text == "Solve $x=2$ for x in this sentence.")
  }

  test("pretty-printed MathML linearizes with single spaces") {
    val html = page.format(
      """<p><math>
        |  <mi>a</mi>
        |  <mo>+</mo>
        |  <mi>b</mi>
        |</math></p>""".stripMargin)
    val doc = extract(html)
    assert(doc.spans.map(_.label) == List(Labels.Formula))
    assert(doc.spans.head.text == "a + b")
    assert(doc.text == "$$a + b$$")
  }

  test("annotation-xml and non-TeX annotations never surface") {
    val html = page.format(
      """<p>Sum: <math><mrow><mi>s</mi><mo>=</mo><mn>9</mn></mrow><annotation-xml encoding="MathML-Content"><apply><eq/><ci>s</ci><cn>9</cn></apply></annotation-xml><annotation encoding="image/png">iVBORw0</annotation></math> done, with enough text around.</p>""")
    val doc = extract(html)
    assert(doc.text == "Sum: $s=9$ done, with enough text around.")
    assert(!doc.text.contains("apply") && !doc.text.contains("iVBORw0"))
  }

  test("text/* MIME annotations are NOT TeX sources (\"text\" contains \"tex\")") {
    // the W3C-documented plain-text alternate form: the prose body must not
    // pose as TeX, and the presentation linearization must still surface
    val html = page.format(
      """<p>Plain: <math><mrow><mi>x</mi><mo>=</mo><mn>2</mn></mrow><annotation encoding="text/plain">x equals 2</annotation></math> here in a sentence.</p>""")
    val doc = extract(html)
    assert(doc.text == "Plain: $x=2$ here in a sentence.")
    assert(!doc.text.contains("x equals 2"))
  }

  test("text/x-tex IS a TeX source (the x-tex occurrence, not the text/ prefix)") {
    val html = page.format(
      """<p><math><mrow><mi>z</mi></mrow><annotation encoding="text/x-tex">z_0</annotation></math></p>""")
    val doc = extract(html)
    assert(doc.spans.map(_.label) == List(Labels.Formula))
    assert(doc.text == "$$z_0$$")
  }

  test("encoding match is case-insensitive and substring (application/X-TeX)") {
    val html = page.format(
      """<p><math><mrow><mi>y</mi></mrow><annotation ENCODING="application/X-TeX">y^2</annotation></math></p>""")
    val doc = extract(html)
    assert(doc.spans.map(_.label) == List(Labels.Formula))
    assert(doc.spans.head.text == "y^2")
    assert(doc.text == "$$y^2$$")
  }

  test("two formulas in one paragraph: inline delimiters, ordinary content label") {
    val html = page.format(
      """<p>Given <math><mi>a</mi><mo>=</mo><mn>1</mn></math> and <math><mi>b</mi><mo>=</mo><mn>2</mn></math> we continue the text.</p>""")
    val doc = extract(html)
    assert(doc.spans.map(_.label) == List(Labels.Content))
    assert(doc.text == "Given $a=1$ and $b=2$ we continue the text.")
  }

  test("short standalone formula survives the length gates") {
    // "E=mc^2" is 6 nonWs chars + 2 delimiters — below minContentChars=10;
    // the formula rule fires before the length gates
    val html = page.format(
      """<p><math><semantics><mrow><mi>E</mi></mrow><annotation encoding="application/x-tex">E=mc^2</annotation></semantics></math></p>""")
    val doc = extract(html)
    assert(doc.spans.map(_.label) == List(Labels.Formula))
    assert(doc.text == "$$E=mc^2$$")
  }

  test("formula in a table cell renders inline within the grid") {
    val html = page.format(
      """<table><tr><td>energy</td><td><math><semantics><mrow><mi>E</mi></mrow><annotation encoding="application/x-tex">E=mc^2</annotation></semantics></math></td></tr>
        |<tr><td>force</td><td>F=ma plain text</td></tr></table>""".stripMargin)
    val doc = extract(html)
    assert(doc.spans.map(_.label) ==
      List(Labels.Cell, Labels.Formula, Labels.Cell, Labels.Cell))
    assert(doc.text == "energy | $E=mc^2$\nforce | F=ma plain text")
  }

  test("formula in a list item renders inline on its line") {
    val html = page.format(
      """<ul><li>first law text here</li><li><math><mi>F</mi><mo>=</mo><mi>m</mi><mi>a</mi></math></li></ul>""")
    val doc = extract(html)
    assert(doc.spans.map(_.label) == List(Labels.Item, Labels.Formula))
    assert(doc.text == "first law text here\n$F=ma$")
  }

  test("empty math contributes nothing (no bare $$)") {
    val html = page.format(
      """<p>Before <math><semantics><annotation encoding="application/x-tex">  </annotation></semantics></math> after, with padding text.</p>""")
    val doc = extract(html)
    assert(doc.text == "Before after, with padding text.")
  }

  test("entities inside math decode before the source is captured") {
    val html = page.format(
      """<p><math><mi>x</mi><mo>&minus;</mo><mn>1</mn><mo>&lt;</mo><mn>0</mn></math></p>""")
    val doc = extract(html)
    assert(doc.spans.head.text == "x−1<0")
    assert(doc.text == "$$x−1<0$$")
  }

  test("math inside boilerplate is dropped with its subtree") {
    val html = page.format(
      """<nav><math><mi>x</mi></math></nav><p>Real content paragraph that stays.</p>""")
    val doc = extract(html)
    assert(doc.text == "Real content paragraph that stays.")
  }

  test("math inside a link does not count as link chars (density gate)") {
    // a short block: link-wrapped formula + few plain chars — if formula chars
    // counted as link chars the short-link gate would drop it
    val html = page.format(
      """<p>see <a href="/eq"><math><mi>z</mi><mo>=</mo><mn>3</mn></math></a> eq</p>""")
    val doc = extract(html)
    assert(doc.text == "see $z=3$ eq")
  }

  test("pure function: reused state equals fresh state on math documents") {
    val htmls = Seq(
      page.format("""<p><math><mi>a</mi><mo>=</mo><mn>1</mn></math></p>"""),
      page.format("""<p>t <math><semantics><mrow><mi>b</mi></mrow><annotation encoding="application/x-tex">b_2</annotation></semantics></math> u with more text</p>"""),
      page.format("""<p>plain paragraph with no math at all, long enough to keep</p>"""))
    val shared = new ExtractorState()
    for (h <- htmls; _ <- 1 to 2) {
      val a = Extractor.extract("u", h.getBytes(StandardCharsets.UTF_8), ExtractConfig(), shared)
      val b = Extractor.extract("u", h.getBytes(StandardCharsets.UTF_8))
      assert(a.text == b.text && a.spans == b.spans)
    }
  }

  test("x33 surface: mathPages yields one formula row per display/table shape") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val df = SparkEntry.queries("x33_formula_regions")(spark, "")
    val rows = df.collect()
    // 96 docs cycle 8 shapes; shapes 0 (display math), 2 (table cell),
    // 6 ($$..$$ webtext) and 7 (\[..\] webtext) emit one formula span each
    // -> 4 * 96/8 = 48 rows
    assert(rows.length == 48)
    val byUrl = rows.map(r => r.getAs[String]("url") -> r.getAs[String]("latex")).toMap
    assert(byUrl("https://math.example.org/m0000") == "x_{0} = \\frac{1}{2}")
    assert(byUrl("https://math.example.org/m0002") == "E_{2}=m c^{4}")
    assert(byUrl("https://math.example.org/m0006") == "\\int_0^7 x^3\\,dx")
    assert(byUrl("https://math.example.org/m0007") == "e^{i\\pi} + 1 = 2")
    // the document text renders the display formula as $$...$$
    val doc0 = rows.find(_.getAs[String]("url").endsWith("m0000")).get
    assert(doc0.getAs[String]("doc_text").contains("$$x_{0} = \\frac{1}{2}$$"))
    // inline shapes (1,3,4) carry $...$ inside content, never a formula row
    assert(!byUrl.contains("https://math.example.org/m0001"))
    val probe = graft.pipeline.CorpusSource.mathPages(spark, 8)
    val texts = graft.pipeline.Extract.run(probe).toDF()
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(texts("https://math.example.org/m0001").contains("$k=2$"))
    assert(texts("https://math.example.org/m0003").contains("$a=4$") &&
      texts("https://math.example.org/m0003").contains("$b=5$"))
    assert(texts("https://math.example.org/m0004").contains("$s=5$") &&
      !texts("https://math.example.org/m0004").contains("apply"))
    assert(!texts("https://math.example.org/m0005").contains("$"))
  }

  test("plain-webtext $$...$$ block is a formula (MathJax source convention)") {
    val html = page.format(
      """<p>Consider the following display equation for context.</p>
        |<p>$$\int_0^1 x^2\,dx = \tfrac13$$</p>""".stripMargin)
    val doc = extract(html)
    assert(doc.spans.map(_.label) == List(Labels.Content, Labels.Formula))
    assert(doc.spans(1).text == "\\int_0^1 x^2\\,dx = \\tfrac13")
    assert(doc.text.endsWith("$$\\int_0^1 x^2\\,dx = \\tfrac13$$"))
  }

  test("plain-webtext \\[...\\] block is a formula with normalized delimiters") {
    val html = page.format("""<p>\[ e^{i\pi} + 1 = 0 \]</p>""")
    val doc = extract(html)
    assert(doc.spans.map(_.label) == List(Labels.Formula))
    assert(doc.spans.head.text == "e^{i\\pi} + 1 = 0")
    assert(doc.text == "$$e^{i\\pi} + 1 = 0$$")
  }

  test("link-wrapped $$...$$ block faces the link-density gate (nav/spam)") {
    // a link-dominated block whose anchor text happens to be $$-wrapped is
    // nav/spam, not math source: the formula label must not pre-empt the
    // link-density drop ($$WIN BIG$$ rendered as a formula would be spam
    // laundering). Genuine TeX sources are never hyperlinked (linkChars==0).
    val html = page.format(
      """<p>Consider the following display equation for context.</p>
        |<p><a href="/buy">$$WIN BIG MONEY$$</a></p>""".stripMargin)
    val doc = extract(html)
    assert(doc.spans.map(_.label) == List(Labels.Content),
      "link-only $$-wrapped block must be dropped, not labeled formula")
    assert(!doc.text.contains("WIN BIG"))
  }

  test("$$...$$ block with a MINORITY embedded link keeps the formula label") {
    // the gate is link DOMINANCE, not any-link: a genuine display equation
    // carrying a small anchor (an equation-number reference — common on
    // wiki/math sites) is math source, not nav. Only the link fraction
    // >= the density ratio (2/3) forfeits the label.
    val html = page.format(
      """<p>$$\int_0^1 x^2\,dx = \tfrac{1}{3} \quad <a href="#eq3">(3)</a>$$</p>""")
    val doc = extract(html)
    assert(doc.spans.map(_.label) == List(Labels.Formula),
      s"minority-linked display math keeps its label: ${doc.spans.map(_.label)}")
    assert(doc.text.startsWith("$$") && doc.text.contains("\\int_0^1"))
  }

  test("$$-wrapped spam in the 1/2-2/3 link band is dropped, not a formula") {
    // '$$home about$$' is 64% link chars: under the 2/3 nav gate but link-
    // MAJORITY — if the formula branch used the 2/3 ratio it would claim
    // this block (score 0.9!) before the short-link gate could drop it.
    // The formula branch requires a strict link minority (< 1/2) instead.
    val html = page.format(
      """<p>$$<a href="/">home</a> <a href="/a">about</a>$$</p>""")
    val doc = extract(html)
    assert(!doc.spans.exists(_.label == Labels.Formula),
      s"link-majority $$-spam must not be a formula: ${doc.spans.map(_.label)}")
    assert(!doc.text.contains("home about"), "short link-majority block drops")
  }

  test("TeX-delimiter detection is conservative: prices and partial wraps stay content") {
    val cases = Seq(
      // interior closer: two display formulas in one block — stays content
      """<p>$$a+b$$ and also $$c+d$$ in one paragraph block here</p>""",
      // dollar prose: starts/ends with $$ but a stray $ inside the source
      """<p>$$ deal: five $ off everything this week, was priced at $$</p>""",
      // inline \( .. \) is never a whole-block formula
      """<p>The identity \(a^2+b^2=c^2\) holds for right triangles only.</p>""")
    for (c <- cases) {
      val doc = extract(page.format(c))
      assert(doc.spans.map(_.label) == List(Labels.Content), c)
    }
    // bare "$$$$" (empty source) is not a formula; short block drops entirely
    val empty = extract(page.format("""<p>$$$$</p>"""))
    assert(empty.spans.isEmpty)
  }

  test("tag soup: unclosed math swallows to container end deterministically") {
    // missing </math>: the math subtree extends to the end of the paragraph
    // (tag-soup recovery pops at </p>), so the trailing text joins the formula
    val html = page.format("""<p><math><mi>q</mi><mo>=</mo><mn>7</mn> trailing</p><p>Next paragraph keeps working fine.</p>""")
    val doc = extract(html)
    assert(doc.text == "$$q=7 trailing$$\n\nNext paragraph keeps working fine.")
  }
}
