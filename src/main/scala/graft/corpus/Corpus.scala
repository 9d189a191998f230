package graft.corpus

import java.nio.charset.{Charset, StandardCharsets}
import java.sql.Timestamp

import graft.model.PageRow

/** Deterministic golden-corpus generator (FIXTURES.md §2-§3).
  *
  * Pure function of (seed, index): emits both the input PageRow and the expected
  * extraction, derived from the page's construction — NOT by running the extractor
  * (that would be circular). The reference analog is the TIPC golden compare
  * (test_tipc/compare_results.py:11-60): same input ⇒ identical output, except our
  * compare is exact bytes (text is discrete).
  *
  * Category taxonomy per FIXTURES.md §3 (index % 16 → F01..F16).
  */
object Corpus {

  final case class Golden(
      row: PageRow,
      expectedText: String,
      expectedLabels: Vector[String],
      category: String
  )

  /** splitmix64 — tiny, deterministic, platform-independent PRNG. */
  final class Rng(seed0: Long) {
    private var state = seed0
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(n: Int): Int = {
      val r = nextLong() % n
      (if (r < 0) r + n else r).toInt
    }
    def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))
  }

  private[corpus] val WORDS: IndexedSeq[String] = Vector(
    "data", "engine", "spark", "query", "table", "batch", "stream", "merge",
    "filter", "window", "partition", "shuffle", "column", "record", "schema",
    "vector", "tokens", "corpus", "crawler", "page", "document", "content",
    "extract", "block", "layout", "region", "order", "system", "process",
    "measure", "signal", "value", "index", "range", "bound", "model", "result",
    "output", "input", "state", "metric", "sample", "source", "target", "buffer")

  private val BOILER_LINKS = Vector("Home", "About", "Contact", "Login", "Register",
    "Privacy", "Terms", "Sitemap", "Archive", "Subscribe")

  def sentence(r: Rng): String = {
    val k = 6 + r.nextInt(9)
    val ws = (0 until k).map(_ => r.pick(WORDS))
    ws.head.capitalize + " " + ws.tail.mkString(" ") + "."
  }

  def paragraph(r: Rng): String =
    (0 until (2 + r.nextInt(4))).map(_ => sentence(r)).mkString(" ")

  private def mix(seed: Long, index: Long): Long = {
    var z = seed ^ (index * 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z ^ (z >>> 33)
  }

  private val t0 = 1577836800000L // 2020-01-01T00:00:00Z

  def page(seed: Long, index: Int): Golden = {
    val cat = index % 16
    val r = new Rng(mix(seed, if (cat == 13) 1414L else index.toLong))
    // Locale.ROOT: the f-interpolator localizes %d digits (determinism across JVMs)
    val url = String.format(java.util.Locale.ROOT,
      "https://example.org/f%02d/doc%d", Integer.valueOf(cat + 1), Integer.valueOf(index))
    val ts = new Timestamp(t0 + index.toLong * 3600000L)

    val g: Golden = cat match {
      case 0  => f01Article(r, url, ts)
      case 1  => f02Boiler(r, url, ts)
      case 2  => f03TwoColHtml(r, url, ts)
      case 3  => if ((index / 16) % 2 == 0) f04Table(r, url, ts)
                 else f04TableSpans(r, url, ts)
      case 4  => f05Fragmented(r, url, ts)
      case 5  => (index / 16) % 7 match {
        case 0 => f06PdfShuffled(r, url, ts)
        case 1 => f06PdfReal(r, url, ts, RealPdfGen.build)
        // modern writer shapes, same golden text: PDF 1.5 /ObjStm layout,
        // /ToUnicode custom-encoding font, LZW filter, PNG-predicted ObjStm,
        // simple font with /Encoding /Differences (no ToUnicode)
        case 2 => f06PdfReal(r, url, ts, RealPdfGen.buildObjStm)
        case 3 => f06PdfReal(r, url, ts, RealPdfGen.buildToUnicode)
        case 4 => f06PdfReal(r, url, ts, RealPdfGen.buildLzw)
        case 5 => f06PdfReal(r, url, ts, RealPdfGen.buildObjStmPredicted)
        case _ => f06PdfReal(r, url, ts, RealPdfGen.buildEncodedDiff)
      }
      case 6  => f07LowConf(r, url, ts)
      case 7  => f08Mega(r, url, ts)
      case 8  => f09TagSoup(r, url, ts)
      case 9  => f10Charset(r, url, ts, index)
      case 10 => f11Entities(r, url, ts)
      case 11 => if ((index / 16) % 2 == 0) f12PdfTwoCol(r, url, ts)
                 else f12PdfRealTwoCol(r, url, ts)
      case 12 => f13Degenerate(r, url, ts, index)
      case 13 => f01Article(r, url, ts).copy(category = "F14") // dup content, own url
      case 14 => f15Pre(r, url, ts)
      case 15 => f16Nested(r, url, ts)
    }
    g
  }

  def pages(seed: Long, n: Int): Vector[Golden] =
    (0 until n).map(page(seed, _)).toVector

  private def html(row: (String, Timestamp), body: String, lang: String = "en",
                   head: String = ""): PageRow =
    PageRow(row._1, row._2,
      s"<html><head>$head<title>ignored head title</title></head><body>$body</body></html>"
        .getBytes(StandardCharsets.UTF_8),
      null, lang)

  // F01: simple article — title + paragraphs, nothing dropped
  private def f01Article(r: Rng, url: String, ts: Timestamp): Golden = {
    val title = sentence(r).dropRight(1)
    val ps = (0 until (2 + r.nextInt(3))).map(_ => paragraph(r))
    val body = s"<h1>$title</h1>" + ps.map(p => s"<p>$p</p>").mkString
    val expected = (title +: ps).mkString("\n\n")
    Golden(html((url, ts), body), expected,
      ("title" +: ps.map(_ => "content")).toVector, "F01")
  }

  // F02: boilerplate-heavy page — nav/header/footer/sidebar stripped
  private def f02Boiler(r: Rng, url: String, ts: Timestamp): Golden = {
    val title = sentence(r).dropRight(1)
    val ps = (0 until (2 + r.nextInt(3))).map(_ => paragraph(r))
    val nav = "<nav><ul>" + BOILER_LINKS.take(5).map(l => s"""<li><a href="/$l">$l</a></li>""").mkString + "</ul></nav>"
    val header = s"""<header><div class="masthead">Site ${r.pick(WORDS)}</div></header>"""
    val sidebar = s"""<div class="sidebar"><p>${paragraph(r)}</p><a href="/x">More</a></div>"""
    val footer = """<footer><p>Copyright 2020. All rights reserved.</p></footer>"""
    val article = s"""<div class="article"><h1>$title</h1>""" +
      ps.map(p => s"<p>$p</p>").mkString + "</div>"
    val body = header + nav + sidebar + article + footer
    val expected = (title +: ps).mkString("\n\n")
    Golden(html((url, ts), body), expected,
      ("title" +: ps.map(_ => "content")).toVector, "F02")
  }

  // F03: two-column layout in HTML — extraction in DOM order (left div, right div)
  private def f03TwoColHtml(r: Rng, url: String, ts: Timestamp): Golden = {
    val left = (0 until 2).map(_ => paragraph(r))
    val right = (0 until 2).map(_ => paragraph(r))
    val body =
      s"""<div class="content" style="float:left;width:48%">""" +
        left.map(p => s"<p>$p</p>").mkString + "</div>" +
        s"""<div class="content" style="float:right;width:48%">""" +
        right.map(p => s"<p>$p</p>").mkString + "</div>"
    val expected = (left ++ right).mkString("\n\n")
    Golden(html((url, ts), body), expected,
      (left ++ right).map(_ => "content").toVector, "F03")
  }

  // F04: table page — cells row-major, " | " within row, "\n" across rows
  private def f04Table(r: Rng, url: String, ts: Timestamp): Golden = {
    val intro = paragraph(r)
    val nRows = 2 + r.nextInt(3)
    val nCols = 2 + r.nextInt(2)
    val headerCells = (0 until nCols).map(_ => r.pick(WORDS).capitalize)
    val rows = (0 until nRows).map(_ => (0 until nCols).map(_ =>
      r.pick(WORDS) + " " + (1 + r.nextInt(999))))
    val tableHtml = "<table><thead><tr>" +
      headerCells.map(c => s"<th>$c</th>").mkString + "</tr></thead><tbody>" +
      rows.map(row => "<tr>" + row.map(c => s"<td>$c</td>").mkString + "</tr>").mkString +
      "</tbody></table>"
    val outro = paragraph(r)
    val body = s"<p>$intro</p>" + tableHtml + s"<p>$outro</p>"
    val tableText = (headerCells.mkString(" | ") +: rows.map(_.mkString(" | "))).mkString("\n")
    val expected = Seq(intro, tableText, outro).mkString("\n\n")
    val labels = Vector("content") ++ Vector.fill((nRows + 1) * nCols)("cell") ++ Vector("content")
    Golden(html((url, ts), body), expected, labels, "F04")
  }

  // F04 span variant: colspan/rowspan occupancy — a rowspan leaves an empty
  // slot (its separator stays) in the covered row; a colspan advances the
  // column cursor. Expected text authored from the fixed span pattern.
  private def f04TableSpans(r: Rng, url: String, ts: Timestamp): Golden = {
    val intro = paragraph(r)
    def cell() = r.pick(WORDS) + " " + (1 + r.nextInt(999))
    val h = (0 until 3).map(_ => r.pick(WORDS).capitalize)
    val (r1, b1, c1, d2, e3, f3, g3) =
      (cell(), cell(), cell(), cell(), cell(), cell(), cell())
    val tableHtml =
      s"""<table><tr><th>${h(0)}</th><th>${h(1)}</th><th>${h(2)}</th></tr>""" +
        s"""<tr><td rowspan="2">$r1</td><td>$b1</td><td>$c1</td></tr>""" +
        s"""<tr><td colspan="2">$d2</td></tr>""" +
        s"""<tr><td>$e3</td><td>$f3</td><td>$g3</td></tr></table>"""
    val outro = paragraph(r)
    val body = s"<p>$intro</p>" + tableHtml + s"<p>$outro</p>"
    val tableText = s"${h.mkString(" | ")}\n$r1 | $b1 | $c1\n | $d2\n$e3 | $f3 | $g3"
    val expected = Seq(intro, tableText, outro).mkString("\n\n")
    val labels = Vector("content") ++ Vector.fill(10)("cell") ++ Vector("content")
    Golden(html((url, ts), body), expected, labels, "F04")
  }

  // F05: fragmented inline text — spans/b/em fused into one block
  private def f05Fragmented(r: Rng, url: String, ts: Timestamp): Golden = {
    val ps = (0 until 3).map(_ => paragraph(r))
    val inlineTags = Vector("b", "i", "em", "strong", "span", "u", "small")
    def fragment(p: String): String = {
      val ws = p.split(" ")
      ws.map { w =>
        if (r.nextInt(3) == 0) { val t = r.pick(inlineTags); s"<$t>$w</$t>" } else w
      }.mkString(" ")
    }
    val body = ps.map(p => s"<div>${fragment(p)}</div>").mkString
    Golden(html((url, ts), body), ps.mkString("\n\n"),
      ps.map(_ => "content").toVector, "F05")
  }

  // F06: PDF payload, single column, blocks written in shuffled order;
  // expected order recovered from positions (sorted_boxes semantics)
  private def f06PdfShuffled(r: Rng, url: String, ts: Timestamp): Golden = {
    val n = 4 + r.nextInt(3)
    val ps = (0 until n).map(_ => paragraph(r))
    // full-width blocks at y = 100*i
    val blocks = ps.zipWithIndex.map { case (p, i) => (50, 100 * (i + 1), 700, 80, p) }
    val shuffled = deterministicShuffle(blocks.toVector, r)
    val payload = "%PDF-GRAFT 1.0\npage 800 1200\n" +
      shuffled.map { case (x, y, w, h, t) => s"block $x $y $w $h $t" }.mkString("\n") +
      "\nendpage\n"
    Golden(PageRow(url, ts, payload.getBytes(StandardCharsets.UTF_8), null, "en"),
      ps.mkString("\n\n"), ps.map(_ => "content").toVector, "F06")
  }

  // F06 real-PDF variant: a genuine PDF (catalog/pages tree, FlateDecode
  // content stream, BT/ET text operators) — single column, paragraphs placed
  // top-down with a y cursor but EMITTED in shuffled order in the content
  // stream; expected order is recovered geometrically (sorted_boxes
  // semantics, like the mini variant, but through the real-PDF parser).
  private def f06PdfReal(r: Rng, url: String, ts: Timestamp,
                         build: Seq[RealPdfGen.PageSpec] => Array[Byte]): Golden = {
    val n = 4 + r.nextInt(3)
    val ps = (0 until n).map(_ => (0 until 2).map(_ => sentence(r)).mkString(" "))
    var y = 100
    val placed = ps.map { p =>
      val lines = RealPdfGen.wrap(p, 70)
      val b = RealPdfGen.Placed(50, y, 12, lines)
      y += lines.length * 14 + 40 // inter-block gap 40 > 2×fontSize: no merge
      b
    }
    val shuffled = deterministicShuffle(placed.toVector, r)
    val payload = build(Seq(RealPdfGen.PageSpec(800, 1200, shuffled, compress = true)))
    Golden(PageRow(url, ts, payload, null, "en"),
      ps.mkString("\n\n"), ps.map(_ => "content").toVector, "F06")
  }

  // F07: low-confidence junk blocks dropped, article kept
  private def f07LowConf(r: Rng, url: String, ts: Timestamp): Golden = {
    val ps = (0 until 2).map(_ => paragraph(r))
    val junk = Seq(
      """<div><a href="/ad">Click here now</a></div>""", // link-only
      "<div>ok</div>", // stray short
      s"""<div class="promo"><p>Buy ${r.pick(WORDS)} now limited offer great deal</p></div>""",
      """<div><a href="/a">x</a> <a href="/b">y</a> <a href="/c">z</a></div>"""
    )
    val body = junk(0) + s"<p>${ps(0)}</p>" + junk(1) + junk(2) +
      s"<p>${ps(1)}</p>" + junk(3)
    Golden(html((url, ts), body), ps.mkString("\n\n"),
      ps.map(_ => "content").toVector, "F07")
  }

  // F08: mega-document — many repeated sections (kept below the truncation cap
  // for the golden contract; truncation itself is unit-tested separately)
  private def f08Mega(r: Rng, url: String, ts: Timestamp): Golden = {
    val nSections = 40 + r.nextInt(20)
    val secs = (0 until nSections).map { i =>
      val h = s"Section ${i + 1} ${r.pick(WORDS)}"
      val ps = (0 until 3).map(_ => paragraph(r))
      (h, ps)
    }
    val body = secs.map { case (h, ps) =>
      s"<section><h2>$h</h2>" + ps.map(p => s"<p>$p</p>").mkString + "</section>"
    }.mkString
    val expected = secs.flatMap { case (h, ps) => h +: ps }.mkString("\n\n")
    val labels = secs.flatMap { case (_, ps) => "title" +: ps.map(_ => "content") }.toVector
    Golden(html((url, ts), body), expected, labels, "F08")
  }

  // F09: tag soup — unclosed <p>, stray </div>, script with '<', comments, bare '< '
  private def f09TagSoup(r: Rng, url: String, ts: Timestamp): Golden = {
    val p1 = paragraph(r)
    val p2 = paragraph(r)
    val p3 = s"For all x < y the ${r.pick(WORDS)} holds and y > x stays true."
    val body =
      s"<p>$p1<p>$p2</div><!-- stray close above, comment here -->" +
        "<script>if (a<b) { emit('<p>not text</p>'); }</script>" +
        s"<p>$p3</p><br>"
    val expected = Seq(p1, p2, p3).mkString("\n\n")
    Golden(html((url, ts), body), expected, Vector("content", "content", "content"), "F09")
  }

  // F10: charsets — latin-1 with meta, UTF-8 BOM, CJK (no-space), RTL arabic,
  // shift_jis / gbk / euc-kr (multi-byte ASCII supersets, raw-byte fast path),
  // utf-16le with BOM (transcode-first path)
  private def f10Charset(r: Rng, url: String, ts: Timestamp, index: Int): Golden = {
    (index / 16) % 8 match {
      case 0 => // latin-1
        val p = "Le café prépare un résumé naïve avec une señorita über garçon élégant."
        val p2 = paragraph(r)
        val doc = s"""<html><head><meta charset="iso-8859-1"></head><body><p>$p</p><p>$p2</p></body></html>"""
        Golden(PageRow(url, ts, doc.getBytes(StandardCharsets.ISO_8859_1), null, "fr"),
          Seq(p, p2).mkString("\n\n"), Vector("content", "content"), "F10")
      case 1 => // UTF-8 BOM
        val p = paragraph(r)
        val doc = "﻿" + s"<html><body><p>$p</p></body></html>"
        Golden(PageRow(url, ts, doc.getBytes(StandardCharsets.UTF_8), null, "en"),
          p, Vector("content"), "F10")
      case 2 => // CJK, no spaces
        val zhWords = Vector("数据", "处理", "系统", "分布式", "计算", "引擎", "文档", "提取", "内容", "模型", "索引", "查询")
        val p = (0 until 12).map(_ => r.pick(zhWords)).mkString("")
        val p2 = (0 until 15).map(_ => r.pick(zhWords)).mkString("")
        val doc = s"<html><body><p>$p</p><p>$p2</p></body></html>"
        Golden(PageRow(url, ts, doc.getBytes(StandardCharsets.UTF_8), null, "zh"),
          Seq(p, p2).mkString("\n\n"), Vector("content", "content"), "F10")
      case 3 => // arabic RTL (kept in logical order; no bidi reordering)
        val arWords = Vector("البيانات", "المعالجة", "النظام", "توزيع", "حساب", "محرك", "وثيقة", "استخراج", "محتوى")
        val p = (0 until 10).map(_ => r.pick(arWords)).mkString(" ")
        val doc = s"""<html><body dir="rtl"><p>$p</p></body></html>"""
        Golden(PageRow(url, ts, doc.getBytes(StandardCharsets.UTF_8), null, "ar"),
          p, Vector("content"), "F10")
      case 4 => // shift_jis with meta — trail bytes ≥ 0x40 keep the raw-byte path sound
        val jaWords = Vector("データ", "処理", "システム", "分散", "計算", "エンジン", "文書", "抽出", "内容", "索引")
        val p = (0 until 10).map(_ => r.pick(jaWords)).mkString("")
        val p2 = paragraph(r)
        val doc = s"""<html><head><meta charset="shift_jis"></head><body><p>$p</p><p>$p2</p></body></html>"""
        Golden(PageRow(url, ts, doc.getBytes(Charset.forName("Shift_JIS")), null, "ja"),
          Seq(p, p2).mkString("\n\n"), Vector("content", "content"), "F10")
      case 5 => // gbk with http-equiv content-type meta
        val zhWords = Vector("数据", "处理", "系统", "分布式", "计算", "引擎", "文档", "提取", "内容", "模型")
        val p = (0 until 12).map(_ => r.pick(zhWords)).mkString("")
        val doc = "<html><head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=gbk\">" +
          s"</head><body><p>$p</p></body></html>"
        Golden(PageRow(url, ts, doc.getBytes(Charset.forName("GBK")), null, "zh"),
          p, Vector("content"), "F10")
      case 6 => // euc-kr with meta
        val koWords = Vector("데이터", "처리", "시스템", "분산", "계산", "엔진", "문서", "추출", "내용", "색인")
        val p = (0 until 10).map(_ => r.pick(koWords)).mkString(" ")
        val doc = s"""<html><head><meta charset="euc-kr"></head><body><p>$p</p></body></html>"""
        Golden(PageRow(url, ts, doc.getBytes(Charset.forName("EUC-KR")), null, "ko"),
          p, Vector("content"), "F10")
      case _ => // utf-16le with BOM — exercises the transcode-first path
        val p = paragraph(r)
        val p2 = "Mixed UTF-16 content — ü é 中文 — survives transcoding."
        val doc = s"<html><body><p>$p</p><p>$p2</p></body></html>"
        val body = doc.getBytes(StandardCharsets.UTF_16LE)
        val payload = Array[Byte](0xff.toByte, 0xfe.toByte) ++ body
        Golden(PageRow(url, ts, payload, null, "en"),
          Seq(p, p2).mkString("\n\n"), Vector("content", "content"), "F10")
    }
  }

  // F11: entity/style noise — entities decoded once, style tags stripped.
  // The second noisy paragraph walks the long tail: HTML4 symbol/Greek names,
  // uppercase THORN, bare legacy refs without semicolons (&copy 1999, &amp),
  // C1 numeric remap (&#147; → '“' via windows-1252), and the spec's
  // longest-prefix behavior for unknown names (&notanentity; → '¬anentity;').
  private def f11Entities(r: Rng, url: String, ts: Timestamp): Golden = {
    val p1 = paragraph(r)
    val noisy = "Tom &amp; Jerry &lt;3 caf&eacute; A&#x42;C 1&nbsp;000 &copy; 2020 &mdash; fin&#46;"
    val decoded = "Tom & Jerry <3 café ABC 1 000 © 2020 — fin."
    val noisy2 = "Go &rarr; caf&oacute;? &THORN;orn &alpha;&beta; &sum; x&sup2; " +
      "&hearts; &zzz; stays, &notanentity; prefixes, &copy 1999 Tom &amp Jerry &#147;quoted&#148;"
    val decoded2 = "Go → cafó? Þorn αβ ∑ x² ♥ &zzz; stays, ¬anentity; prefixes, " +
      "© 1999 Tom & Jerry “quoted”"
    // HTML5 long tail (complete WHATWG table): rare single-cp names,
    // multi-codepoint references, zero-padded numerics, non-BMP script letters
    val noisy3 = "Math &NotEqualTilde; and &nvlt; with ligature &fjlig; " +
      "spaces[&ThickSpace;] arrow &Rarrtl; loop &CounterClockwiseContourIntegral; " +
      "pad &#0000000914; script &Xscr;&xscr;"
    val decoded3 = "Math \u2242\u0338 and <\u20D2 with ligature fj " +
      "spaces[\u205F\u200A] arrow \u2916 loop \u2233 " +
      "pad \u0392 script \uD835\uDCB3\uD835\uDCCD"
    val p2 = paragraph(r)
    val body = s"<p>$p1</p><p>$noisy</p><p>$noisy2</p><p>$noisy3</p><p><b>$p2</b><sup>1</sup></p>"
    // <sup>1</sup> is inline: fuses into the p2 block with no separator char,
    // but as a separate text node; expected text keeps it space-separated? No:
    // "<b>p2</b><sup>1</sup>" concatenates to p2 + "1". We author it that way.
    val expected = Seq(p1, decoded, decoded2, decoded3, p2 + "1").mkString("\n\n")
    Golden(html((url, ts), body), expected,
      Vector("content", "content", "content", "content", "content"), "F11")
  }

  // F12: PDF branch — two-column pages, multi-page, XY-cut order + page concat
  private def f12PdfTwoCol(r: Rng, url: String, ts: Timestamp): Golden = {
    val nPages = 1 + r.nextInt(3)
    val pageTexts = (0 until nPages).map { _ =>
      val headline = sentence(r)
      val left = (0 until 2).map(_ => paragraph(r))
      val right = (0 until 2).map(_ => paragraph(r))
      (headline, left, right)
    }
    val payload = "%PDF-GRAFT 1.0\n" + pageTexts.map { case (headline, left, right) =>
      // headline full width at y=50; left col x=50, right col x=450 (page w=800)
      val blocks = Vector((50, 50, 700, 40, headline)) ++
        left.zipWithIndex.map { case (p, i) => (50, 150 + 200 * i, 320, 180, p) } ++
        right.zipWithIndex.map { case (p, i) => (430, 150 + 200 * i, 320, 180, p) }
      val shuffled = deterministicShuffle(blocks, r)
      "page 800 1200\n" +
        shuffled.map { case (x, y, w, h, t) => s"block $x $y $w $h $t" }.mkString("\n") +
        "\nendpage"
    }.mkString("\n") + "\n"
    val expected = pageTexts.map { case (headline, left, right) =>
      (headline +: (left ++ right)).mkString("\n\n")
    }.mkString("\n\n")
    val labels = pageTexts.flatMap { case (_, l, rr) =>
      Vector.fill(1 + l.length + rr.length)("content")
    }.toVector
    Golden(PageRow(url, ts, payload.getBytes(StandardCharsets.UTF_8), null, "en"),
      expected, labels, "F12")
  }

  // F12 real-PDF variant: genuine two-column PDF pages. Nothing is
  // full-width, so the page is one XY-cut band: left-edge classification
  // (exact — never the width estimate) puts the headline + left column first,
  // then the right column, each sorted by y. Emission order is shuffled per
  // page; pages alternate Flate-compressed and raw streams so both decode
  // paths stay golden-covered.
  private def f12PdfRealTwoCol(r: Rng, url: String, ts: Timestamp): Golden = {
    val nPages = 1 + r.nextInt(2)
    val pageData = (0 until nPages).map { pi =>
      val headline = (0 until 4).map(_ => r.pick(WORDS)).mkString(" ").capitalize + "."
      val left = (0 until 2).map(_ => (0 until 2).map(_ => sentence(r)).mkString(" "))
      val right = (0 until 2).map(_ => (0 until 2).map(_ => sentence(r)).mkString(" "))
      def col(x: Int, ps: Seq[String]): Seq[RealPdfGen.Placed] = {
        var y = 150
        ps.map { p =>
          val lines = RealPdfGen.wrap(p, 45)
          val b = RealPdfGen.Placed(x, y, 12, lines)
          y += lines.length * 14 + 40
          b
        }
      }
      val blocks = Vector(RealPdfGen.Placed(50, 40, 12, Seq(headline))) ++
        col(50, left) ++ col(430, right)
      val shuffled = deterministicShuffle(blocks, r)
      (RealPdfGen.PageSpec(800, 1200, shuffled, compress = pi % 2 == 0),
        (headline +: (left ++ right)).mkString("\n\n"),
        1 + left.length + right.length)
    }
    val payload = RealPdfGen.build(pageData.map(_._1))
    val expected = pageData.map(_._2).mkString("\n\n")
    val labels = pageData.flatMap(p => Vector.fill(p._3)("content")).toVector
    Golden(PageRow(url, ts, payload, null, "en"), expected, labels, "F12")
  }

  // F13: degenerate — empty/whitespace/zero-byte payloads
  private def f13Degenerate(r: Rng, url: String, ts: Timestamp, index: Int): Golden = {
    val variant = (index / 16) % 3
    val payload = variant match {
      case 0 => Array.emptyByteArray
      case 1 => "<html><body></body></html>".getBytes(StandardCharsets.UTF_8)
      case _ => "<html><body>   \n\t  </body></html>".getBytes(StandardCharsets.UTF_8)
    }
    Golden(PageRow(url, ts, payload, null, null), "", Vector.empty, "F13")
  }

  // F15: <pre>/code block — interior newlines preserved (one per line run),
  // horizontal whitespace collapsed, leading indentation dropped
  private def f15Pre(r: Rng, url: String, ts: Timestamp): Golden = {
    val intro = paragraph(r)
    val lines = (0 until (3 + r.nextInt(3))).map(_ =>
      s"val ${r.pick(WORDS)} = ${r.pick(WORDS)}(${1 + r.nextInt(99)})")
    val outro = paragraph(r)
    // indentation + double spaces in the source; expected text collapses them
    val body = s"<p>$intro</p><pre>\n" +
      lines.map(l => "  " + l.replace(" = ", "  =  ")).mkString("\n\n") +
      s"\n</pre><p>$outro</p>"
    val preText = lines.mkString("\n")
    Golden(html((url, ts), body), Seq(intro, preText, outro).mkString("\n\n"),
      Vector("content", "content", "content"), "F15")
  }

  // F16: blockquote + nested lists — consecutive same-list items group with
  // "\n"; the nested list forms its own group
  private def f16Nested(r: Rng, url: String, ts: Timestamp): Golden = {
    val quote = paragraph(r)
    def item(): String = s"${r.pick(WORDS)} ${r.pick(WORDS)} ${r.pick(WORDS)}"
    val (a, b2, subA, subB, c) = (item(), item(), item(), item(), item())
    val outro = paragraph(r)
    val body = s"<blockquote><p>$quote</p></blockquote>" +
      s"<ul><li>$a</li><li>$b2<ul><li>$subA</li><li>$subB</li></ul></li>" +
      s"<li>$c</li></ul><p>$outro</p>"
    val expected = Seq(quote, s"$a\n$b2", s"$subA\n$subB", c, outro).mkString("\n\n")
    Golden(html((url, ts), body), expected,
      Vector("content", "item", "item", "item", "item", "item", "content"), "F16")
  }

  private def deterministicShuffle[T](xs: Vector[T], r: Rng): Vector[T] = {
    val a = xs.toArray[Any]
    var i = a.length - 1
    while (i > 0) {
      val j = r.nextInt(i + 1)
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    a.toVector.asInstanceOf[Vector[T]]
  }
}
