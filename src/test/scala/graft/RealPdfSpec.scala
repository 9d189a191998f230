package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.RealPdfGen
import graft.extract.{ExtractConfig, Extractor}
import graft.pdf.{PdfBranch, RealPdf}

/** Real-PDF branch: from-scratch parse of genuine PDF files (object scan,
  * page tree, FlateDecode, BT/ET text operators), unparsed-status contract,
  * and the page cap. */
class RealPdfSpec extends AnyFunSuite {

  private def onePage(blocks: Seq[RealPdfGen.Placed], compress: Boolean) =
    RealPdfGen.build(Seq(RealPdfGen.PageSpec(800, 1200, blocks, compress)))

  test("compressed and raw content streams extract identical text") {
    val blocks = Seq(
      RealPdfGen.Placed(50, 100, 12, Seq("Alpha beta gamma delta.", "Second line here.")),
      RealPdfGen.Placed(50, 300, 12, Seq("Another paragraph block.")))
    val a = Extractor.extract("u", onePage(blocks, compress = true))
    val b = Extractor.extract("u", onePage(blocks, compress = false))
    assert(a.status == "ok" && b.status == "ok")
    assert(a.text == "Alpha beta gamma delta. Second line here.\n\nAnother paragraph block.")
    assert(a.text == b.text)
    assert(a.spans.forall(_.tagPath.startsWith("pdf/")))
  }

  test("shuffled emission order is recovered geometrically (two columns)") {
    // right column emitted first; left edge decides the column, y the order
    val blocks = Seq(
      RealPdfGen.Placed(430, 150, 12, Seq("Right one.")),
      RealPdfGen.Placed(50, 300, 12, Seq("Left two.")),
      RealPdfGen.Placed(430, 300, 12, Seq("Right two.")),
      RealPdfGen.Placed(50, 150, 12, Seq("Left one.")),
      RealPdfGen.Placed(50, 40, 12, Seq("Headline.")))
    val doc = Extractor.extract("u", onePage(blocks, compress = true))
    assert(doc.text ==
      "Headline.\n\nLeft one.\n\nLeft two.\n\nRight one.\n\nRight two.")
  }

  test("/Rotate 90/180/270 pages extract byte-identically to the upright twin") {
    // two-column layout + multi-line paragraph: the XY-cut must see upright
    // geometry or the reading order scrambles
    val blocks = Seq(
      RealPdfGen.Placed(430, 150, 12, Seq("Right one.")),
      RealPdfGen.Placed(50, 300, 12, Seq("Left two wraps", "onto a second line.")),
      RealPdfGen.Placed(430, 300, 12, Seq("Right two.")),
      RealPdfGen.Placed(50, 150, 12, Seq("Left one.")),
      RealPdfGen.Placed(50, 40, 12, Seq("Headline.")))
    val spec = Seq(RealPdfGen.PageSpec(800, 1200, blocks, compress = true))
    val upright = Extractor.extract("u", RealPdfGen.build(spec))
    assert(upright.status == "ok" && upright.text.startsWith("Headline."))
    for (rot <- Seq(90, 180, 270)) {
      val payload = RealPdfGen.buildRotated(spec, rot)
      val twin = Extractor.extract("u", payload)
      assert(twin.status == "ok", s"rot $rot: ${twin.status}")
      assert(twin.text == upright.text, s"rot $rot text mismatch:\n${twin.text}")
      assert(twin.spans.map(s => (s.tagPath, s.text)) ==
        upright.spans.map(s => (s.tagPath, s.text)), s"rot $rot spans")
      // lineage: the rotation is recorded, upright dims reported
      val pp = PdfBranch.parsePayload(payload, ExtractConfig())
      assert(pp.rotatedPages == 1, s"rot $rot not recorded")
      assert(pp.pages.head._1 == 800, s"rot $rot pageW ${pp.pages.head._1}")
      val parsed = RealPdf.parse(payload, 64).get
      assert((parsed.pages.head.pageW, parsed.pages.head.pageH) == ((800, 1200)))
    }
    // /Rotate INHERITED from the Pages node (§7.7.3.4) behaves identically
    val inherited = RealPdfGen.buildRotated(spec, 90, inheritRotate = true)
    val twinI = Extractor.extract("u", inherited)
    assert(twinI.status == "ok" && twinI.text == upright.text, twinI.text)
    assert(PdfBranch.parsePayload(inherited, ExtractConfig()).rotatedPages == 1)
    // /Rotate as an INDIRECT reference (`/Rotate N 0 R` → bare int object,
    // §7.3.10) resolves — and is never misread as an N-degree literal
    val indirect = RealPdfGen.buildRotated(spec, 90, indirectRotate = true)
    val twinR = Extractor.extract("u", indirect)
    assert(twinR.status == "ok" && twinR.text == upright.text, twinR.text)
    assert(PdfBranch.parsePayload(indirect, ExtractConfig()).rotatedPages == 1)
    // a /Rotate 0 (or absent) page records nothing
    assert(PdfBranch.parsePayload(RealPdfGen.build(spec), ExtractConfig())
      .rotatedPages == 0)
  }

  test("indirect /Rotate whose target int lives INSIDE an ObjStm resolves") {
    val spec = Seq(RealPdfGen.PageSpec(800, 1200,
      Seq(RealPdfGen.Placed(50, 40, 12, Seq("Stream-borne rotation."))), compress = true))
    val parsed = RealPdf.parse(RealPdfGen.buildObjStmRotated(spec, 180), 64).get
    assert(parsed.rotatedPages == 1)
    assert((parsed.pages.head.pageW, parsed.pages.head.pageH) == ((800, 1200)))
    assert(parsed.pages.head.blocks.exists(_.text.contains("Stream-borne rotation.")))
  }

  test("indirect /Rotate with a multi-digit object number resolves, never misreads a prefix") {
    // `/Rotate 900 0 R` where object 900 holds 180: a backtracking regex
    // would match "90" (the object number's prefix, a legal rotation!) —
    // correct behavior resolves the reference and reads 180, so the page
    // dims must stay UNswapped (180 keeps w×h) and the page counts rotated
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 800 1200] " +
      "/Rotate 900 0 R /Contents 4 0 R /Resources << /Font << /F1 " +
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> >> >> endobj\n" +
      "4 0 obj << >> stream\nBT /F1 12 Tf 50 1150 Td (Hello world.) Tj ET\nendstream endobj\n" +
      "900 0 obj\n180\nendobj\n" +
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val parsed = RealPdf.parse(pdf, 64).get
    assert(parsed.rotatedPages == 1)
    // 180: axes unswapped — a "90" prefix misread would have swapped them
    assert((parsed.pages.head.pageW, parsed.pages.head.pageH) == ((800, 1200)))
    assert(parsed.pages.head.blocks.exists(_.text.contains("Hello world.")))
  }

  test("indirect /Rotate to a NON-integer object is the spec default 0, not a scraped digit") {
    // object-number reuse after an incremental save: /Rotate 900 0 R points
    // at a DICT (`<< /Kids [90 0 R] >>`). Scraping the first embedded
    // integer would invent a 90° rotation and scramble reading order on a
    // page every conforming viewer shows upright — the target must BE a
    // bare integer to count
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 800 1200] " +
      "/Rotate 900 0 R /Contents 4 0 R /Resources << /Font << /F1 " +
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> >> >> endobj\n" +
      "4 0 obj << >> stream\nBT /F1 12 Tf 50 1150 Td (Hello world.) Tj ET\nendstream endobj\n" +
      "900 0 obj\n<< /Kids [90 0 R] >>\nendobj\n" +
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val parsed = RealPdf.parse(pdf, 64).get
    assert(parsed.rotatedPages == 0, "dict target must not yield a rotation")
    assert((parsed.pages.head.pageW, parsed.pages.head.pageH) == ((800, 1200)))
    assert(parsed.pages.head.blocks.exists(_.text.contains("Hello world.")))
  }

  test("absurd /Length values and object numbers degrade locally, never void the doc") {
    // Pre-fix, each of these voided the ENTIRE document via the top-level
    // NonFatal catch: an 11-digit /Length threw NumberFormatException in
    // directInt's `.toInt`; a valid-Int /Length near 2^31 wrapped `ds + len`
    // negative and copyOfRange threw; an 11-digit object number threw in the
    // scan. Correct behavior: a bad /Length falls back to the endstream
    // search for THAT stream, a bad object number skips ITS definition.
    def doc(lengthEntry: String, extraObj: String) = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 800 1200] " +
      "/Contents 4 0 R /Resources << /Font << /F1 " +
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> >> >> endobj\n" +
      s"4 0 obj << $lengthEntry >> stream\n" +
      "BT /F1 12 Tf 50 1150 Td (Hello world.) Tj ET\nendstream endobj\n" +
      extraObj +
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val cases = Seq(
      doc("/Length 99999999999", ""),            // > Int.MaxValue: NFE pre-fix
      doc("/Length 2147483000", ""),             // valid Int: ds+len wrapped pre-fix
      doc("", "99999999999 0 obj\n42\nendobj\n") // pseudo object number
    )
    for ((pdf, i) <- cases.zipWithIndex) {
      val parsed = RealPdf.parse(pdf, 64)
      assert(parsed.isDefined, s"case $i must parse")
      assert(parsed.get.pages.head.blocks.exists(_.text.contains("Hello world.")),
        s"case $i must keep the page text")
    }
  }

  test("multi-page PDFs concatenate pages in tree order") {
    val pdf = RealPdfGen.build(Seq(
      RealPdfGen.PageSpec(800, 1200, Seq(RealPdfGen.Placed(50, 100, 12, Seq("Page one."))), compress = true),
      RealPdfGen.PageSpec(800, 1200, Seq(RealPdfGen.Placed(50, 100, 12, Seq("Page two."))), compress = false)))
    val doc = Extractor.extract("u", pdf)
    assert(doc.text == "Page one.\n\nPage two.")
    assert(doc.spans.map(_.tagPath) == Seq("pdf/page0", "pdf/page1"))
  }

  test("escapes, octal, hex strings and TJ kerning decode") {
    val content =
      """BT /F1 12 Tf 50 1100 Td ((paren\)) \\slash \101BC) Tj ET
        |BT /F1 12 Tf 50 1000 Td [(Kerned) -250 (words) 20 (fused)] TJ ET
        |BT /F1 12 Tf 50 900 Td <48656C6C6F> Tj ET""".stripMargin
        .getBytes(StandardCharsets.ISO_8859_1)
    // wrap the raw content in a minimal page by hand
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 800 1200] /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n").getBytes(StandardCharsets.ISO_8859_1) ++
      content ++ "\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n".getBytes(StandardCharsets.ISO_8859_1)
    val doc = Extractor.extract("u", pdf)
    // ((paren\)) …) decodes to "(paren))": nested open, escaped close, real close
    assert(doc.text == "(paren)) \\slash ABC\n\nKerned wordsfused\n\nHello")
  }

  test("PDF 1.5 /ObjStm layout: page dicts inside a compressed object stream") {
    val pages = Seq(
      RealPdfGen.PageSpec(800, 1200, Seq(
        RealPdfGen.Placed(50, 100, 12, Seq("Object stream page one.", "Wrapped line.")),
        RealPdfGen.Placed(50, 300, 12, Seq("Second block."))), compress = true),
      RealPdfGen.PageSpec(800, 1200, Seq(
        RealPdfGen.Placed(50, 100, 12, Seq("Object stream page two."))), compress = false))
    val classic = Extractor.extract("u", RealPdfGen.build(pages))
    val objstm = Extractor.extract("u", RealPdfGen.buildObjStm(pages))
    assert(objstm.status == "ok", objstm.status)
    assert(objstm.text ==
      "Object stream page one. Wrapped line.\n\nSecond block.\n\nObject stream page two.")
    // the 1.5 layout must extract the same text the classic layout does
    assert(objstm.text == classic.text)
    assert(objstm.spans.map(_.label) == classic.spans.map(_.label))
  }

  test("an ObjStm whose stream is corrupt is flagged, not silent") {
    val pages = Seq(RealPdfGen.PageSpec(800, 1200, Seq(
      RealPdfGen.Placed(50, 100, 12, Seq("Hidden page."))), compress = false))
    val pdf = RealPdfGen.buildObjStm(pages)
    // corrupt the ObjStm deflate body: find its "stream\n" after /ObjStm
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val objStmDict = s.indexOf("/ObjStm")
    val streamAt = s.indexOf("stream\n", objStmDict) + 7
    val broken = pdf.clone()
    var i = streamAt + 2
    while (i < streamAt + 12 && i < broken.length) { broken(i) = 0x00; i += 1 }
    val doc = Extractor.extract("u", broken)
    // page dicts lived only in the ObjStm: nothing decodable remains
    assert(doc.status == "pdf_unparsed")
    assert(doc.text == "")
  }

  test("/ToUnicode CMap: custom-encoded font bytes decode to the intended text") {
    val pages = Seq(RealPdfGen.PageSpec(800, 1200, Seq(
      RealPdfGen.Placed(50, 100, 12, Seq("The first finding of figs.", "Plain second line here.")),
      RealPdfGen.Placed(50, 300, 12, Seq("Final paragraph with fixed effects."))), compress = true))
    val doc = Extractor.extract("u", RealPdfGen.buildToUnicode(pages))
    assert(doc.status == "ok")
    // "fi" digraphs ride the multi-codepoint bfchar (code 0x1F → "fi");
    // everything else the +0x80 bfrange — without the CMap this is garbage
    assert(doc.text ==
      "The first finding of figs. Plain second line here.\n\nFinal paragraph with fixed effects.")
    // uncompressed content variant decodes identically
    val raw = Extractor.extract("u", RealPdfGen.buildToUnicode(
      pages.map(_.copy(compress = false))))
    assert(raw.text == doc.text)
  }

  test("simple-font /Encoding dict + /Differences decodes remapped bytes") {
    // e/t/a/o/n/s ride codes 0x80-0x85 (0x85 via the uni0073 name form); a
    // parser ignoring /Differences would emit cp1252 punctuation for them
    val pages = Seq(RealPdfGen.PageSpec(800, 1200, Seq(
      RealPdfGen.Placed(50, 100, 12, Seq("The first encoded sentence here.", "Plain second line too.")),
      RealPdfGen.Placed(50, 300, 12, Seq("Another paragraph wants letters."))), compress = true))
    val doc = Extractor.extract("u", RealPdfGen.buildEncodedDiff(pages))
    assert(doc.status == "ok", doc.status)
    assert(doc.text ==
      "The first encoded sentence here. Plain second line too.\n\nAnother paragraph wants letters.")
    val raw = Extractor.extract("u", RealPdfGen.buildEncodedDiff(
      pages.map(_.copy(compress = false))))
    assert(raw.text == doc.text)
  }

  test("Identity-H CID font without /ToUnicode: show dropped, doc pdf_partial") {
    val pages = Seq(RealPdfGen.PageSpec(800, 1200, Seq(
      RealPdfGen.Placed(50, 100, 12, Seq("Readable Helvetica paragraph."))), compress = true))
    val doc = Extractor.extract("u", RealPdfGen.buildIdentityCid(pages))
    // the F1 text survives; the C2 glyph-id show is dropped, never mojibake
    assert(doc.text == "Readable Helvetica paragraph.")
    assert(doc.status == "pdf_partial", doc.status)
    assert(!doc.text.exists(c => c < 0x20 && c != '\n'), "control-char mojibake leaked")
  }

  test("Identity-H WITH embedded /FontFile2 cmap: glyph ids reverse to text, doc ok") {
    val cidText = "Recovered cid text."
    val pages = Seq(RealPdfGen.PageSpec(800, 1200, Seq(
      RealPdfGen.Placed(50, 100, 12, Seq("Readable Helvetica paragraph."))), compress = true))
    for (fmt <- Seq(4, 12)) { // both sfnt cmap subtable formats
      val doc = Extractor.extract("u",
        RealPdfGen.buildIdentityCidEmbedded(pages, cidText, cmapFormat = fmt))
      assert(doc.status == "ok", s"format $fmt: ${doc.status}")
      assert(doc.text == s"Readable Helvetica paragraph.\n\n$cidText",
        s"format $fmt:\n${doc.text}")
    }
    // a gid OUTSIDE the embedded cmap still drops + flags (never mojibake):
    // reuse the no-FontFile2 builder as the control — unchanged contract
    val ctl = Extractor.extract("u", RealPdfGen.buildIdentityCid(pages))
    assert(ctl.status == "pdf_partial" && ctl.text == "Readable Helvetica paragraph.")
  }

  test("TrueTypeCmap: authored tables parse exactly; corrupt tables refuse") {
    import graft.pdf.TrueTypeCmap
    val pairs = Seq(('A'.toInt, 0x40), ('b'.toInt, 0x41), (0x20AC, 0x42)) // incl. €
    for (fmt <- Seq(4, 12)) {
      val ttf = RealPdfGen.buildTtfCmap(pairs, fmt)
      assert(TrueTypeCmap.charToGid(ttf).contains(pairs.toMap), s"format $fmt")
      val rev = TrueTypeCmap.gidToText(ttf).get
      assert(rev == Map(0x40 -> "A", 0x41 -> "b", 0x42 -> "€"), s"format $fmt")
    }
    // collision keeps the smallest char (deterministic)
    val dup = RealPdfGen.buildTtfCmap(Seq(('a'.toInt, 7), ('Z'.toInt, 7)), 4)
    assert(TrueTypeCmap.gidToText(dup).get.apply(7) == "Z")
    // truncation / garbage never throws, never fabricates
    val good = RealPdfGen.buildTtfCmap(pairs, 4)
    for (n <- Seq(0, 4, 11, 20, 40, good.length - 1))
      assert(TrueTypeCmap.charToGid(good.take(n)).isEmpty, s"truncated at $n")
    assert(TrueTypeCmap.charToGid("not a font at all".getBytes("UTF-8")).isEmpty)
  }

  test("TrueTypeCmap fuzz: bit-flipped and random inputs never throw, never map out of range") {
    import graft.pdf.TrueTypeCmap
    // deterministic seed: this is a pinned regression corpus, not Monte Carlo
    val rnd = new scala.util.Random(0x7007f0d7L)
    def wellFormed(m: Map[Int, Int]): Unit = m.foreach { case (c, g) =>
      assert(c >= 0 && c <= 0x10ffff, s"char out of Unicode range: $c")
      assert(g > 0 && g <= 0xffff, s"gid out of range: $g")
    }
    // structured mutations: every single-byte corruption of a valid font at
    // pseudo-random positions, plus each byte zeroed/maxed at header offsets
    val bases = Seq(
      RealPdfGen.buildTtfCmap(Seq(('A'.toInt, 1), (0x20AC, 2), (0xFF00, 3)), 4),
      RealPdfGen.buildTtfCmap(Seq(('A'.toInt, 1), (0x20AC, 2), (0x1F600, 3)), 12),
      RealPdfGen.buildTtfCmapFinalRange(start = 0xFF00, gid0 = 0x40))
    for (good <- bases) {
      for (_ <- 0 until 400) {
        val b = good.clone()
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        TrueTypeCmap.charToGid(b).foreach(wellFormed) // must not throw
      }
      for (i <- 0 until math.min(64, good.length); v <- Seq(0x00, 0xff)) {
        val b = good.clone(); b(i) = v.toByte
        TrueTypeCmap.charToGid(b).foreach(wellFormed)
      }
    }
    // unstructured: pure random byte arrays of assorted sizes
    for (n <- Seq(1, 7, 12, 64, 256, 4096); _ <- 0 until 20) {
      val b = new Array[Byte](n); rnd.nextBytes(b)
      TrueTypeCmap.charToGid(b).foreach(wellFormed)
    }
  }

  test("TrueTypeCmap format 4: a REAL final segment ending at 0xFFFF keeps its mappings") {
    import graft.pdf.TrueTypeCmap
    // spec: the last segment MUST end at 0xFFFF, and it may carry real
    // mappings — only the code point 0xFFFF itself is the terminator char.
    // Expected mapping authored from the builder's contract, not the parser.
    val ttf = RealPdfGen.buildTtfCmapFinalRange(start = 0xFF00, gid0 = 0x40)
    val m = TrueTypeCmap.charToGid(ttf).get
    assert(m == (0xFF00 to 0xFFFE).map(c => c -> (0x40 + c - 0xFF00)).toMap)
    assert(!m.contains(0xFFFF), "the terminator char itself never maps")
  }

  test("Identity-H-only page (no mappable text) is pdf_unparsed") {
    val pages = Seq(RealPdfGen.PageSpec(800, 1200, Seq.empty, compress = false))
    val doc = Extractor.extract("u", RealPdfGen.buildIdentityCid(pages))
    assert(doc.text == "")
    assert(doc.status == "pdf_unparsed", doc.status)
  }

  test("name-form /Encoding /WinAnsiEncoding decodes cp1252-only bytes") {
    // 0x93/0x94 curly quotes, 0x97 emdash, 0x80 euro — all differ from
    // Latin-1 (the fallback would emit C1 control chars the normalizer
    // strips or garbles)
    val shown = "“Café” — 5€"
    val showBytes = shown.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val content = "BT /F1 12 Tf 50 1100 Td (".getBytes(StandardCharsets.ISO_8859_1) ++
      showBytes ++ ") Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 800 1200] /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n").getBytes(StandardCharsets.ISO_8859_1) ++
      content ++ ("\nendstream\nendobj\n" +
      "5 0 obj\n<< /Type /Font /Subtype /TrueType /BaseFont /Arial " +
      "/Encoding /WinAnsiEncoding >>\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val doc = Extractor.extract("u", pdf)
    assert(doc.status == "ok", doc.status)
    assert(doc.text == shown, doc.text)
  }

  test("Encodings tables: Appendix D quirks and glyph-name resolution") {
    import graft.pdf.Encodings
    // WinAnsi = cp1252 + quirks
    assert(Encodings.winAnsi(0x93) == "“" && Encodings.winAnsi(0x94) == "”")
    assert(Encodings.winAnsi(0x80) == "€" && Encodings.winAnsi(0xe9) == "é")
    assert(Encodings.winAnsi(0x81) == "•" && Encodings.winAnsi(0xad) == "-")
    assert(Encodings.winAnsi(0xa0) == " ")
    // Standard: quote quirks + symbol range
    assert(Encodings.standard(0x27) == "’" && Encodings.standard(0x60) == "‘")
    assert(Encodings.standard(0xa9) == "'" && Encodings.standard(0xae) == "ﬁ")
    assert(Encodings.standard(0xd0) == "—" && Encodings.standard(0xfb) == "ß")
    assert(Encodings.standard(0x90) == null) // undefined slot → caller fallback
    assert(Encodings.standard(0xe9) == "Ø")  // Oslash lives at 0xE9 in Standard
    // MacRoman: PDF-era currency at 0xDB, space in the nbsp slot, é at 0x8E
    assert(Encodings.macRoman(0xdb) == "¤" && Encodings.macRoman(0xca) == " ")
    assert(Encodings.macRoman(0x8e) == "é")
    // glyph names: AGL subset + uniXXXX + uXXXXX forms
    assert(Encodings.glyph("eacute").contains("é"))
    assert(Encodings.glyph("quotedblleft").contains("“"))
    assert(Encodings.glyph("uni0041").contains("A"))
    assert(Encodings.glyph("uni00660069").contains("fi"))
    assert(Encodings.glyph("u1F600").contains(new String(Character.toChars(0x1f600))))
    assert(Encodings.glyph("notaglyphname").isEmpty)
    // Differences overlay: ints set the cursor, names assign sequentially;
    // unknown names CLEAR the slot (fallback, never a wrong char)
    val t = Encodings.withDifferences(Encodings.winAnsi,
      " 65 /eacute /notaglyphname 200 /Euro ")
    assert(t(65) == "é" && t(66) == null && t(200) == "€" && t(67) == "C")
  }

  test("parseToUnicode: bfchar, bfrange increment + array forms, codespace width") {
    val cmap = ("""1 begincodespacerange
      |<0000> <FFFF>
      |endcodespacerange
      |2 beginbfchar
      |<0041> <0058>
      |<0042> <00660069>
      |endbfchar
      |2 beginbfrange
      |<0060> <0062> <0041>
      |<0070> <0071> [<0050> <0051>]
      |endbfrange
      |""".stripMargin).getBytes(StandardCharsets.ISO_8859_1)
    val tu = graft.pdf.RealPdf.parseToUnicode(cmap).get
    assert(tu.codeBytes == 2)
    assert(tu.map(0x41) == "X")
    assert(tu.map(0x42) == "fi")
    assert(tu.map(0x60) == "A" && tu.map(0x61) == "B" && tu.map(0x62) == "C")
    assert(tu.map(0x70) == "P" && tu.map(0x71) == "Q")
  }

  test("LZWDecode: round trip across all code-width boundaries and a table reset") {
    // deterministic pseudo-random-ish bytes, long enough to cross 9→10→11→12
    // bits and force a 4096-entry dictionary reset
    var state = 42L
    val data = Array.tabulate[Byte](200000) { _ =>
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      (z >>> 33).toByte
    }
    val enc = RealPdfGen.lzwEncode(data)
    val dec = RealPdf.lzwDecode(enc, earlyChange = 1)
    assert(!dec.failed)
    assert(java.util.Arrays.equals(dec.data, data))
    // highly repetitive data exercises long dictionary chains
    val rep = ("the quick brown fox " * 3000).getBytes(StandardCharsets.ISO_8859_1)
    val dec2 = RealPdf.lzwDecode(RealPdfGen.lzwEncode(rep), 1)
    assert(!dec2.failed && java.util.Arrays.equals(dec2.data, rep))
  }

  test("decompression bombs cap at the stream ceiling: flagged prefix, bounded memory") {
    // LZW expands up to ~3600:1 and deflate ~1000:1 — a KB-to-MB-sized
    // hostile stream demanding GBs must keep a FLAGGED prefix at the
    // 128 MiB ceiling, never attempt the allocation (past 2 GiB that is
    // OutOfMemoryError, an Error the parse catch does not contain).
    val ceiling = 1 << 27
    // LZW: 136 MiB of zeros encodes to ~100 KB (chains grow 1 byte/code)
    val zeros = new Array[Byte](ceiling + (8 << 20))
    val lzw = RealPdf.lzwDecode(RealPdfGen.lzwEncode(zeros), earlyChange = 1)
    assert(lzw.failed, "over-ceiling LZW output must be flagged")
    assert(lzw.data.length > ceiling - (1 << 12) &&
      lzw.data.length <= ceiling + (1 << 12), "retained ≈ the ceiling only")
    assert(lzw.data.forall(_ == 0))
    // deflate, end-to-end: a content-stream bomb degrades the page, not the
    // task — parse completes and the loss is flagged (pdf_partial channel)
    val deflater = new java.util.zip.Deflater()
    val bos = new java.io.ByteArrayOutputStream()
    deflater.setInput(zeros); deflater.finish()
    val buf = new Array[Byte](1 << 16)
    while (!deflater.finished()) bos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val data = bos.toByteArray
    val pdf = (("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 800 1200] " +
      "/Contents 4 0 R /Resources << /Font << /F1 " +
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> >> >> endobj\n" +
      s"4 0 obj << /Length ${data.length} /Filter /FlateDecode >> stream\n")
      .getBytes(StandardCharsets.ISO_8859_1)) ++ data ++
      "\nendstream endobj\ntrailer << /Size 5 /Root 1 0 R >>\n%%EOF"
        .getBytes(StandardCharsets.ISO_8859_1)
    val parsed = RealPdf.parse(pdf, 64)
    assert(parsed.isDefined, "bomb content stream must not void the parse")
    assert(parsed.get.decodeFailures >= 1, "the capped stream is flagged")
  }

  test("LZW round trip at flush-code width boundaries (lengths 700-1900 sweep)") {
    // r3 review: when the final flush code lands the decoder exactly on a
    // 2^n-1 table boundary, EOD was emitted one bit narrow — lengths 769 and
    // 1813 of this exact byte stream reproduced it (2 bytes of garbage with
    // failed=false). Sweep every length in the window to pin the pairing.
    var state = 42L
    val full = Array.tabulate[Byte](1900) { _ =>
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      (z >>> 33).toByte
    }
    var len = 700
    while (len <= 1900) {
      val data = java.util.Arrays.copyOf(full, len)
      val dec = RealPdf.lzwDecode(RealPdfGen.lzwEncode(data), 1)
      assert(!dec.failed, s"len=$len flagged failed")
      assert(java.util.Arrays.equals(dec.data, data), s"len=$len diverged")
      len += 1
    }
  }

  test("absurd CMap entries skip the entry, not the document") {
    // a hex key wider than any codespace must not throw out of parse()
    // (that downgraded the whole document to pdf_unparsed, r3 review)
    val cmap = ("1 beginbfchar\n<FFFFFFFFFFFFFFFFFF> <0041>\nendbfchar\n" +
      "1 beginbfrange\n<A0> <FE> <0020>\nendbfrange\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    val tu = RealPdf.parseToUnicode(cmap).get
    assert(tu.map.size == 0x5F) // only the sane range survived
    assert(tu.map(0xA0) == " ")
  }

  test("bfchar destinations shorter than one UTF-16 unit left-pad (<41> is 'A')") {
    val cmap = "1 beginbfchar\n<05> <41>\nendbfchar\n".getBytes(StandardCharsets.ISO_8859_1)
    val tu = RealPdf.parseToUnicode(cmap).get
    assert(tu.map(0x05) == "A") // right-padding would give U+4100
  }

  test("fonts with real-world subset names (C2_0) get their ToUnicode map") {
    // the standard Adobe/InDesign naming uses '_' — the font-entry pattern
    // must accept any PDF-name character run
    // compress=false so the rename reaches the in-stream Tf operand too
    val pages = Seq(RealPdfGen.PageSpec(800, 1200, Seq(
      RealPdfGen.Placed(50, 100, 12, Seq("Subset font naming works fine."))), compress = false))
    val pdf = RealPdfGen.buildToUnicode(pages)
    val renamed = new String(pdf, StandardCharsets.ISO_8859_1)
      .replace("/F1", "/C2_0")
    val doc = Extractor.extract("u", renamed.getBytes(StandardCharsets.ISO_8859_1))
    assert(doc.text == "Subset font naming works fine.", doc.text)
  }

  test("LZW content streams extract identically to Flate") {
    val pages = Seq(RealPdfGen.PageSpec(800, 1200, Seq(
      RealPdfGen.Placed(50, 100, 12, Seq("LZW compressed paragraph text.", "Second wrapped line.")),
      RealPdfGen.Placed(50, 300, 12, Seq("Another block via LZW."))), compress = true))
    val flate = Extractor.extract("u", RealPdfGen.build(pages))
    val lzw = Extractor.extract("u", RealPdfGen.buildLzw(pages))
    assert(lzw.status == "ok", lzw.status)
    assert(lzw.text == flate.text)
  }

  test("PNG-predicted ObjStm (/DecodeParms /Predictor 12) extracts like the plain one") {
    val pages = Seq(
      RealPdfGen.PageSpec(800, 1200, Seq(
        RealPdfGen.Placed(50, 100, 12, Seq("Predicted object stream page."))), compress = true),
      RealPdfGen.PageSpec(800, 1200, Seq(
        RealPdfGen.Placed(50, 100, 12, Seq("Second page content here."))), compress = false))
    val plain = Extractor.extract("u", RealPdfGen.buildObjStm(pages))
    val pred = Extractor.extract("u", RealPdfGen.buildObjStmPredicted(pages))
    assert(pred.status == "ok", pred.status)
    assert(pred.text == plain.text)
    assert(pred.text.contains("Second page content here."))
  }

  test("unparseable real PDF is recorded, never a silent empty") {
    val junk = ("%PDF-1.7\nthis is not really a pdf body at all\n%%EOF\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    val doc = Extractor.extract("u", junk)
    assert(doc.status == "pdf_unparsed")
    assert(doc.text == "")
    // unsupported filter with no recoverable text → pdf_unparsed too
    val dct = ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      "4 0 obj\n<< /Length 4 /Filter /DCTDecode >>\nstream\nABCD\nendstream\nendobj\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    val doc2 = Extractor.extract("u", dct)
    assert(doc2.status == "pdf_unparsed")
    // the mini format and plain HTML stay "ok"
    assert(Extractor.extract("u",
      "%PDF-GRAFT 1.0\npage 800 1200\nblock 1 1 5 5 x\nendpage\n".getBytes("UTF-8")).status == "ok")
    assert(Extractor.extract("u", "<p>hello world</p>".getBytes("UTF-8")).status == "ok")
  }

  test("page cap truncates and flags (mini and real formats)") {
    val mini = ("%PDF-GRAFT 1.0\n" + (0 until 40).map(i =>
      s"page 800 1200\nblock 50 100 700 80 page $i\nendpage").mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8)
    val capped = Extractor.extract("u", mini, ExtractConfig(maxPdfPages = 10))
    assert(capped.truncated)
    assert(capped.spans.map(_.tagPath).distinct.length == 10)
    val real = RealPdfGen.build((0 until 40).map(i => RealPdfGen.PageSpec(800, 1200,
      Seq(RealPdfGen.Placed(50, 100, 12, Seq(s"page $i"))), compress = i % 2 == 0)))
    val cappedReal = Extractor.extract("u", real, ExtractConfig(maxPdfPages = 10))
    assert(cappedReal.truncated)
    assert(cappedReal.spans.map(_.tagPath).distinct.length == 10)
    assert(!Extractor.extract("u", real).truncated)
  }

  test("paragraph merge joins wrapped lines, keeps separate blocks apart") {
    val text = "word " * 60 // one long paragraph
    val lines = RealPdfGen.wrap(text.trim, 40)
    assert(lines.length > 3)
    val doc = Extractor.extract("u",
      onePage(Seq(RealPdfGen.Placed(50, 100, 12, lines)), compress = true))
    assert(doc.text == text.trim) // lines re-join with single spaces
    assert(doc.nSpans == 1)
  }

  test("hex strings inside TJ arrays decode (the common writer form)") {
    val content =
      "BT /F1 12 Tf 50 1100 Td [<48656C6C6F> -250 <776F726C64>] TJ ET"
        .getBytes(StandardCharsets.ISO_8859_1)
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 800 1200] /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n").getBytes(StandardCharsets.ISO_8859_1) ++
      content ++ "\nendstream\nendobj\n".getBytes(StandardCharsets.ISO_8859_1)
    val doc = Extractor.extract("u", pdf)
    assert(doc.text == "Hello world") // -250 kern gap → word space
    assert(doc.status == "ok")
  }

  test("truncated Flate stream is never a silent full success") {
    val full = onePage(Seq(RealPdfGen.Placed(50, 100, 12,
      Seq("Some paragraph text that compresses to more than a few bytes here."))),
      compress = true)
    // chop INSIDE the compressed stream data (just before its endstream):
    // /Length now overruns the remaining bytes, inflate ends prematurely
    val view = new String(full, StandardCharsets.ISO_8859_1)
    val endstream = view.indexOf("endstream")
    assert(endstream > 0)
    val cut = java.util.Arrays.copyOf(full, endstream - 20)
    val doc = Extractor.extract("u", cut)
    assert(doc.status != "ok", s"status=${doc.status} text=${doc.text}")
  }

  test("partially decodable PDF is flagged pdf_partial, text still emitted") {
    // page 1 decodes (raw stream); page 2 has an unsupported filter
    val c1 = "BT /F1 12 Tf 50 1100 Td (Readable page.) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 800 1200] /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n" +
      "5 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 800 1200] /Contents 6 0 R >>\nendobj\n" +
      "6 0 obj\n<< /Length 4 /Filter /DCTDecode >>\nstream\nABCD\nendstream\nendobj\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    val doc = Extractor.extract("u", pdf)
    assert(doc.status == "pdf_partial", doc.status)
    assert(doc.text == "Readable page.")
  }

  test("fuzz: random bytes after %PDF- never crash, never silently succeed") {
    val rng = new java.util.Random(42)
    for (trial <- 0 until 200) {
      val n = 16 + rng.nextInt(4096)
      val junk = new Array[Byte](n)
      rng.nextBytes(junk)
      val payload = "%PDF-1.4\n".getBytes(StandardCharsets.ISO_8859_1) ++ junk
      val doc = Extractor.extract(s"u$trial", payload)
      // a structurally-random payload has no page tree: must be recorded
      assert(doc.status == "pdf_unparsed" || doc.text.nonEmpty,
        s"trial $trial: empty text with ok status")
    }
    // truncated-at-every-prefix version of a VALID pdf must also never crash
    val valid = onePage(Seq(RealPdfGen.Placed(50, 100, 12, Seq("Some text here."))),
      compress = true)
    for (cut <- 1 until valid.length by 7)
      Extractor.extract("u", java.util.Arrays.copyOf(valid, cut))
  }

  test("fuzz: byte mutations of every builder shape never crash and are deterministic") {
    // structured mutation: flip/zero/insert random bytes into VALID PDFs of
    // all five writer shapes (classic, ObjStm, predicted-ObjStm, ToUnicode,
    // LZW) — the decode paths added this round must degrade to recorded
    // loss, never an exception, and stay pure functions of the bytes
    val pages = Seq(RealPdfGen.PageSpec(800, 1200, Seq(
      RealPdfGen.Placed(50, 100, 12, Seq("Mutation target text block one.", "Wrapped line.")),
      RealPdfGen.Placed(50, 300, 12, Seq("Second block for coverage."))), compress = true))
    val shapes = Seq[Array[Byte]](
      RealPdfGen.build(pages), RealPdfGen.buildObjStm(pages),
      RealPdfGen.buildObjStmPredicted(pages), RealPdfGen.buildToUnicode(pages),
      RealPdfGen.buildLzw(pages),
      RealPdfGen.buildIdentityCidEmbedded(pages, "Recovered cid text."),
      RealPdfGen.buildRotated(pages, 90))
    val rng = new java.util.Random(7L)
    for (shape <- shapes; trial <- 0 until 60) {
      val mutated = shape.clone()
      val nMut = 1 + rng.nextInt(8)
      for (_ <- 0 until nMut) {
        val pos = rng.nextInt(mutated.length)
        rng.nextInt(3) match {
          case 0 => mutated(pos) = rng.nextInt(256).toByte
          case 1 => mutated(pos) = 0
          case _ => mutated(pos) = (mutated(pos) ^ (1 << rng.nextInt(8))).toByte
        }
      }
      val a = Extractor.extract("u", mutated) // must not throw
      val b = Extractor.extract("u", mutated)
      assert(a == b, "extraction of a mutated PDF is not deterministic")
    }
  }

  test("RealPdf.isReal distinguishes the mini format") {
    assert(!RealPdf.isReal("%PDF-GRAFT 1.0\n".getBytes("UTF-8")))
    assert(RealPdf.isReal("%PDF-1.4\n".getBytes("UTF-8")))
    assert(PdfBranch.isPdf("%PDF-1.4\n".getBytes("UTF-8")))
  }

  // ---- r5 review hardening: each case failed before its fix ----

  private def reviewDoc(fontDict: String, contents: String,
                        extraObjs: String): Array[Byte] =
    ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 800 1200] " +
      s"/Contents $contents /Resources << /Font << /F1 $fontDict >> >> >> endobj\n" +
      extraObjs +
      "trailer << /Size 9 /Root 1 0 R >>\n%%EOF")
      .getBytes(StandardCharsets.ISO_8859_1)
  private val helv = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

  test("hex string flush against dict close does not end the dict early") {
    // `<AABB>>>` — pre-fix dictEnd paired the hex '>' with the first dict
    // '>', leaving a stray '>' that shadowed `stream` and lost the text
    val pdf = reviewDoc(helv, "4 0 R",
      "4 0 obj << /ID <AABB>>>\nstream\n" +
        "BT /F1 12 Tf 50 1150 Td (Hex dict survives.) Tj ET\nendstream endobj\n")
    assert(Extractor.extract("u", pdf).text.contains("Hex dict survives."))
  }

  test("indirect-array /Contents (ref to a bare array object) keeps all text") {
    val pdf = reviewDoc(helv, "4 0 R",
      "4 0 obj [5 0 R 6 0 R] endobj\n" +
        "5 0 obj << >> stream\nBT /F1 12 Tf 50 1150 Td (Part one) Tj ET\nendstream endobj\n" +
        "6 0 obj << >> stream\nBT /F1 12 Tf 50 1100 Td (part two.) Tj ET\nendstream endobj\n")
    val t = Extractor.extract("u", pdf).text
    assert(t.contains("Part one") && t.contains("part two."), t)
  }

  test("a 20k-deep /Kids chain parses iteratively (no stack overflow)") {
    val depth = 20000
    val sb = new StringBuilder("%PDF-1.4\n")
    sb ++= "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
    for (i <- 2 until (depth + 2))
      sb ++= s"$i 0 obj << /Type /Pages /Kids [${i + 1} 0 R] /Count 1 >> endobj\n"
    val leaf = depth + 2
    sb ++= s"$leaf 0 obj << /Type /Page /Parent ${leaf - 1} 0 R " +
      s"/MediaBox [0 0 800 1200] /Contents ${leaf + 1} 0 R " +
      s"/Resources << /Font << /F1 $helv >> >> >> endobj\n"
    sb ++= s"${leaf + 1} 0 obj << >> stream\n" +
      "BT /F1 12 Tf 50 1150 Td (Deep but fine.) Tj ET\nendstream endobj\n"
    sb ++= "trailer << /Size 1 /Root 1 0 R >>\n%%EOF"
    val pdf = sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    assert(Extractor.extract("u", pdf).text.contains("Deep but fine."))
  }

  test("TL persists across BT/ET (graphics state, not per-text-object)") {
    // second text object relies on the TL set in the first; pre-fix BT
    // cleared leading, so the `'` advanced zero and both shows collided on
    // one line
    // leading of 200pt: post-fix the `'` drops c2 a full block below c1
    // (own paragraph); pre-fix leading reset to 0 and both collide on one
    // line ("c1 c2" — paragraph lines merge with spaces, so a small
    // leading would be indistinguishable from the collision)
    val pdf = reviewDoc(helv, "4 0 R",
      "4 0 obj << >> stream\n" +
        "BT /F1 12 Tf 200 TL 50 1150 Td (Line a.) Tj ET\n" +
        "BT /F1 12 Tf 50 1100 Td (c1) Tj (c2) ' ET\nendstream endobj\n")
    val lines = Extractor.extract("u", pdf).text.linesIterator.toVector
    assert(lines.exists(_.trim == "c1"), lines)
    assert(lines.exists(_.trim == "c2"), lines)
  }

  test("'EI' bytes inside inline-image data do not resume tokenizing mid-image") {
    val pdf = reviewDoc(helv, "4 0 R",
      "4 0 obj << >> stream\n" +
        "BT /F1 12 Tf 50 1150 Td (Before.) Tj ET\n" +
        "BI /W 2 /H 2 ID ÿþEI (MOJIBAKE) Tj ÿþ EI\n" +
        "BT /F1 12 Tf 50 1100 Td (After.) Tj ET\nendstream endobj\n")
    val t = Extractor.extract("u", pdf).text
    assert(!t.contains("MOJIBAKE"), t)
    assert(t.contains("Before.") && t.contains("After."), t)
  }

  test("overlong integer in /Differences skips the cursor, not the document") {
    val font = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding << /BaseEncoding /WinAnsiEncoding " +
      "/Differences [99999999999 /a] >> >>"
    val pdf = reviewDoc(font, "4 0 R",
      "4 0 obj << >> stream\n" +
        "BT /F1 12 Tf 50 1150 Td (Still parses.) Tj ET\nendstream endobj\n")
    assert(Extractor.extract("u", pdf).text.contains("Still parses."))
  }

  test("PNG predictor row length ceils for sub-byte BitsPerComponent") {
    // predictor 15, Columns 10, bpc 1 → true row = ceil(10/8) = 2 bytes;
    // the floor form computed 1 and rejected (or garbled) the stream
    val content = "BT /F1 12 Tf 50 1150 Td (Predictor ok.) Tj ET \n"
    val plain = content.getBytes(StandardCharsets.ISO_8859_1)
    val padded = if (plain.length % 2 == 0) plain else plain :+ ' '.toByte
    val withFilters = new java.io.ByteArrayOutputStream()
    padded.grouped(2).foreach { row => withFilters.write(0); withFilters.write(row) }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(withFilters.toByteArray); deflater.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) bos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val z = bos.toByteArray
    val head = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 800 1200] " +
      s"/Contents 4 0 R /Resources << /Font << /F1 $helv >> >> >> endobj\n" +
      s"4 0 obj << /Length ${z.length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 15 /Columns 10 /BitsPerComponent 1 >> >> stream\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    val tail = "\nendstream endobj\ntrailer << /Size 5 /Root 1 0 R >>\n%%EOF"
      .getBytes(StandardCharsets.ISO_8859_1)
    val pdf = head ++ z ++ tail
    assert(Extractor.extract("u", pdf).text.contains("Predictor ok."))
  }
}
