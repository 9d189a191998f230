package graft.pdf

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

import graft.extract.TextNormalizer
import graft.pdf.PdfBranch.PBlock

/** Minimal real-PDF text extraction — a from-scratch subset of the public PDF
  * spec (ISO 32000), no native libs:
  *
  *  - linear object scan (`N G obj … endobj`) instead of xref parsing, which
  *    also survives mildly damaged files; xref TABLES and xref STREAMS are
  *    both unnecessary under this design (objects are found, not looked up);
  *  - PDF 1.5+ `/ObjStm` object streams expanded (§7.5.7), so page dicts
  *    compressed into object streams — the modern writer default — parse;
  *  - page tree walk: `/Type /Catalog` → `/Pages` → `/Kids` recursion, page
  *    order = tree order (fallback: `/Type /Page` objects in object order);
  *  - stream filters: raw, `/FlateDecode` (java.util.zip.Inflater) and
  *    `/LZWDecode` (§7.4.4, from scratch), with `/DecodeParms` PNG/TIFF
  *    predictor un-prediction (§7.4.4.4); remaining filters (DCT, CCITT, …
  *    — image codecs with no text inside) are counted as decode failures,
  *    never silently dropped — the caller records `pdf_unparsed` in lineage;
  *  - per-font `/ToUnicode` CMaps (§9.10.3): bfchar/bfrange (increment and
  *    array forms, multi-codepoint destinations), 1- and 2-byte codespaces;
  *    show strings route through the font selected by `Tf`, unmapped codes
  *    keep the Latin-ish fallback;
  *  - simple-font `/Encoding` tables (§9.6.6, Appendix D): WinAnsi, MacRoman
  *    and Standard base encodings plus `/Differences` overlays (see
  *    [[Encodings]]) decode no-ToUnicode fonts; composite (Type0) fonts
  *    without ToUnicode carry raw glyph ids — their shows are dropped and
  *    COUNTED (→ pdf_partial), never emitted as mojibake;
  *  - text operators inside BT/ET: Tj, TJ, ', ", with Td, TD, Tm, TL and
  *    T-star positioning; literal strings with octal/escape handling, hex strings
  *    (UTF-16BE when BOM'd, else Latin-ish byte chars);
  *  - geometric line/paragraph merge: shows on one baseline form a line;
  *    consecutive lines at the same left edge with regular leading form a
  *    paragraph block (the reference's line-joining recovery,
  *    ppstructure/recovery/recovery_to_markdown.py:23-126);
  *  - blocks then flow through the same banded XY-cut reading order and page
  *    concat as the mini format (PdfBranch.orderPage).
  *
  * Reference behavior grafted: per-page explode of check_and_read
  * (ppocr/utils/utility.py:119-152) + layout recovery; our "rasterize+OCR" is
  * replaced by direct content-stream text (the honest JVM-only equivalent).
  *
  * Width caveat (documented, not hidden): without font metrics a show's width
  * is estimated as 0.5em per char, so column classification keys off the left
  * edge (x midpoint), which is exact, rather than trusting the estimate.
  */
object RealPdf {

  final case class Page(pageW: Int, pageH: Int, blocks: Vector[PBlock])

  /** Parse result: pages in document order + whether any content stream
    * failed to decode (drives the pdf_unparsed lineage status) +
    * `unmappedShows` = text-show operators through a composite (CID) font
    * with no /ToUnicode CMap — their 2-byte codes are glyph ids with no
    * byte→text mapping available, so the text is DROPPED (never emitted as
    * mojibake) and the document is flagged pdf_partial. */
  final case class Parsed(pages: Vector[Page], decodeFailures: Int,
                          unmappedShows: Int, pagesTruncated: Boolean,
                          images: Vector[PdfImage] = Vector.empty,
                          rotatedPages: Int = 0)

  /** One embedded image XObject occurrence (ISO 32000 §8.9.5): dictionary
    * metadata + the RAW stream bytes — for /DCTDecode the stream IS a complete
    * JPEG file, so the payload is directly minable with no decode — plus the
    * placement rect when a content-stream `cm … /Name Do` drew it (the unit
    * square through the CTM, ISO 32000 §8.3.2.4; bbox in TOP-DOWN page
    * coordinates like PBlock). `placed` = false means the image sits in
    * /Resources but no parsed content stream drew it (still an embedded
    * payload worth mining — emitted once with a zero rect). */
  final case class PdfImage(page: Int, objNum: Int, name: String,
      width: Int, height: Int, bitsPerComponent: Int, colorSpace: String,
      filter: String, data: Array[Byte],
      x: Double, yTop: Double, drawW: Double, drawH: Double, placed: Boolean)

  private val graftMagic = "%PDF-GRAFT".getBytes(StandardCharsets.US_ASCII)

  /** True for a real PDF payload (vs the %PDF-GRAFT test mini-format). */
  def isReal(b: Array[Byte]): Boolean = {
    if (b == null || b.length < graftMagic.length) return b != null && b.length >= 4
    var i = 0
    while (i < graftMagic.length) {
      if (b(i) != graftMagic(i)) return true
      i += 1
    }
    false
  }

  // ---------------------------------------------------------------- objects

  private final case class PdfObj(num: Int, dict: String, streamRaw: Array[Byte],
                                  offset: Int)

  /** Latin-1 is a 1:1 byte↔char map, so string offsets == byte offsets. */
  private def byteView(payload: Array[Byte]): String =
    new String(payload, StandardCharsets.ISO_8859_1)

  private val objStartPat = java.util.regex.Pattern.compile("""(\d+)\s+\d+\s+obj\b""")

  /** Balanced `<< … >>` scan starting at `from` (must point at '<' of "<<").
    * Returns index just past the closing ">>", or -1. Skips strings. */
  private def dictEnd(s: String, from: Int): Int = {
    var depth = 0
    var i = from
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (c == '>' && i + 1 < n && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return i
      } else if (c == '(') { // literal string — skip with escape awareness
        var d = 1; i += 1
        while (i < n && d > 0) {
          val sc = s.charAt(i)
          if (sc == '\\') i += 1
          else if (sc == '(') d += 1
          else if (sc == ')') d -= 1
          i += 1
        }
      } else if (c == '<') {
        // hex string `<AABB>` (single '<' — the '<<' case matched above):
        // skip to its '>', else `<AABB>>>` pairs the hex close with the
        // first dict '>' and ends the dict one char early — the trailing
        // '>' then shadows a following `stream` keyword and the object's
        // stream is silently lost
        val e = s.indexOf('>', i + 1)
        i = if (e < 0) n else e + 1
      } else i += 1
    }
    -1
  }

  /** Scan all indirect objects SEQUENTIALLY, jumping over each object's
    * stream body before searching for the next `N G obj` — compressed stream
    * bytes can contain anything, including phantom "12 0 obj" sequences, and
    * a flat regex pass over the whole payload would pick those up. Stream
    * data is located via a direct /Length when present, else by searching for
    * "endstream". First definition of an object number wins. */
  private def scanObjects(payload: Array[Byte], s: String): (Map[Int, PdfObj], Int) = {
    val out = scala.collection.mutable.LinkedHashMap.empty[Int, PdfObj]
    val n = s.length
    val m = objStartPat.matcher(s)
    var pos = 0
    while (pos < n && m.find(pos)) {
      // toIntOption (the ObjStm-header idiom): an 11-digit pseudo object
      // number must skip ITS definition only — `.toInt` would throw and the
      // top-level NonFatal catch would void the whole document
      val num = m.group(1).toIntOption.getOrElse(-1)
      var i = m.end
      var next = m.end // resume position for the next object search
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      var dict = ""
      var streamRaw: Array[Byte] = null
      if (i + 1 < n && s.charAt(i) == '<' && s.charAt(i + 1) == '<') {
        val de = dictEnd(s, i)
        if (de > 0) {
          dict = s.substring(i, de)
          var j = de
          next = de
          while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
          if (s.startsWith("stream", j)) {
            var ds = j + 6
            if (ds < n && s.charAt(ds) == '\r') ds += 1
            if (ds < n && s.charAt(ds) == '\n') ds += 1
            val lenDirect = directInt(dict, "Length")
            val end = lenDirect match {
              case Some(len) if len <= n - ds && // subtraction form: no wrap
                s.indexOf("endstream", ds + len) >= 0 => ds + len
              case _ =>
                val e = s.indexOf("endstream", ds)
                if (e < 0) n
                else { // trim the EOL that precedes "endstream"
                  var t = e
                  if (t > ds && s.charAt(t - 1) == '\n') t -= 1
                  if (t > ds && s.charAt(t - 1) == '\r') t -= 1
                  t
                }
            }
            streamRaw = java.util.Arrays.copyOfRange(payload, ds, math.min(end, n))
            val es = s.indexOf("endstream", math.min(end, n))
            next = if (es < 0) n else es + 9
          }
        }
      } else if (i < n) {
        // bare (non-dict) object — `9 0 obj 90 endobj` — capture the short
        // body so indirect scalar values (e.g. /Rotate 9 0 R) can resolve;
        // capped: a bare body longer than 64 chars is nothing we dereference
        // — EXCEPT bare arrays (an indirect `/Contents 4 0 R` targets
        // `[5 0 R 6 0 R …]`, legal per §7.7.3.3), which get a larger but
        // still bounded budget
        val eo = s.indexOf("endobj", i)
        if (eo > i && (eo - i <= 64 || (s.charAt(i) == '[' && eo - i <= 4096)))
          dict = s.substring(i, eo).trim
      }
      if (num >= 0 && !out.contains(num))
        out += num -> PdfObj(num, dict, streamRaw, m.start)
      pos = math.max(next, m.end)
    }
    val objStmFailures = expandObjectStreams(out)
    (out.toMap, objStmFailures)
  }

  /** PDF 1.5+ object streams (ISO 32000 §7.5.7): a `/Type /ObjStm` stream
    * holds N compressed non-stream objects, prefixed by N (objnum, offset)
    * integer pairs; offsets are relative to /First. Page dicts routinely live
    * here, so without this pass a PDF 1.5 file parses as "no pages". The
    * linear object scan makes xref streams unnecessary — ObjStm containers
    * are FOUND by the scan itself and only their contents need expanding.
    * Direct definitions win over ObjStm-contained ones (first-wins, matching
    * the scan's own rule). */
  private def expandObjectStreams(
      out: scala.collection.mutable.LinkedHashMap[Int, PdfObj]): Int = {
    var failures = 0
    val stms = out.values.filter(o => hasName(o.dict, "Type", "ObjStm")).toVector
    for (stm <- stms) {
      val dec = decodeStream(stm)
      if (dec.failed) failures += 1 // a lost container loses its objects — flag it
      if (!dec.failed && dec.data.nonEmpty) {
        val s = byteView(dec.data)
        val nObjs = directInt(stm.dict, "N").getOrElse(0)
        val first = directInt(stm.dict, "First").getOrElse(0)
        // header: N pairs of integers "objnum offset"
        val pm = pat(raw"\d+").matcher(s.substring(0, math.min(first, s.length)))
        val header = Vector.newBuilder[Int]
        while (pm.find()) header += pm.group.toIntOption.getOrElse(-1)
        // an overflowed header integer (-1 sentinel) skips ITS pair only — it
        // must not become a phantom object number or a mis-aligned offset
        val pairs = header.result().grouped(2).collect {
          case Vector(a, b) if a >= 0 && b >= 0 => (a, b)
        }.take(nObjs).toVector
        for ((num, off) <- pairs if !out.contains(num)) {
          // parse from first+off against the FULL decoded body: ISO 32000 does
          // not require in-stream offsets to be ascending, so bounding by the
          // next header pair's offset would truncate a legal out-of-order
          // ObjStm mid-dict. dictEnd is balanced, so over-scanning is safe.
          val start = first + off
          if (start >= 0 && start < s.length) {
            // contained objects are dicts/arrays/primitives — never streams.
            // Only a dict WHOSE OWN first token is "<<" belongs to this object;
            // a free search would run into the NEXT object's dict when this
            // one is a primitive.
            var t = start
            while (t < s.length && Character.isWhitespace(s.charAt(t))) t += 1
            val dict =
              if (t + 1 < s.length && s.charAt(t) == '<' && s.charAt(t + 1) == '<') {
                val de = dictEnd(s, t); if (de > 0) s.substring(t, de) else ""
              } else {
                // primitive body: capture the first token (bounded) so
                // indirect scalars (/Rotate N 0 R etc.) resolve — the same
                // bare-body rule as the top-level scan
                var e = t
                while (e < s.length && e - t < 64 &&
                  !Character.isWhitespace(s.charAt(e))) e += 1
                s.substring(t, e)
              }
            out += num -> PdfObj(num, dict, null, stm.offset)
          }
        }
      }
    }
    failures
  }

  // ------------------------------------------------------------ dict access

  // dict keys come from a tiny fixed set, but the patterns embed the key —
  // cache compiled patterns per key (compiling per call was 30% of PDF parse)
  private val patCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private def pat(p: String): java.util.regex.Pattern =
    patCache.computeIfAbsent(p, java.util.regex.Pattern.compile(_))

  private def firstGroup(p: String, dict: String): Option[String] = {
    val m = pat(p).matcher(dict)
    if (m.find()) Some(m.group(1)) else None
  }

  private def directInt(dict: String, key: String): Option[Int] =
    // (?!\d) stops backtracking from shrinking the match: without it,
    // `/Length 900 0 R` fails the indirect-ref lookahead at "900", then
    // re-matches "90" (next char '0' is not whitespace, so the lookahead
    // passes) and misreads the object number's prefix as a literal value
    firstGroup(raw"/$key\s+(\d+)(?!\d)(?!\s+\d+\s+R)", dict).flatMap(_.toIntOption)

  private def ref(dict: String, key: String): Option[Int] =
    firstGroup(raw"/$key\s+(\d+)\s+\d+\s+R", dict).flatMap(_.toIntOption)

  /** `/Key [a 0 R b 0 R …]` or the single-ref form. */
  private def refArray(dict: String, key: String): Vector[Int] =
    firstGroup(raw"/$key\s*\[([^\]]*)\]", dict) match {
      case Some(body) =>
        val m = pat(raw"(\d+)\s+\d+\s+R").matcher(body)
        val out = Vector.newBuilder[Int]
        while (m.find()) m.group(1).toIntOption.foreach(out += _)
        out.result()
      case None => ref(dict, key).toVector
    }

  private def hasName(dict: String, key: String, value: String): Boolean =
    pat(raw"/$key\s*/$value\b").matcher(dict).find()

  /** MediaBox [x0 y0 x1 y1] — numbers may be reals. */
  private def mediaBox(dict: String): Option[(Double, Double)] = {
    val m = pat(raw"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]")
      .matcher(dict)
    if (!m.find()) None
    else
      try Some((m.group(3).toDouble - m.group(1).toDouble,
        m.group(4).toDouble - m.group(2).toDouble))
      catch { case _: NumberFormatException => None }
  }

  // ------------------------------------------------------------- page tree

  /** Pages in document order: catalog→Pages→Kids walk; fallback to /Type /Page
    * objects in object-number order when no catalog resolves. */
  private def pageObjects(objs: Map[Int, PdfObj]): Vector[PdfObj] = {
    val viaTree: Vector[PdfObj] = {
      val catalog = objs.values.find(o => hasName(o.dict, "Type", "Catalog"))
      catalog.flatMap(c => ref(c.dict, "Pages")).map { rootNum =>
        val out = Vector.newBuilder[PdfObj]
        val seen = scala.collection.mutable.Set.empty[Int] // cycle guard
        // explicit-stack DFS (preorder, kids pushed reversed = document
        // order): a crafted 50k-deep /Kids chain in a KB-sized file would
        // StackOverflowError a recursive walk — an Error no NonFatal catch
        // contains, killing the task instead of degrading to pdf_unparsed
        val stack = scala.collection.mutable.ArrayDeque(rootNum)
        while (stack.nonEmpty) {
          val num = stack.removeHead()
          if (seen.add(num)) objs.get(num).foreach { o =>
            if (hasName(o.dict, "Type", "Pages"))
              refArray(o.dict, "Kids").reverseIterator.foreach(stack.prepend)
            else if (hasName(o.dict, "Type", "Page")) out += o
          }
        }
        out.result()
      }.getOrElse(Vector.empty)
    }
    if (viaTree.nonEmpty) viaTree
    else objs.values.filter(o => hasName(o.dict, "Type", "Page")).toVector.sortBy(_.num)
  }

  /** First defined value along the page→/Parent chain, ≤32 hops (cycle
    * cap) — the §7.7.3.4 inheritable-attribute walk shared by MediaBox /
    * Rotate / Resources (one loop, not three copies to keep in sync). */
  private def inherited[A](page: PdfObj, objs: Map[Int, PdfObj])
                          (read: String => Option[A]): Option[A] = {
    var cur: Option[PdfObj] = Some(page)
    var hops = 0
    while (cur.isDefined && hops < 32) {
      read(cur.get.dict) match {
        case some @ Some(_) => return some
        case None => cur = ref(cur.get.dict, "Parent").flatMap(objs.get); hops += 1
      }
    }
    None
  }

  /** MediaBox with /Parent inheritance (default US-Letter 612×792). */
  private def pageBox(page: PdfObj, objs: Map[Int, PdfObj]): (Double, Double) =
    inherited(page, objs)(mediaBox).getOrElse((612.0, 792.0))

  /** /Rotate with /Parent inheritance (ISO 32000 §7.7.3.3) — the viewer's
    * clockwise display rotation in degrees, normalized to {0, 90, 180, 270};
    * anything malformed or non-multiple-of-90 reads as 0 (the spec default).
    * The reference normalizes page orientation before layout analysis
    * (ppstructure/predict_system.py:112-125); here the analog is rotating
    * extracted geometry into upright coordinates before the XY-cut. */
  private def pageRotate(page: PdfObj, objs: Map[Int, PdfObj]): Int = {
    def norm(v: String): Int =
      v.toIntOption.map(r => ((r % 360) + 360) % 360).filter(_ % 90 == 0).getOrElse(0)
    // the (?!…R) lookahead keeps an indirect `/Rotate n 0 R` from being
    // misread as a literal n-degree rotation, and (?!\d) keeps regex
    // backtracking from matching a prefix of the object number (same
    // guards as directInt); the indirect form resolves through the
    // target object's body, which must BE a bare integer — a dangling ref
    // or object-number reuse pointing at a dict (`<< /Kids [90 0 R] >>`)
    // must not surrender its first embedded integer as a rotation (a
    // conforming viewer treats such a page as unrotated, spec default 0)
    inherited(page, objs) { dict =>
      firstGroup(raw"/Rotate\s+(-?\d+)(?!\d)(?!\s+\d+\s+R)", dict).map(norm)
        .orElse(ref(dict, "Rotate").map(num =>
          norm(objs.get(num)
            .flatMap(o => firstGroup(raw"\A\s*(-?\d+)\s*\z", o.dict))
            .getOrElse("0"))))
    }.getOrElse(0)
  }

  // ---------------------------------------------------------------- streams

  /** One decoded content stream: `data` may be empty (genuinely empty stream)
    * or partial (truncated zlib input); `failed` marks any decode loss —
    * unsupported filter, corrupt Flate, or premature end — so the caller can
    * surface pdf_partial/pdf_unparsed (decode loss is never silent). */
  private[graft] final case class Decoded(data: Array[Byte], failed: Boolean)

  private def decodeStream(o: PdfObj): Decoded = {
    val raw = o.streamRaw
    if (raw == null) return Decoded(Array.emptyByteArray, failed = false)
    val hasFilter = o.dict.contains("/Filter")
    if (!hasFilter) return Decoded(raw, failed = false)
    val base =
      if (o.dict.contains("/FlateDecode")) inflateStream(raw)
      else if (o.dict.contains("/LZWDecode"))
        lzwDecode(raw, directInt(o.dict, "EarlyChange").getOrElse(1))
      else return Decoded(Array.emptyByteArray, failed = true) // unsupported (DCT, …)
    // /DecodeParms PNG/TIFF predictors (§7.4.4.4) — routine on ObjStm/XRef
    directInt(o.dict, "Predictor") match {
      case Some(pred) if pred >= 2 && !base.failed =>
        applyPredictor(base.data, pred,
          directInt(o.dict, "Columns").getOrElse(1),
          directInt(o.dict, "Colors").getOrElse(1),
          directInt(o.dict, "BitsPerComponent").getOrElse(8)) match {
          case Some(d) => Decoded(d, failed = false)
          case None => Decoded(Array.emptyByteArray, failed = true)
        }
      case _ => base
    }
  }

  /** Decompression bomb ceiling per stream (the MaxDecodePixels discipline):
    * deflate expands up to 1032:1 and crafted LZW ~3600:1, so a KB-sized
    * stream can demand GBs — an allocation no catch contains (the 2 GiB
    * array limit surfaces as OutOfMemoryError, an Error). 128 MiB is far
    * beyond any real content stream; exceeding it keeps the prefix and
    * FLAGS the loss, the truncated-stream discipline. */
  private val MaxDecodedStream = 1 << 27

  private def inflateStream(raw: Array[Byte]): Decoded = {
    val inf = new Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(64L, raw.length.toLong * 4), 1L << 16).toInt)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsDictionary()) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput())
          // truncated zlib stream: keep the partial text but FLAG the loss
          return Decoded(out.toByteArray, failed = true)
        out.write(buf, 0, k)
        if (out.size() > MaxDecodedStream) // bomb ceiling: prefix + flag
          return Decoded(out.toByteArray, failed = true)
      }
      Decoded(out.toByteArray, failed = inf.needsDictionary())
    } catch {
      case _: java.util.zip.DataFormatException =>
        Decoded(Array.emptyByteArray, failed = true)
    } finally inf.end()
  }

  /** LZWDecode (ISO 32000 §7.4.4, the TIFF LZW variant): 9→12-bit codes,
    * clear = 256, EOD = 257, code width grows `earlyChange` codes early
    * (default 1). End-of-input without EOD recovers all data (success);
    * a code beyond the table or a mid-code truncation keeps the partial
    * output and FLAGS the loss. */
  private[graft] def lzwDecode(in: Array[Byte], earlyChange: Int): Decoded = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, in.length * 3))
    val MAX = 4096
    val prefix = new Array[Int](MAX)
    val suffix = new Array[Byte](MAX)
    val scratch = new Array[Byte](MAX)
    var next = 258
    var codeBits = 9
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    def firstByteOf(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      c.toByte
    }
    def emit(code: Int): Unit = {
      var depth = 0
      var c = code
      while (c >= 258) { scratch(depth) = suffix(c); depth += 1; c = prefix(c) }
      out.write(c)
      var k = depth - 1
      while (k >= 0) { out.write(scratch(k)); k -= 1 }
    }
    var i = 0
    while (true) {
      if (out.size() > MaxDecodedStream) // bomb ceiling: prefix + flag
        return Decoded(out.toByteArray, failed = true)
      while (bitCnt < codeBits && i < in.length) {
        bitBuf = (bitBuf << 8) | (in(i) & 0xff); bitCnt += 8; i += 1
      }
      if (bitCnt < codeBits) // clean end without EOD: data fully recovered
        return Decoded(out.toByteArray, failed = false)
      val code = ((bitBuf >>> (bitCnt - codeBits)) & ((1L << codeBits) - 1)).toInt
      bitCnt -= codeBits
      if (code == 256) { next = 258; codeBits = 9; prev = -1 }
      else if (code == 257) return Decoded(out.toByteArray, failed = false)
      else if (prev < 0) {
        if (code > 255) return Decoded(out.toByteArray, failed = true)
        emit(code)
        prev = code
      } else {
        if (code < next && code != 256 && code != 257) {
          if (next < MAX) {
            prefix(next) = prev; suffix(next) = firstByteOf(code); next += 1
          }
          emit(code)
        } else if (code == next) { // KwKwK
          if (next < MAX) {
            prefix(next) = prev; suffix(next) = firstByteOf(prev); next += 1
            emit(code)
          } else return Decoded(out.toByteArray, failed = true)
        } else return Decoded(out.toByteArray, failed = true)
        prev = code
      }
      if (prev >= 0 && next + earlyChange >= (1 << codeBits) && codeBits < 12)
        codeBits += 1
    }
    Decoded(out.toByteArray, failed = true) // unreachable
  }

  /** PNG (predictor ≥ 10: per-row filter byte, Sub/Up/Average/Paeth) and
    * TIFF horizontal (predictor 2) un-prediction. Returns None on a geometry
    * mismatch (truncated rows) — the caller flags the loss. */
  private def applyPredictor(data: Array[Byte], predictor: Int, columns: Int,
                             colors: Int, bpc: Int): Option[Array[Byte]] = {
    val bpp = math.max(1, colors * bpc / 8) // PNG bpp: bytes/pixel, min 1
    // row length CEILS to whole bytes (PNG scanlines are byte-padded): the
    // floor form mis-sized sub-byte-bpc rows (/BitsPerComponent 1, Columns
    // 10 → 2 bytes, not 1) and wrongly flagged valid streams as failed
    val rowLen = math.max(1, (columns * colors * bpc + 7) / 8)
    if (predictor == 2) { // TIFF: add left neighbour (8-bit components only)
      if (bpc != 8) return None
      val out = data.clone()
      var r = 0
      while (r < out.length) {
        val end = math.min(r + rowLen, out.length)
        var k = r + bpp
        while (k < end) { out(k) = (out(k) + out(k - bpp)).toByte; k += 1 }
        r += rowLen
      }
      return Some(out)
    }
    if (data.length % (rowLen + 1) != 0) return None
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    val prevRow = new Array[Byte](rowLen)
    var r = 0
    while (r < nRows) {
      val src = r * (rowLen + 1)
      val filter = data(src) & 0xff
      val dst = r * rowLen
      var k = 0
      while (k < rowLen) {
        val x = data(src + 1 + k) & 0xff
        val a = if (k >= bpp) out(dst + k - bpp) & 0xff else 0 // left
        val b = prevRow(k) & 0xff // up
        val c = if (k >= bpp) prevRow(k - bpp) & 0xff else 0 // up-left
        val v = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) / 2)
          case 4 => // Paeth
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        out(dst + k) = v.toByte
        k += 1
      }
      System.arraycopy(out, dst, prevRow, 0, rowLen)
      r += 1
    }
    Some(out)
  }

  // ------------------------------------------------------------ /ToUnicode

  /** A font's code→Unicode map from its /ToUnicode CMap (ISO 32000 §9.10.3):
    * `codeBytes` = code width in bytes (from the codespace range, else
    * inferred from the widest bfchar/bfrange key), `map` = code → replacement
    * (possibly multi-char — ligature splits like fi → "fi" are routine in
    * subset-embedded fonts). */
  private[graft] final case class ToUnicode(codeBytes: Int, map: Map[Int, String])

  /** Per-font byte→text decoder, resolved once per font object:
    *  - [[CMapDec]]: the font has a /ToUnicode CMap (§9.10.3) — authoritative.
    *  - [[TableDec]]: a simple font with `/Encoding /WinAnsiEncoding` (or
    *    MacRoman/Standard, or an /Encoding dict with /Differences) — codes
    *    route through the 256-entry table (ISO 32000-1 Appendix D, see
    *    [[Encodings]]); null slots keep the Latin-ish fallback char.
    *  - [[CidCmapDec]]: a composite (Type0, Identity-H) font WITHOUT
    *    /ToUnicode whose embedded font program (/FontFile2) carries a
    *    parsable Unicode cmap — glyph ids reverse through it to text
    *    ([[TrueTypeCmap]]); gids absent from the cmap are dropped + counted.
    *  - [[CidNoMapDec]]: a composite (Type0) font with NEITHER /ToUnicode
    *    nor a usable embedded cmap — show bytes are 2-byte glyph ids with no
    *    recoverable text; shows are dropped and counted (→ pdf_partial),
    *    never emitted as mojibake.
    * A font with none of the above gets no entry (Latin-ish fallback, the
    * pre-existing behavior). */
  private[graft] sealed trait FontDec
  private[graft] final case class CMapDec(tu: ToUnicode) extends FontDec
  private[graft] final case class TableDec(table: Array[String]) extends FontDec
  private[graft] final case class CidCmapDec(rev: Map[Int, String]) extends FontDec
  private[graft] case object CidNoMapDec extends FontDec

  // (?s): CMap sections span lines
  private val bfCharPat = pat("(?s)beginbfchar(.*?)endbfchar")
  private val bfRangePat = pat("(?s)beginbfrange(.*?)endbfrange")
  private val codeSpacePat = pat(raw"begincodespacerange\s*<([0-9A-Fa-f]+)>")

  /** Bounded hex→int for CMap code keys: −1 for anything longer than 6
    * digits (codespaces are at most 2 bytes here; an absurd key like
    * <FFFFFFFFFFFFFFFF> must skip the ENTRY, not throw out of parse() and
    * downgrade the whole document to pdf_unparsed). */
  private def hexToInt(h: String): Int =
    if (h.isEmpty || h.length > 6) -1 else java.lang.Long.parseLong(h, 16).toInt

  /** UTF-16BE hex body → String (the bfchar/bfrange destination form).
    * Short bodies LEFT-pad to a unit boundary: sloppy real-world CMaps write
    * <41> meaning U+0041 — right-padding would turn it into U+4100. */
  private def hexToUtf16(h: String): String = {
    val padded = if (h.length % 4 == 0) h else "0" * (4 - h.length % 4) + h
    val bytes = new Array[Byte](padded.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = ((Character.digit(padded.charAt(2 * i), 16) << 4) |
        Character.digit(padded.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    new String(bytes, StandardCharsets.UTF_16BE)
  }

  /** Parse one /ToUnicode CMap stream (text form): codespace width,
    * bfchar pairs, bfrange runs (increment and array destination forms).
    * Range materialization is capped at 64k codes (the single-codespace
    * maximum) so a corrupt range cannot balloon memory. */
  private[graft] def parseToUnicode(data: Array[Byte]): Option[ToUnicode] = {
    if (data == null || data.isEmpty) return None
    val s = byteView(data)
    val m = scala.collection.mutable.HashMap.empty[Int, String]
    var keyHexLen = 0

    val cm = bfCharPat.matcher(s)
    while (cm.find()) {
      val body = cm.group(1)
      val tm = pat(raw"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>").matcher(body)
      while (tm.find()) {
        val key = hexToInt(tm.group(1))
        if (key >= 0) {
          keyHexLen = math.max(keyHexLen, tm.group(1).length)
          m += key -> hexToUtf16(tm.group(2))
        }
      }
    }
    val rm = bfRangePat.matcher(s)
    while (rm.find()) {
      val body = rm.group(1)
      // <lo> <hi> then either <dstStart> or [<dst1> <dst2> …]
      val tm = pat(raw"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[(?:\s*<[0-9A-Fa-f]+>)+\s*\])")
        .matcher(body)
      while (tm.find()) {
        val lo = hexToInt(tm.group(1))
        val hi0 = hexToInt(tm.group(2)) // −1 = absurd key: skip the range
        val hi = math.min(hi0, lo + 0xFFFF)
        val dst = tm.group(3)
        if (lo >= 0 && hi0 >= 0) {
          keyHexLen = math.max(keyHexLen, tm.group(1).length)
          if (dst.startsWith("[")) {
            val dm = pat(raw"<([0-9A-Fa-f]+)>").matcher(dst)
            var code = lo
            while (dm.find() && code <= hi) {
              m += code -> hexToUtf16(dm.group(1))
              code += 1
            }
          } else {
            val d0 = dst.substring(1, dst.length - 1)
            // increment form: the LAST UTF-16 unit increments per code (§9.10.3)
            val base = hexToUtf16(d0)
            var code = lo
            while (code <= hi) {
              val delta = code - lo
              val repl =
                if (base.isEmpty) ""
                else base.substring(0, base.length - 1) +
                  (base.charAt(base.length - 1) + delta).toChar
              m += code -> repl
              code += 1
            }
          }
        }
      }
    }
    if (m.isEmpty) return None
    val csm = codeSpacePat.matcher(s)
    val codeBytes =
      if (csm.find()) math.max(1, csm.group(1).length / 2)
      else math.max(1, (keyHexLen + 1) / 2)
    Some(ToUnicode(codeBytes, m.toMap))
  }

  /** Map a byte-char show string (Latin-1 view: char code == byte) through a
    * font's ToUnicode CMap; unmapped codes keep the Latin-ish fallback char.
    * With a 2-byte codespace, a lone trailing byte is NOT looked up as a
    * 1-byte code (a stray final 0x41 must not hit a mapping keyed <0041>) —
    * it keeps the fallback char directly. */
  private def applyToUnicode(raw: String, tu: ToUnicode): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    val n = raw.length
    while (i < n) {
      if (tu.codeBytes == 2 && i + 1 >= n) { // truncated final code: fallback only
        sb.append(raw.charAt(i))
        i += 1
      } else {
        val code =
          if (tu.codeBytes == 2) (raw.charAt(i) << 8) | raw.charAt(i + 1)
          else raw.charAt(i).toInt
        val step = if (tu.codeBytes == 2) 2 else 1
        tu.map.get(code) match {
          case Some(repl) => sb.append(repl)
          case None => if (step == 2) sb.append(raw, i, i + 2) else sb.append(raw.charAt(i))
        }
        i += step
      }
    }
    sb.toString
  }

  // ------------------------------------------------- content stream → text

  private[graft] final case class Chunk(x: Double, y: Double, size: Double, text: String)

  /** Parse a literal string starting at `i0` (s(i0) == '('): returns the
    * decoded text and the index just past the closing ')'. Handles nesting,
    * the standard escapes, octal escapes, and line continuations. */
  private def parseLiteral(s: String, i0: Int): (String, Int) = {
    val n = s.length
    val sb = new java.lang.StringBuilder()
    var depth = 1
    var i = i0 + 1
    while (i < n && depth > 0) {
      val sc = s.charAt(i)
      if (sc == '\\' && i + 1 < n) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\r' => i += 2; if (i < n && s.charAt(i) == '\n') i += 1 // line continuation
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' => // octal, up to 3 digits
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
              v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
            }
            sb.append((v & 0xff).toChar)
          case other => sb.append(other); i += 2
        }
      } else {
        if (sc == '(') depth += 1
        else if (sc == ')') { depth -= 1; if (depth == 0) { i += 1 } }
        if (depth > 0) { sb.append(sc); i += 1 }
      }
    }
    (sb.toString, i)
  }

  /** Parse a hex string starting at `i0` (s(i0) == '<', not "<<"): returns
    * (decoded text or null if malformed, index past the closing '>', and
    * whether the bytes were BOM'd UTF-16BE — already Unicode, so the
    * /ToUnicode map must NOT apply). Non-BOM bytes decode as Latin-ish byte
    * chars (char code == byte), the representation applyToUnicode expects. */
  private def parseHex(s: String, i0: Int): (String, Int, Boolean) = {
    val n = s.length
    val e = s.indexOf('>', i0 + 1)
    val body = if (e < 0) s.substring(i0 + 1) else s.substring(i0 + 1, e)
    val next = if (e < 0) n else e + 1
    val hex = body.filterNot(Character.isWhitespace)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val bytes = new Array[Byte](padded.length / 2)
    var k = 0
    while (k < bytes.length) {
      val hi = Character.digit(padded.charAt(2 * k), 16)
      val lo = Character.digit(padded.charAt(2 * k + 1), 16)
      if (hi < 0 || lo < 0) return (null, next, false)
      bytes(k) = ((hi << 4) | lo).toByte
      k += 1
    }
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      (new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE), next, true)
    else (new String(bytes, StandardCharsets.ISO_8859_1), next, false)
  }

  /** Tokenize a content stream and emit one Chunk per text-showing operator,
    * positioned by the (subset) text state machine. `fonts` carries each
    * resource font's byte→text decoder ([[FontDec]]); `Tf` switches the
    * active decoder and show strings route through it (a font without an
    * entry keeps the Latin-ish fallback — exactly the old behavior). Returns
    * the chunks plus the count of shows dropped through a CID font with no
    * /ToUnicode (the pdf_partial signal). */
  /** An XObject drawn by the content stream: `name` (the /Resources /XObject
    * key) + the bbox of the unit square through the CTM at the `Do` operator,
    * in PDF (bottom-up) coordinates. */
  private[graft] final case class ImagePlace(name: String, x0: Double, y0: Double,
                                             x1: Double, y1: Double)

  private[graft] final case class ChunkScan(chunks: Vector[Chunk], unmapped: Int,
                                            places: Vector[ImagePlace])

  private[graft] def extractChunks(data: Array[Byte],
                                   fonts: Map[String, FontDec] = Map.empty): ChunkScan = {
    val s = byteView(data)
    val n = s.length
    val out = Vector.newBuilder[Chunk]
    // operand stack (only the tail matters per operator)
    val nums = scala.collection.mutable.ArrayBuffer.empty[Double]
    val strs = scala.collection.mutable.ArrayBuffer.empty[String]
    var fontSize = 12.0
    var leading = 0.0
    var lineX = 0.0; var lineY = 0.0 // text line matrix origin (tx, ty)
    var inText = false
    var lastName: String = "" // most recent /name operand (the Tf font operand)
    var curDec: FontDec = null
    var unmapped = 0
    // graphics state: CTM as (a b c d e f) with q/Q save/restore — tracked so
    // `Do` can place image XObjects (x' = a·u + c·v + e, y' = b·u + d·v + f)
    var ctm = Array(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    val gsStack = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val places = Vector.newBuilder[ImagePlace]

    def clear(): Unit = { nums.clear(); strs.clear() }
    // mapping happens at operand-PUSH time: operands cannot outlive their
    // operator (every op clears the stack), so the font at push == the font
    // at show; and TJ kern spaces are inserted into already-mapped text,
    // which keeps 2-byte code alignment intact
    def mapStr(t: String): String = curDec match {
      case null => t
      case CMapDec(tu) => applyToUnicode(t, tu)
      case TableDec(tab) =>
        val sb = new java.lang.StringBuilder(t.length)
        var k = 0
        while (k < t.length) {
          val c = t.charAt(k)
          val repl = if (c < 256) tab(c) else null
          if (repl != null) sb.append(repl) else sb.append(c)
          k += 1
        }
        sb.toString
      case CidCmapDec(rev) =>
        // 2-byte glyph ids reversed through the embedded font cmap; a gid
        // the cmap doesn't cover drops (+flag), never mojibake
        val sb = new java.lang.StringBuilder(t.length / 2)
        var dropped = false
        var k = 0
        while (k + 1 < t.length) {
          val code = (t.charAt(k) << 8) | (t.charAt(k + 1) & 0xff)
          rev.get(code) match {
            case Some(txt) => sb.append(txt)
            case None => dropped = true
          }
          k += 2
        }
        if (k < t.length) dropped = true // odd trailing byte: malformed show
        if (dropped) unmapped += 1
        sb.toString
      case CidNoMapDec => // glyph ids, no mapping: drop + flag, never mojibake
        if (t.nonEmpty) unmapped += 1
        ""
    }
    def show(text: String): Unit =
      if (inText && text.nonEmpty) out += Chunk(lineX, lineY, fontSize, text)

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%') { // comment to EOL
        while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (c == '(') { // literal string
        val (text, ni) = parseLiteral(s, i)
        i = ni
        strs += mapStr(text)
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') { // hex string
        val (str, ni, wasUnicode) = parseHex(s, i)
        i = ni
        if (str != null) strs += (if (wasUnicode) str else mapStr(str))
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '<') { // inline dict (e.g. BDC)
        val de = dictEnd(s, i); i = if (de < 0) n else de
      } else if (c == '[') { // array of strings/kerns → TJ operand (kern < -100 ⇒ space)
        val sb = new java.lang.StringBuilder()
        i += 1
        var pendingKernSpace = false
        var depthGuard = 0
        while (i < n && s.charAt(i) != ']' && depthGuard < 1000000) {
          depthGuard += 1
          val ac = s.charAt(i)
          if (ac == '(') {
            val (text, ni) = parseLiteral(s, i)
            i = ni
            if (pendingKernSpace && sb.length() > 0) sb.append(' ')
            pendingKernSpace = false
            sb.append(mapStr(text))
          } else if (ac == '<') {
            // hex strings inside TJ arrays — the standard form most PDF
            // writers emit ([<0041> -250 <0042>] TJ)
            val (text, ni, wasUnicode) = parseHex(s, i)
            i = ni
            if (text != null) {
              if (pendingKernSpace && sb.length() > 0) sb.append(' ')
              pendingKernSpace = false
              sb.append(if (wasUnicode) text else mapStr(text))
            }
          } else if (ac == '-' || ac == '+' || ac == '.' || (ac >= '0' && ac <= '9')) {
            val ns = i
            i += 1
            while (i < n && { val d = s.charAt(i); d == '.' || (d >= '0' && d <= '9') }) i += 1
            try { if (s.substring(ns, i).toDouble < -100.0) pendingKernSpace = true }
            catch { case _: NumberFormatException => () }
          } else i += 1
        }
        if (i < n) i += 1 // ']'
        strs += sb.toString
      } else if (c == '/') { // name — remember it (Tf's font operand)
        val ns = i + 1
        i += 1
        while (i < n && !isDelim(s.charAt(i))) i += 1
        lastName = s.substring(ns, i)
      } else if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        val ns = i
        i += 1
        while (i < n && { val d = s.charAt(i); d == '.' || (d >= '0' && d <= '9') }) i += 1
        try nums += s.substring(ns, i).toDouble
        catch { case _: NumberFormatException => () }
      } else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '\'' || c == '"' || c == '*') {
        val os = i
        i += 1
        while (i < n && !isDelim(s.charAt(i))) i += 1
        val op = s.substring(os, i)
        op match {
          // §9.4.1: BT resets the text matrices only — TL (leading) is TEXT
          // STATE that persists across BT/ET like fontSize/curDec do; a
          // `12 TL` in one text object governs `'`/`T*` in the next
          case "BT" => inText = true; lineX = 0; lineY = 0
          case "ET" => inText = false
          case "Tf" =>
            if (nums.nonEmpty) fontSize = nums.last
            curDec = fonts.getOrElse(lastName, null)
          case "TL" => if (nums.nonEmpty) leading = nums.last
          case "Td" => if (nums.length >= 2) { lineX += nums(nums.length - 2); lineY += nums.last }
          case "TD" => if (nums.length >= 2) {
            leading = -nums.last; lineX += nums(nums.length - 2); lineY += nums.last
          }
          case "Tm" => if (nums.length >= 6) { lineX = nums(nums.length - 2); lineY = nums.last }
          case "T*" => lineY -= leading
          case "Tj" => if (strs.nonEmpty) show(strs.last)
          case "TJ" => if (strs.nonEmpty) show(strs.last)
          case "'" => lineY -= leading; if (strs.nonEmpty) show(strs.last)
          case "\"" => lineY -= leading; if (strs.nonEmpty) show(strs.last)
          case "BI" => // inline image: skip to EI AS A STANDALONE TOKEN —
            // the raw pixel bytes after ID can contain the pair 'EI', and
            // resuming mid-image tokenizes binary garbage (phantom '('
            // opens a string, stray letters form operators → mojibake)
            var e = s.indexOf("EI", i)
            while (e > 0 && !(Character.isWhitespace(s.charAt(e - 1)) &&
                (e + 2 >= n || isDelim(s.charAt(e + 2)) ||
                  Character.isWhitespace(s.charAt(e + 2)))))
              e = s.indexOf("EI", e + 1)
            i = if (e < 0) n else e + 2
          case "q" => gsStack += ctm.clone()
          case "Q" => if (gsStack.nonEmpty) ctm = gsStack.remove(gsStack.length - 1)
          case "cm" => if (nums.length >= 6) {
            // CTM' = M_cm × CTM (ISO 32000 §8.3.4, row-vector convention)
            val o = nums.length - 6
            val (ma, mb, mc, md, me, mf) =
              (nums(o), nums(o + 1), nums(o + 2), nums(o + 3), nums(o + 4), nums(o + 5))
            ctm = Array(
              ma * ctm(0) + mb * ctm(2), ma * ctm(1) + mb * ctm(3),
              mc * ctm(0) + md * ctm(2), mc * ctm(1) + md * ctm(3),
              me * ctm(0) + mf * ctm(2) + ctm(4), me * ctm(1) + mf * ctm(3) + ctm(5))
          }
          case "Do" => if (lastName.nonEmpty) {
            // image XObjects paint the unit square through the CTM — record
            // its bbox (handles rotated/flipped placements); form XObjects
            // recorded too and filtered at parse time by /Subtype /Image
            var xMin = Double.MaxValue; var xMax = Double.MinValue
            var yMin = Double.MaxValue; var yMax = Double.MinValue
            var ci = 0
            while (ci < 4) {
              val u = ci & 1; val v = ci >> 1
              val px = ctm(0) * u + ctm(2) * v + ctm(4)
              val py = ctm(1) * u + ctm(3) * v + ctm(5)
              if (px < xMin) xMin = px; if (px > xMax) xMax = px
              if (py < yMin) yMin = py; if (py > yMax) yMax = py
              ci += 1
            }
            places += ImagePlace(lastName, xMin, yMin, xMax, yMax)
          }
          case _ => ()
        }
        clear()
      } else i += 1
    }
    ChunkScan(out.result(), unmapped, places.result())
  }

  @inline private def isDelim(c: Char): Boolean =
    Character.isWhitespace(c) || c == '(' || c == ')' || c == '<' || c == '>' ||
      c == '[' || c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  // --------------------------------------------- chunks → lines → blocks

  /** Group chunks into baselines, baselines into paragraph blocks, and map to
    * the top-down PBlock space that orderPage expects.
    *
    * Line rule: consecutive chunks on the same baseline (equal y) concatenate.
    * Paragraph rule (geometric merge, ≡ recovery_to_markdown.py:23-126):
    * consecutive lines with the same left edge whose downward step is at most
    * 2× the font size join with ' '; anything else starts a new block. The
    * per-block (x, topY) then drive the banded XY-cut — the left edge is
    * exact, so column assignment never depends on the width estimate. */
  private[pdf] def chunksToBlocks(chunks: Vector[Chunk], pageH: Double,
                                  off: Int, end: Int): Vector[PBlock] = {
    if (chunks.isEmpty) return Vector.empty
    // merge same-baseline consecutive chunks into lines
    final case class Line(x: Double, y: Double, size: Double, text: String)
    val lines = Vector.newBuilder[Line]
    var cx = chunks.head.x; var cy = chunks.head.y; var cs = chunks.head.size
    var buf = new java.lang.StringBuilder(chunks.head.text)
    var i = 1
    while (i < chunks.length) {
      val ch = chunks(i)
      // same baseline AND same unmoved line origin = continuation of the same
      // show sequence; same baseline at a DIFFERENT x is another column's text
      // (two-column pages share baselines constantly) and must stay separate
      if (math.abs(ch.y - cy) < 0.01 && math.abs(ch.x - cx) < 0.01) buf.append(ch.text)
      else {
        lines += Line(cx, cy, cs, buf.toString)
        cx = ch.x; cy = ch.y; cs = ch.size
        buf = new java.lang.StringBuilder(ch.text)
      }
      i += 1
    }
    lines += Line(cx, cy, cs, buf.toString)
    val ls = lines.result()

    // geometric paragraph merge over consecutive lines
    val blocks = Vector.newBuilder[PBlock]
    var b0 = 0
    def flush(b1: Int): Unit = { // lines[b0, b1) form one block
      if (b1 > b0) {
        val seg = ls.slice(b0, b1)
        val text = TextNormalizer.normalize(seg.map(_.text).mkString(" "))
        if (text.nonEmpty) {
          val size = seg.head.size
          val topY = seg.map(_.y).max
          val minX = seg.map(_.x).min
          val wEst = 0.5 * size * seg.map(_.text.length).max // 0.5em/char, no metrics
          blocks += PBlock(
            math.round(minX).toInt,
            math.round(pageH - topY - size).toInt,
            math.round(wEst).toInt,
            math.round(seg.length * 1.2 * size).toInt,
            text, off, end)
        }
      }
    }
    i = 1
    while (i < ls.length) {
      val prev = ls(i - 1)
      val cur = ls(i)
      val step = prev.y - cur.y // positive = moving down the page
      val samePara = math.abs(cur.x - prev.x) < 0.5 && step > 0.01 && step <= 2.0 * cur.size
      if (!samePara) { flush(i); b0 = i }
      i += 1
    }
    flush(ls.length)
    blocks.result()
  }

  // -------------------------------------------------------- font resources

  /** A dict-valued entry: inline `<< … >>` or an indirect reference. */
  private def subDict(dict: String, key: String, objs: Map[Int, PdfObj]): Option[String] = {
    val m = pat(raw"/" + key + raw"\s*<<").matcher(dict)
    if (m.find()) {
      val start = m.end - 2
      val de = dictEnd(dict, start)
      if (de > 0) return Some(dict.substring(start, de))
    }
    ref(dict, key).flatMap(objs.get).map(_.dict).filter(_.nonEmpty)
  }

  /** Resolve one font object's decoder when it has NO /ToUnicode CMap:
    *  - composite (Type0) fonts — their /Encoding is a CMap name like
    *    Identity-H; without ToUnicode the codes are raw glyph ids → CidNoMap;
    *  - `/Encoding /WinAnsiEncoding` (name form) → the Appendix D table;
    *  - `/Encoding << /BaseEncoding … /Differences [ … ] >>` (inline dict or
    *    indirect ref) → base table (Standard when unnamed — the spec default
    *    for non-symbolic Type1) overlaid with the Differences;
    *  - anything else → None (Latin-ish fallback, the pre-existing path). */
  /** Identity-H recovery: /DescendantFonts → /FontDescriptor → /FontFile2
    * → the embedded TrueType cmap, reversed gid → text ([[TrueTypeCmap]]).
    * Valid only under /CIDToGIDMap /Identity (the default — then the CID in
    * the show string IS the gid the cmap indexes); a stream-valued
    * CIDToGIDMap, a missing/undecodable font file, or an unparsable cmap
    * falls back to the honest drop-and-flag [[CidNoMapDec]]. */
  private def cidDec(fontDict: String, objs: Map[Int, PdfObj],
      ttCache: scala.collection.mutable.HashMap[Int, Option[Map[Int, String]]]): FontDec = {
    val rev = refArray(fontDict, "DescendantFonts").headOption
      .flatMap(objs.get).flatMap { d =>
        val gidIdentity = !d.dict.contains("/CIDToGIDMap") ||
          hasName(d.dict, "CIDToGIDMap", "Identity")
        if (!gidIdentity) None
        else ref(d.dict, "FontDescriptor").flatMap(objs.get).flatMap { fd =>
          ref(fd.dict, "FontFile2").flatMap { ffNum =>
            // font programs are shared across pages: parse each once per doc
            ttCache.getOrElseUpdate(ffNum, objs.get(ffNum).flatMap { ff =>
              val dec = decodeStream(ff)
              if (dec.failed) None else TrueTypeCmap.gidToText(dec.data)
            })
          }
        }
      }
    rev.map(CidCmapDec.apply).getOrElse(CidNoMapDec)
  }

  private def encodingDec(fontDict: String, objs: Map[Int, PdfObj],
      ttCache: scala.collection.mutable.HashMap[Int, Option[Map[Int, String]]])
      : Option[FontDec] = {
    if (hasName(fontDict, "Subtype", "Type0"))
      return Some(cidDec(fontDict, objs, ttCache))
    // dict form FIRST: an inline `/Encoding << /Type /Encoding … >>` contains
    // "/Encoding /BaseEncoding" text the name-form regex would false-match
    subDict(fontDict, "Encoding", objs) match {
      case Some(enc) =>
        val base = firstGroup(raw"/BaseEncoding\s*/([A-Za-z0-9-]+)", enc)
          .flatMap(Encodings.baseTable).getOrElse(Encodings.standard)
        Some(firstGroup(raw"/Differences\s*\[([^\]]*)\]", enc) match {
          case Some(body) => TableDec(Encodings.withDifferences(base, body))
          case None => TableDec(base)
        })
      case None =>
        firstGroup(raw"/Encoding\s*/([A-Za-z0-9-]+)", fontDict) match {
          case Some(name) if name.startsWith("Identity") => Some(CidNoMapDec)
          case Some(name) => Encodings.baseTable(name).map(TableDec.apply)
          case None => None
        }
    }
  }

  /** Per-page font-name → decoder map: /Resources (with /Parent inheritance)
    * → /Font → each `/Fn N 0 R` entry → the font's /ToUnicode CMap stream
    * (authoritative) or its /Encoding tables ([[encodingDec]]). Fonts with
    * neither simply don't appear (their shows keep the Latin-ish fallback). */
  /** The page's /Resources dict (inline or indirect), inherited through
    * /Parent like MediaBox (ISO 32000 §7.7.3.4). */
  private def pageResources(page: PdfObj, objs: Map[Int, PdfObj]): Option[String] =
    inherited(page, objs)(subDict(_, "Resources", objs))

  /** Per-page image XObjects: /Resources → /XObject → each `/Name N 0 R`
    * entry whose object is `/Subtype /Image`, in dict order. */
  private def pageImageObjs(page: PdfObj, objs: Map[Int, PdfObj]): Vector[(String, PdfObj)] =
    pageResources(page, objs).flatMap(subDict(_, "XObject", objs)) match {
      case None => Vector.empty
      case Some(xd) =>
        val m = pat(raw"/([^\s/\[\]()<>{}%]+)\s+(\d+)\s+\d+\s+R").matcher(xd)
        val out = Vector.newBuilder[(String, PdfObj)]
        while (m.find()) {
          val name = m.group(1)
          m.group(2).toIntOption.flatMap(objs.get)
            .filter(o => hasName(o.dict, "Subtype", "Image"))
            .foreach(o => out += name -> o)
        }
        out.result()
    }

  private def pageFonts(page: PdfObj, objs: Map[Int, PdfObj],
      tuCache: scala.collection.mutable.HashMap[Int, Option[ToUnicode]],
      ttCache: scala.collection.mutable.HashMap[Int, Option[Map[Int, String]]])
      : Map[String, FontDec] = {
    pageResources(page, objs).flatMap(subDict(_, "Font", objs)) match {
      case None => Map.empty
      case Some(fd) =>
        // PDF name chars include '_', '+', '-', '.' (C2_0 / T1_0 are the
        // standard subset-font names) — match any non-delimiter run
        val m = pat(raw"/([^\s/\[\]()<>{}%]+)\s+(\d+)\s+\d+\s+R").matcher(fd)
        val out = Map.newBuilder[String, FontDec]
        while (m.find()) {
          val name = m.group(1)
          m.group(2).toIntOption.flatMap(objs.get).foreach { fo =>
            val viaCMap: Option[FontDec] = ref(fo.dict, "ToUnicode").flatMap { tuNum =>
              // CMaps are shared across pages: parse each /ToUnicode object
              // once per document, not once per page
              tuCache.getOrElseUpdate(tuNum, objs.get(tuNum).flatMap { tuObj =>
                val dec = decodeStream(tuObj)
                if (dec.failed) None else parseToUnicode(dec.data)
              }).map(CMapDec.apply)
            }
            viaCMap.orElse(encodingDec(fo.dict, objs, ttCache))
              .foreach(d => out += name -> d)
          }
        }
        out.result()
    }
  }

  // ------------------------------------------------------------------ parse

  /** Parse a real PDF into ordered pages of paragraph blocks. Returns None
    * only on a structural failure (no page objects at all / exception). */
  def parse(payload: Array[Byte], maxPages: Int): Option[Parsed] = {
    try {
      val s = byteView(payload)
      val (objs, objStmFailures) = scanObjects(payload, s)
      val pagesAll = pageObjects(objs)
      if (pagesAll.isEmpty) return None
      val pagesTruncated = pagesAll.length > maxPages
      val pages = if (pagesTruncated) pagesAll.take(maxPages) else pagesAll
      var decodeFailures = objStmFailures
      var unmappedShows = 0
      val tuCache = scala.collection.mutable.HashMap.empty[Int, Option[ToUnicode]]
      val ttCache = scala.collection.mutable.HashMap.empty[Int, Option[Map[Int, String]]]
      val images = Vector.newBuilder[PdfImage]
      var rotatedPages = 0
      val out = pages.zipWithIndex.map { case (p, pageIdx) =>
        val (w, h) = pageBox(p, objs)
        val rot = pageRotate(p, objs)
        if (rot != 0) rotatedPages += 1
        // upright (display) page dims: /Rotate 90/270 swap the MediaBox axes
        val (rw, rh) = if (rot == 90 || rot == 270) (h, w) else (w, h)
        // raw user coords -> upright display coords (clockwise viewer
        // rotation `rot`): 90 maps (x,y)->(y, w-x); 180 -> (w-x, h-y);
        // 270 -> (h-y, x). Applied to every geometry BEFORE the XY-cut so a
        // rotated page reads in its upright order.
        def upright(x: Double, y: Double): (Double, Double) = rot match {
          case 90  => (y, w - x)
          case 180 => (w - x, h - y)
          case 270 => (h - y, x)
          case _   => (x, y)
        }
        val fonts = pageFonts(p, objs, tuCache, ttCache)
        val directRefs = refArray(p.dict, "Contents")
        // §7.7.3.3: /Contents may be an indirect reference TO an array of
        // stream refs — the target is a bare (non-stream) object whose body
        // is the array. Without the expansion every stream ref resolves to
        // nothing and the page loses all text with status "ok" — silent
        // loss, which this file's contract forbids.
        val contentRefs = directRefs match {
          case Vector(one) =>
            objs.get(one) match {
              case Some(o) if o.streamRaw == null && o.dict.startsWith("[") =>
                val m = pat(raw"(\d+)\s+\d+\s+R").matcher(o.dict)
                val b = Vector.newBuilder[Int]
                while (m.find()) m.group(1).toIntOption.foreach(b += _)
                val v = b.result()
                if (v.nonEmpty) v else directRefs
              case _ => directRefs
            }
          case v => v
        }
        // aggregate bomb ceiling: the per-stream cap bounds ONE stream, but
        // `/Contents [5 0 R 5 0 R …]` re-decodes the same bomb per mention
        // (legal refs, no cache) — bound the page's TOTAL decoded content
        // the same way, keep the prefix, FLAG the loss once
        var contentBudget = MaxDecodedStream.toLong
        var contentCapped = false
        val datas = contentRefs.flatMap { r =>
          if (contentBudget <= 0) {
            if (!contentCapped) { decodeFailures += 1; contentCapped = true }
            None
          } else objs.get(r).map { o =>
            val d = decodeStream(o)
            if (d.failed) decodeFailures += 1
            contentBudget -= d.data.length
            d.data
          }
        }
        // provenance offsets: the first content object's position, taken from
        // the sequential scan (a substring re-search could match "4 0 obj"
        // inside "14 0 obj" or inside compressed stream bytes)
        val off = contentRefs.headOption.flatMap(objs.get).map(_.offset).getOrElse(0)
        // ISO 32000 §7.8.2: a page's /Contents array behaves as ONE stream —
        // graphics/text state (CTM, q/Q depth, current font) legally spans
        // stream boundaries, so parse the CONCATENATION (writers routinely
        // split 'cm' and the 'Do' it governs across streams). Tokens cannot
        // span boundaries, so a whitespace byte joins them safely.
        val joined =
          if (datas.length <= 1) datas.headOption.getOrElse(Array.emptyByteArray)
          else {
            val out = new java.io.ByteArrayOutputStream(datas.map(_.length).sum + datas.length)
            datas.foreach { d => out.write(d); out.write('\n') }
            out.toByteArray
          }
        val scan = extractChunks(joined, fonts)
        unmappedShows += scan.unmapped
        val chunks =
          if (rot == 0) scan.chunks
          else scan.chunks.map { c =>
            val (ux, uy) = upright(c.x, c.y)
            c.copy(x = ux, y = uy)
          }
        val places =
          if (rot == 0) scan.places
          else scan.places.map { q =>
            val (ax, ay) = upright(q.x0, q.y0)
            val (bx, by) = upright(q.x1, q.y1)
            q.copy(x0 = math.min(ax, bx), y0 = math.min(ay, by),
              x1 = math.max(ax, bx), y1 = math.max(ay, by))
          }
        // embedded images: every /Resources /XObject image, with a placement
        // rect per Do occurrence (top-down coords, like PBlock) — an image the
        // content stream never drew still carries its payload (placed=false)
        val imgObjs = pageImageObjs(p, objs)
        if (imgObjs.nonEmpty) {
          val byName = imgObjs.toMap
          val drawn = scala.collection.mutable.Set.empty[String]
          def mk(name: String, o: PdfObj, pl: Option[ImagePlace]): PdfImage = {
            val data = if (o.streamRaw == null) Array.emptyByteArray else o.streamRaw
            PdfImage(pageIdx, o.num, name,
              directInt(o.dict, "Width").getOrElse(0),
              directInt(o.dict, "Height").getOrElse(0),
              directInt(o.dict, "BitsPerComponent").getOrElse(8),
              firstGroup(raw"/ColorSpace\s*/([A-Za-z0-9]+)", o.dict).getOrElse(""),
              firstGroup(raw"/Filter\s*/([A-Za-z0-9]+)", o.dict).getOrElse("none"),
              data,
              pl.map(_.x0).getOrElse(0.0), pl.map(q => rh - q.y1).getOrElse(0.0),
              pl.map(q => q.x1 - q.x0).getOrElse(0.0),
              pl.map(q => q.y1 - q.y0).getOrElse(0.0),
              placed = pl.isDefined)
          }
          for (pl <- places; o <- byName.get(pl.name)) {
            drawn += pl.name
            images += mk(pl.name, o, Some(pl))
          }
          for ((name, o) <- imgObjs if !drawn.contains(name))
            images += mk(name, o, None)
        }
        Page(math.round(rw).toInt, math.round(rh).toInt,
          chunksToBlocks(chunks, rh, off, math.min(payload.length, off + 1)))
      }
      Some(Parsed(out, decodeFailures, unmappedShows, pagesTruncated,
        images.result(), rotatedPages))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }
}
