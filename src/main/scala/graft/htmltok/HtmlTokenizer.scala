package graft.htmltok

import java.nio.charset.{Charset, StandardCharsets}

/** Token kinds. Kept as raw bytes in a flat arena (no per-token objects) — the
  * JVM analog of the reference pushing hot loops to native code
  * (ppocr/postprocess/pse_postprocess/pse/__init__.py:20-29 compiles C++ at import;
  * our hot path is primitive-array Scala that stays JIT/escape-analysis friendly).
  */
object Tok {
  final val Text: Byte = 0
  final val Start: Byte = 1
  final val End: Byte = 2
  final val SelfClose: Byte = 3
  final val Comment: Byte = 4
  final val Doctype: Byte = 5
  final val Cdata: Byte = 6
}

/** Flat token arena: parallel primitive arrays, reused across documents within a
  * partition (call `reset()` between docs). Offsets are byte offsets into the raw
  * input and PARTITION it: for every i, ends(i) == starts(i+1), starts(0) == 0,
  * ends(size-1) == input length (property-tested; FIXTURES.md §5a).
  */
final class TokenArena(initialCapacity: Int = 1024) {
  var size: Int = 0
  var kinds: Array[Byte] = new Array[Byte](initialCapacity)
  var starts: Array[Int] = new Array[Int](initialCapacity)
  var ends: Array[Int] = new Array[Int](initialCapacity)
  var tagIds: Array[Int] = new Array[Int](initialCapacity) // -1 for non-tags
  var flags: Array[Int] = new Array[Int](initialCapacity)

  // per-document tag-name intern table
  private val internMap = new java.util.HashMap[String, Integer](64)
  private val internNames = new scala.collection.mutable.ArrayBuffer[String](64)

  def reset(): Unit = { size = 0; internMap.clear(); internNames.clear() }

  def tagName(id: Int): String = internNames(id)

  /** Immutable view of the interned names, id-indexed (for the DOM builder). */
  def namesSnapshot: IndexedSeq[String] = internNames.toIndexedSeq

  def intern(name: String): Int = {
    val got = internMap.get(name)
    if (got ne null) got.intValue()
    else {
      val id = internNames.length
      internNames += name
      internMap.put(name, id)
      id
    }
  }

  private def grow(): Unit = {
    val cap = kinds.length * 2
    kinds = java.util.Arrays.copyOf(kinds, cap)
    starts = java.util.Arrays.copyOf(starts, cap)
    ends = java.util.Arrays.copyOf(ends, cap)
    tagIds = java.util.Arrays.copyOf(tagIds, cap)
    flags = java.util.Arrays.copyOf(flags, cap)
  }

  def add(kind: Byte, start: Int, end: Int, tagId: Int, flag: Int): Unit = {
    if (size == kinds.length) grow()
    kinds(size) = kind
    starts(size) = start
    ends(size) = end
    tagIds(size) = tagId
    flags(size) = flag
    size += 1
  }
}

object TokenFlags {
  /** start-tag carries an href attribute (link-density feature input) */
  final val HasHref = 1
  /** class/id attribute matches the boilerplate-hint lexicon */
  final val HintBoiler = 2
  /** class/id attribute matches the content-hint lexicon */
  final val HintContent = 4
  // colspan-1 / rowspan-1 packed in bits 4..13 / 14..23 (0 ⇒ span 1; the
  // HTML5 clamp is 1000, we cap at the 10-bit 1023) — table structure decode
  // carries spans like the reference (ppocr/postprocess/table_postprocess.py:60-94).
  // Seen-markers make repeated attributes first-one-wins (browsers' rule) —
  // OR-merging a duplicate would produce a span matching neither value.
  final val ColspanShift = 4
  final val RowspanShift = 14
  final val SpanMask = 0x3ff
  final val ColspanSeen = 1 << 24
  final val RowspanSeen = 1 << 25
  /** start tag carries an encoding attribute whose value mentions "tex"
    * other than as the prefix of "text" (so "text/plain"/"text/html" prose
    * alternates do NOT pose as TeX, while "text/x-tex" still does) —
    * consulted only on `<annotation>` elements inside `<math>` (the MathML
    * `encoding="application/x-tex"` convention; formula-branch source
    * selection, the graft of the reference's equation region → LaTeX text
    * contract, ppstructure/predict_system.py:171-174) */
  final val TexEncoding = 1 << 26

  def colspan(flag: Int): Int = ((flag >>> ColspanShift) & SpanMask) + 1
  def rowspan(flag: Int): Int = ((flag >>> RowspanShift) & SpanMask) + 1

  /** Encode a span attribute value (1 ⇒ no bits set). */
  def packSpan(value: Int, shift: Int): Int = {
    val v = math.min(math.max(value, 1), 1000) - 1
    v << shift
  }
}

/** Charset sniffing: BOM (UTF-8 / UTF-16), then `<meta charset=...>` /
  * http-equiv content-type in the first 1024 bytes, else UTF-8. The analog of
  * DecodeImage's channel-order dispatch (ppocr/data/imaug/operators.py:29-61)
  * for byte payloads — and the graft of the reference's ~40 per-language dicts
  * (ppocr/utils/dict/): the JVM charset registry IS the dict table.
  *
  * Two decode regimes (see `rawByteSafe`):
  *  - ASCII-superset encodings where no multi-byte sequence can contain a
  *    structural byte (< 0x40: the '<' '>' '"' '\'' '=' '/' '&' ';' family):
  *    utf-8, all latin/windows/koi8 single-byte pages, and the CJK families
  *    shift_jis / gbk / gb18030 / big5 / euc-jp / euc-kr, whose trail bytes
  *    are ≥ 0x40 by construction. These tokenize on raw bytes; text decodes
  *    per block with the sniffed charset (the zero-copy fast path).
  *  - everything else (utf-16/utf-32, escape-switched iso-2022-*, EBCDIC)
  *    transcodes to UTF-8 FIRST, then tokenizes (Extractor.extract routes).
  */
object Charsets {
  val Utf8: Charset = StandardCharsets.UTF_8
  val Latin1: Charset = StandardCharsets.ISO_8859_1

  // cache: charset resolution + safety classification are hot (per document)
  private val resolveCache = new java.util.concurrent.ConcurrentHashMap[String, Charset]()
  private val safeCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def resolve(name: String): Charset = {
    val key = name.toLowerCase(java.util.Locale.ROOT) // tr-TR 'I'→'ı' trap
    val cached = resolveCache.get(key)
    if (cached != null) return cached
    val cs = key match {
      case "utf-8" | "utf8" => Utf8
      // WHATWG encoding standard: the ascii / latin1 / iso-8859-1 label
      // family maps to windows-1252 — real pages labeled iso-8859-1
      // overwhelmingly contain cp1252 punctuation in 0x80-0x9F, which plain
      // ISO-8859-1 would decode to invisible C1 control characters
      case "latin-1" | "latin1" | "iso-8859-1" | "iso8859-1" | "ascii" | "us-ascii" =>
        Charset.forName("windows-1252")
      // the long tail goes through the JVM registry, which knows the standard
      // alias webs (sjis/shift-jis/ms_kanji → Shift_JIS, cpNNNN →
      // windows-NNNN, gb2312/gbk/big5/euc-kr/koi8-r/iso-8859-N/tis-620 …);
      // unknown or unsupported names fall back to UTF-8
      case other =>
        try Charset.forName(other)
        catch { case _: Exception => Utf8 }
    }
    // bounded: the key is an arbitrary page-supplied label (attacker bytes);
    // an unbounded process-lifetime map would grow with label cardinality
    // over a long-lived executor. 4096 covers every real label web; past it
    // the resolve still works, it just isn't memoized
    if (resolveCache.size < 4096) resolveCache.put(key, cs)
    cs
  }

  /** Canonical names of multi-byte charsets whose sequences never contain a
    * byte the raw tokenizer treats as TAG-structural. The precise invariant
    * (r2 ADVICE): trail bytes stay ≥ 0x40 in these families EXCEPT GB18030's
    * 4-byte form (2nd/4th bytes 0x30-0x39 — digits, not structural), and the
    * only structural byte ≥ 0x40 anywhere in the scanner is ']' (0x5D, a
    * legal Shift_JIS/Big5/GBK trail) in the CDATA "]]>" scan — which is why
    * CDATA-bearing payloads in non-UTF-8 multi-byte charsets are routed to
    * the transcode-first path instead ([[rawByteHazardCdata]]). This is a
    * whitelist on purpose: default-allow would wrongly admit e.g. Johab
    * (trail bytes include 0x3C '<') or the escape-switched x-windows-5022x
    * JIS variants whose names don't contain "ISO-2022". */
  private val multiByteSafe: Set[String] = Set(
    "UTF-8", "Shift_JIS", "windows-31j", "x-MS932_0213", "GBK", "GB2312",
    "x-mswin-936", "GB18030", "Big5", "Big5-HKSCS", "x-windows-950",
    "EUC-JP", "EUC-KR", "x-windows-949")

  /** True when raw-byte tokenization is sound for this charset: it must be an
    * ASCII superset AND no multi-byte sequence may contain a byte < 0x40
    * (every HTML-structural byte is < 0x40, so '<' etc. are then unambiguous).
    * Sound = single-byte charsets passing an ASCII-roundtrip probe (rejects
    * EBCDIC-style non-supersets), or the whitelisted multi-byte families
    * above. Everything else — UTF-16/32, ISO-2022, Johab, autodetectors —
    * takes the transcode-first path. */
  def rawByteSafe(cs: Charset): Boolean = {
    val key = cs.name()
    val cached = safeCache.get(key)
    if (cached != null) return cached.booleanValue()
    val safe =
      if (multiByteSafe.contains(key)) true
      else {
        val singleByte =
          try cs.canEncode && cs.newEncoder().maxBytesPerChar() == 1.0f
          catch { case _: Exception => false }
        if (!singleByte) false
        else {
          // ASCII roundtrip probe: 0x00-0x7F must decode to themselves
          val ascii = Array.tabulate[Byte](128)(_.toByte)
          val dec = new String(ascii, cs)
          dec.length == 128 && (0 until 128).forall(i => dec.charAt(i) == i.toChar)
        }
      }
    safeCache.put(key, java.lang.Boolean.valueOf(safe))
    safe
  }

  /** True when `cs` is raw-byte-safe EXCEPT for the CDATA "]]>" scan: ']'
    * (0x5D) is a legal trail byte in the non-UTF-8 multi-byte families, so a
    * CDATA section there can appear to close one byte early, mid-character.
    * UTF-8 is immune (trail bytes ≥ 0x80). Callers route such payloads to
    * the transcode-first path when they actually contain a CDATA opener. */
  def rawByteHazardCdata(cs: Charset): Boolean =
    multiByteSafe.contains(cs.name()) && cs != Utf8

  /** Does the payload contain a "<![CDATA[" opener (case-insensitive, same
    * match as the tokenizer's)? Only consulted for the rare multi-byte
    * non-UTF-8 charsets — never on the hot path. */
  def containsCdata(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i + 8 < n) {
      if (b(i) == '<' && b(i + 1) == '!' && b(i + 2) == '[' &&
        (b(i + 3) | 32) == 'c' && (b(i + 4) | 32) == 'd' &&
        (b(i + 5) | 32) == 'a' && (b(i + 6) | 32) == 't' &&
        (b(i + 7) | 32) == 'a' && b(i + 8) == '[') return true
      i += 1
    }
    false
  }

  /** Returns (charset, bomLength). A `charset=` declaration is honored only
    * INSIDE a `<meta ...>` tag (scanning the whole head for the bare substring
    * would match URL query params or script text). */
  def sniff(b: Array[Byte]): (Charset, Int) = {
    if (b.length >= 3 && b(0) == 0xef.toByte && b(1) == 0xbb.toByte && b(2) == 0xbf.toByte)
      return (Utf8, 3)
    // UTF-32 BOMs BEFORE UTF-16: FF FE 00 00 is UTF-32LE, and its 2-byte
    // prefix would otherwise misdetect as UTF-16LE
    if (b.length >= 4 && b(0) == 0xff.toByte && b(1) == 0xfe.toByte &&
      b(2) == 0.toByte && b(3) == 0.toByte)
      return (Charset.forName("UTF-32LE"), 4)
    if (b.length >= 4 && b(0) == 0.toByte && b(1) == 0.toByte &&
      b(2) == 0xfe.toByte && b(3) == 0xff.toByte)
      return (Charset.forName("UTF-32BE"), 4)
    if (b.length >= 2 && b(0) == 0xff.toByte && b(1) == 0xfe.toByte)
      return (StandardCharsets.UTF_16LE, 2)
    if (b.length >= 2 && b(0) == 0xfe.toByte && b(1) == 0xff.toByte)
      return (StandardCharsets.UTF_16BE, 2)
    val n = math.min(b.length, 1024)
    val rawHead = new String(b, 0, n, StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    // blank out comment spans before the meta scan (the HTML5 prescan this
    // mirrors skips <!-- … -->): a charset declaration inside a conditional
    // comment ('<!--[if lt IE 9]><meta charset=windows-1250><![endif]-->')
    // must not hijack the document charset from the real one that follows
    val head = if (rawHead.indexOf("<!--") < 0) rawHead else {
      val sb = new java.lang.StringBuilder(rawHead)
      var c = rawHead.indexOf("<!--")
      while (c >= 0) {
        val e = rawHead.indexOf("-->", c + 4)
        val stop = if (e < 0) rawHead.length else e + 3
        var x = c
        while (x < stop) { sb.setCharAt(x, ' '); x += 1 }
        c = rawHead.indexOf("<!--", stop)
      }
      sb.toString
    }
    var m = head.indexOf("<meta")
    while (m >= 0) {
      val tagEnd = { val e = head.indexOf('>', m); if (e < 0) head.length else e }
      // attribute-level scan (NOT a raw substring search — "charset=" inside
      // an unrelated attribute VALUE like content="how to use charset=x"
      // must not hijack the document charset): collect the charset attr, and
      // the http-equiv/content pair for the legacy content-type form
      var charsetVal: String = null
      var httpEquiv: String = null
      var contentVal: String = null
      var j = m + 5
      while (j < tagEnd) {
        if (head(j).isLetter) {
          val ns = j
          while (j < tagEnd && (head(j).isLetterOrDigit || head(j) == '-' || head(j) == '_')) j += 1
          val aname = head.substring(ns, j)
          while (j < tagEnd && head(j).isWhitespace) j += 1
          var avalue: String = null
          if (j < tagEnd && head(j) == '=') {
            j += 1
            while (j < tagEnd && head(j).isWhitespace) j += 1
            if (j < tagEnd && (head(j) == '"' || head(j) == '\'')) {
              val q = head(j); j += 1
              val vs = j
              while (j < tagEnd && head(j) != q) j += 1
              avalue = head.substring(vs, j)
              if (j < tagEnd) j += 1
            } else {
              val vs = j
              while (j < tagEnd && !head(j).isWhitespace && head(j) != '>') j += 1
              avalue = head.substring(vs, j)
            }
          }
          if (avalue != null) aname match {
            case "charset"    => if (charsetVal == null) charsetVal = avalue.trim
            case "http-equiv" => httpEquiv = avalue.trim
            case "content"    => contentVal = avalue
            case _            => ()
          }
        } else j += 1
      }
      val fromContent =
        if (charsetVal == null && httpEquiv == "content-type" && contentVal != null) {
          val ci = contentVal.indexOf("charset=")
          if (ci >= 0) {
            var k = ci + 8
            if (k < contentVal.length && (contentVal(k) == '"' || contentVal(k) == '\'')) k += 1
            val vs = k
            while (k < contentVal.length &&
              (contentVal(k).isLetterOrDigit || contentVal(k) == '-' || contentVal(k) == '_')) k += 1
            val v = contentVal.substring(vs, k)
            if (v.nonEmpty) v else null
          } else null
        } else null
      val label = if (charsetVal != null && charsetVal.nonEmpty) charsetVal else fromContent
      if (label != null) {
        val declared = resolve(label)
        // HTML5 §13.2: a meta-declared utf-16 label means utf-8 — the
        // declaration was readable as ASCII bytes, which proves the payload
        // is NOT utf-16 (real utf-16/32 is caught by the BOM checks above)
        val declaredUp = declared.name().toUpperCase(java.util.Locale.ROOT)
        val cs = if (declaredUp.startsWith("UTF-16") ||
          declaredUp.startsWith("UTF-32")) Utf8 else declared
        return (cs, 0)
      }
      // resume past THIS tag's end — restarting at m+5 would let a literal
      // '<meta charset=…>' inside this meta's quoted content value be
      // parsed as a real tag and hijack the charset
      m = head.indexOf("<meta", math.max(m + 5, tagEnd))
    }
    (Utf8, 0)
  }
}

/** Single-pass byte-stream HTML tokenizer.
  *
  * Handles: start/end/self-closing tags, attributes (quoted/unquoted), comments,
  * doctype, CDATA, rawtext elements (script/style — content scanned for the literal
  * close tag, `<` inside is text), bare `<` in text, unclosed constructs at EOF.
  * Never loses bytes: emitted token ranges partition the input (tag-soup contract,
  * FIXTURES.md F09).
  *
  * Structure-bearing bytes in HTML are ASCII and all < 0x40, so tokenizing
  * raw bytes is charset-safe for every `Charsets.rawByteSafe` encoding
  * (ASCII supersets whose multi-byte trail bytes are ≥ 0x40: utf-8, the
  * single-byte latin/windows/koi8 family, shift_jis/gbk/big5/euc-*); text
  * decode happens later, per block, with the sniffed charset. Non-safe
  * encodings (utf-16/32, iso-2022) are transcoded to UTF-8 BEFORE reaching
  * this tokenizer (Extractor.extract).
  */
object HtmlTokenizer {

  private val boilerHintWords = Array("nav", "menu", "footer", "header", "sidebar",
    "banner", "breadcrumb", "advert", "ads", "ad-", "promo", "share", "social",
    "comment", "related", "widget", "cookie", "popup", "masthead")
  private val contentHintWords = Array("article", "content", "main", "post", "body-text",
    "story", "entry", "text")

  private def isAsciiLetter(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def toLower(c: Int): Int = if (c >= 'A' && c <= 'Z') c + 32 else c

  /** Tokenize `input` into `arena` (which is reset first). */
  def tokenize(input: Array[Byte], arena: TokenArena): Unit = {
    arena.reset()
    val n = input.length
    var i = 0
    var textStart = 0 // start of pending text run

    def flushText(upTo: Int): Unit =
      if (upTo > textStart) arena.add(Tok.Text, textStart, upTo, -1, 0)

    while (i < n) {
      val c = input(i) & 0xff
      if (c == '<' && i + 1 < n) {
        val c1 = input(i + 1) & 0xff
        if (c1 == '!') {
          // comment / doctype / CDATA
          flushText(i)
          if (i + 3 < n && input(i + 2) == '-' && input(i + 3) == '-') {
            // HTML5 abruptly-closed comments are complete: "<!-->" and
            // "<!--->" (without them, one typo'd comment swallows the page)
            var end = -1
            if (i + 4 < n && input(i + 4) == '>') end = i + 5
            else if (i + 5 < n && input(i + 4) == '-' && input(i + 5) == '>') end = i + 6
            else {
              var j = i + 4
              while (end < 0 && j + 2 < n) {
                if (input(j) == '-' && input(j + 1) == '-' && input(j + 2) == '>') end = j + 3
                j += 1
              }
              if (end < 0) end = n // unclosed comment swallows to EOF
            }
            arena.add(Tok.Comment, i, end, -1, 0)
            i = end; textStart = i
          } else if (i + 8 < n && input(i + 2) == '[' &&
            (input(i + 3) | 32) == 'c' && (input(i + 4) | 32) == 'd' &&
            (input(i + 5) | 32) == 'a' && (input(i + 6) | 32) == 't' &&
            (input(i + 7) | 32) == 'a' && input(i + 8) == '[') {
            var j = i + 9
            var end = -1
            while (end < 0 && j + 2 < n) {
              if (input(j) == ']' && input(j + 1) == ']' && input(j + 2) == '>') end = j + 3
              j += 1
            }
            // flag=1 iff the "]]>" closer exists — the DOM strips it only
            // then (an unclosed construct to EOF has no closer bytes to trim)
            val closed = end >= 0
            if (end < 0) end = n
            arena.add(Tok.Cdata, i, end, -1, if (closed) 1 else 0)
            i = end; textStart = i
          } else {
            var j = i + 2
            while (j < n && input(j) != '>') j += 1
            val end = if (j < n) j + 1 else n
            arena.add(Tok.Doctype, i, end, -1, 0)
            i = end; textStart = i
          }
        } else if (c1 == '/') {
          // end tag — name charset must match parseStartTag's (letter first,
          // then letter/digit/'-'), or hyphenated custom elements never close
          var j = i + 2
          val nameSb = new java.lang.StringBuilder(8)
          while (j < n && {
            val cc = input(j) & 0xff
            isAsciiLetter(cc) ||
              (nameSb.length > 0 && ((cc >= '0' && cc <= '9') || cc == '-'))
          }) {
            nameSb.append(toLower(input(j) & 0xff).toChar); j += 1
          }
          if (nameSb.length == 0) {
            // stray "</" with no name: treat as text
            i += 1
          } else {
            while (j < n && input(j) != '>') j += 1
            val end = if (j < n) j + 1 else n
            flushText(i)
            arena.add(Tok.End, i, end, arena.intern(nameSb.toString), 0)
            i = end; textStart = i
          }
        } else if (isAsciiLetter(c1)) {
          // start tag: flush pending text first so the tag token lands in order
          flushText(i)
          textStart = i
          val parsed = parseStartTag(input, i, n, arena)
          if (parsed < 0) {
            // EOF in tag (HTML5: the partial tag emits nothing): cover
            // '<'..EOF with a Comment token — no DOM node, no text, and the
            // token-partition invariant (every byte covered) holds. The old
            // '<' -> text retry was also quadratic: a '>'-free payload with
            // ~300k '<letter' runs rescanned to EOF per occurrence, pinning
            // a task for minutes on one hostile row
            arena.add(Tok.Comment, i, n, -1, 0)
            i = n; textStart = n
          } else {
            val tokIdx = arena.size - 1 // parseStartTag added the token
            i = parsed; textStart = i
            // rawtext/RCDATA elements: scan to the literal close tag. script/
            // style are rawtext; textarea/title are RCDATA — tags inside are
            // literal text per HTML5 (entity decode still applies later in the
            // per-block decode pass, which is exactly RCDATA semantics).
            // parseStartTag forces these to Tok.Start even when written
            // XHTML-style as <script/>, so the guard is on the name alone.
            val name = arena.tagName(arena.tagIds(tokIdx))
            if (HtmlNames.isRawtext(name) && arena.kinds(tokIdx) == Tok.Start) {
              val close = findCloseTag(input, i, n, name)
              if (close > i) { arena.add(Tok.Text, i, close, -1, 0); i = close; textStart = i }
            }
          }
        } else {
          i += 1 // '<' followed by non-tag char: text
        }
      } else i += 1
    }
    flushText(n)
  }

  /** Parse a start tag beginning at `i` (input(i)=='<'). Adds the token to the
    * arena and returns the index just past '>'; returns -1 if malformed (no '>'
    * found — caller treats '<' as text). Extracts href presence and class/id hints.
    */
  /** Href values of `<a>` start tags, in document order — the link-extraction
    * pass of a crawl link-graph build (the WAT-records shape of Common Crawl,
    * public format). Runs the SAME tokenizer as text extraction (comments,
    * rawtext and script bodies correctly skipped, so no phantom links), then
    * re-scans each href-flagged `<a>` tag's byte span with the same attribute
    * state machine — purely additive, the hot extraction path is untouched.
    * Values are entity-decoded (`&amp;` in query strings) and stripped of
    * leading/trailing ASCII whitespace per the URL spec. Assumes an
    * ASCII-compatible byte encoding (true post-transcode in the pipeline). */
  /** Charset-normalized payload for the flat link/meta walks below: the
    * SAME sniff extraction performs, then UTF-8 bytes out — a UTF-8 page
    * passes through (BOM sliced), anything else (windows-1252, Shift_JIS,
    * GBK, UTF-16/32 …) transcodes, so the walks' hardcoded UTF-8 text
    * decodes and ASCII attribute scans are correct for every charset the
    * extraction path accepts. Without this, a Shift_JIS page's anchors and
    * title decoded as U+FFFD runs and a BOM'd UTF-16 page yielded zero
    * links — the two surfaces disagreed on the same input. (Extraction
    * keeps its finer raw-byte routing — it decodes per block; these side
    * surfaces trade one whole-payload transcode for correctness.) */
  def normalizeHtml(input: Array[Byte]): Array[Byte] = {
    if (input == null || input.isEmpty) return Array.emptyByteArray
    val (cs, bom) = Charsets.sniff(input)
    if (cs == Charsets.Utf8) {
      if (bom == 0) input else java.util.Arrays.copyOfRange(input, bom, input.length)
    } else {
      val decoded = new String(input, bom, input.length - bom, cs)
      val start = if (decoded.nonEmpty && decoded.charAt(0) == '\uFEFF') 1 else 0
      decoded.substring(start).getBytes(Charsets.Utf8)
    }
  }

  def anchorHrefs(raw: Array[Byte], arena: TokenArena): Vector[String] = {
    val input = normalizeHtml(raw)
    tokenize(input, arena)
    val out = Vector.newBuilder[String]
    var t = 0
    while (t < arena.size) {
      val k = arena.kinds(t)
      if ((k == Tok.Start || k == Tok.SelfClose) &&
          (arena.flags(t) & TokenFlags.HasHref) != 0 &&
          arena.tagName(arena.tagIds(t)) == "a") {
        val v = hrefValue(input, arena.starts(t), arena.ends(t))
        if (v != null && v.nonEmpty) out += v
      }
      t += 1
    }
    out.result()
  }

  /** (href, anchor text) pairs of `<a>` tags in document order — the
    * anchor-text corpus build (the hyperlink-text training signal; public
    * WAT `Links`+`text` shape). Anchor text is the concatenation of Text
    * tokens between the `<a>` start and its matching `</a>` (nested inline
    * markup contributes its text; a nested/implicitly-closing `<a>` or EOF
    * terminates the span, per the HTML no-nested-anchors rule),
    * entity-decoded, whitespace-normalized to single spaces. */
  def anchorTexts(raw: Array[Byte], arena: TokenArena): Vector[(String, String)] = {
    val input = normalizeHtml(raw)
    tokenize(input, arena)
    val out = Vector.newBuilder[(String, String)]
    var t = 0
    while (t < arena.size) {
      val k = arena.kinds(t)
      if ((k == Tok.Start || k == Tok.SelfClose) &&
          (arena.flags(t) & TokenFlags.HasHref) != 0 &&
          arena.tagName(arena.tagIds(t)) == "a") {
        val href = hrefValue(input, arena.starts(t), arena.ends(t))
        if (href != null && href.nonEmpty) {
          val sb = new java.lang.StringBuilder()
          var j = t + 1
          var open = k == Tok.Start
          var skipDepth = 0 // svg/noscript/iframe/object/… subtree depth
          while (open && j < arena.size) {
            val kj = arena.kinds(j)
            val nj = if (arena.tagIds(j) >= 0) arena.tagName(arena.tagIds(j)) else null
            if (kj == Tok.Text) {
              // invisible subtrees contribute NO anchor text — the same
              // HtmlNames.isSkip set the DOM walk excludes, so
              // '<a><svg><text>42</text></svg>Home</a>' reads "Home", not
              // "42 Home" (the flat walk previously skipped only rawtext)
              if (skipDepth == 0)
                sb.append(new String(input, arena.starts(j),
                  arena.ends(j) - arena.starts(j), java.nio.charset.StandardCharsets.UTF_8))
            } else if ((kj == Tok.End || kj == Tok.Start) && nj == "a" && skipDepth == 0) {
              open = false
            } else if (kj == Tok.Start && nj != null && HtmlNames.isRawtext(nj)) {
              // rawtext bodies (script/style/…) are emitted as Text tokens —
              // skip to the matching End so code never leaks into anchor text
              val rid = arena.tagIds(j)
              j += 1
              while (j < arena.size &&
                  !(arena.kinds(j) == Tok.End && arena.tagIds(j) == rid)) j += 1
            } else if (kj == Tok.Start && nj != null && HtmlNames.isSkip(nj)) {
              skipDepth += 1
            } else if (kj == Tok.End && nj != null && HtmlNames.isSkip(nj) &&
                skipDepth > 0) {
              skipDepth -= 1
            }
            j += 1
          }
          val raw = sb.toString
          val decoded = if (raw.indexOf('&') >= 0) graft.extract.Entities.decode(raw) else raw
          out += href -> decoded.split("\\s+").filter(_.nonEmpty).mkString(" ")
        }
      }
      t += 1
    }
    out.result()
  }

  /** Absolute outlink URLs of one page: every `<a href>` resolved per
    * RFC 3986 against the page's EFFECTIVE base — the first `<base href>`
    * (itself resolved against the document URL, per HTML) or the document
    * URL when absent. One tokenize pass; script/comment fake anchors are
    * skipped by construction. The x21 host shortcut resolves hosts only;
    * this is the full-URL frontier feed. */
  def resolvedLinks(raw: Array[Byte], arena: TokenArena,
                    docUrl: String): Vector[String] = {
    val input = normalizeHtml(raw)
    tokenize(input, arena)
    var base = docUrl
    var baseSeen = false
    val hrefs = Vector.newBuilder[String]
    var t = 0
    while (t < arena.size) {
      val k = arena.kinds(t)
      if (k == Tok.Start || k == Tok.SelfClose) {
        val name = arena.tagName(arena.tagIds(t))
        if (name == "base" && !baseSeen) {
          val h = attrValue(input, arena.starts(t), arena.ends(t), "href")
          if (h != null && h.nonEmpty) {
            base = graft.expressions.UrlKernel.resolve(docUrl, h)
            baseSeen = true
          }
        } else if ((arena.flags(t) & TokenFlags.HasHref) != 0 && name == "a") {
          val v = hrefValue(input, arena.starts(t), arena.ends(t))
          if (v != null && v.nonEmpty) hrefs += v
        }
      }
      t += 1
    }
    // resolve AFTER the walk: HTML resolves hrefs on demand against the
    // document's (final) base, so an anchor that lexically precedes the
    // <base> tag still uses it — and the base splits ONCE for all hrefs
    // instead of per anchor (link-farm pages carry 10k+)
    val b = graft.expressions.UrlKernel.splitUri(base.trim)
    hrefs.result().map(graft.expressions.UrlKernel.resolveWith(b, _))
  }

  /** Page-level head metadata (the public Common-Crawl WAT `Head` record
    * shape: Title, Metas, Link rel=canonical) — what a crawl-curation
    * pipeline reads without extracting the body. null = absent. */
  final case class HeadMeta(title: String, description: String,
                            canonical: String, robots: String,
                            ogTitle: String, ogDescription: String,
                            lang: String)

  /** Extract head metadata from one page: `<title>` (RCDATA body,
    * entity-decoded, ws-normalized), `<meta name=description|robots>` and
    * `<meta property=og:title|og:description>` content values,
    * `<link rel=canonical href>`, and `<html lang>`. FIRST occurrence wins
    * (the browser rule for repeated metadata). The scan covers the whole
    * token stream — HTML5 tolerates metadata outside `<head>` — but rawtext
    * bodies cannot fake tags by construction (script/style bodies tokenize
    * as Text), so `<meta>` written inside a script string is never seen. */
  def headMeta(raw: Array[Byte], arena: TokenArena): HeadMeta = {
    val input = normalizeHtml(raw)
    tokenize(input, arena)
    var title: String = null; var desc: String = null
    var canonical: String = null; var robots: String = null
    var ogTitle: String = null; var ogDesc: String = null
    var lang: String = null
    var t = 0
    while (t < arena.size) {
      val k = arena.kinds(t)
      if (k == Tok.Start || k == Tok.SelfClose) {
        val s = arena.starts(t); val e = arena.ends(t)
        arena.tagName(arena.tagIds(t)) match {
          case "html" if lang == null =>
            lang = attrValue(input, s, e, "lang")
          case "title" if title == null && k == Tok.Start =>
            title =
              if (t + 1 < arena.size && arena.kinds(t + 1) == Tok.Text) {
                val raw = new String(input, arena.starts(t + 1),
                  arena.ends(t + 1) - arena.starts(t + 1),
                  java.nio.charset.StandardCharsets.UTF_8)
                val d = if (raw.indexOf('&') >= 0) graft.extract.Entities.decode(raw) else raw
                d.split("\\s+").filter(_.nonEmpty).mkString(" ")
              } else ""
          case "meta" =>
            val nm = attrValue(input, s, e, "name")
            val key = if (nm != null) nm
              else attrValue(input, s, e, "property")
            if (key != null) {
              def content: String = attrValue(input, s, e, "content")
              key.toLowerCase(java.util.Locale.ROOT).trim match {
                case "description"    if desc == null    => desc = content
                case "robots"         if robots == null  => robots = content
                case "og:title"       if ogTitle == null => ogTitle = content
                case "og:description" if ogDesc == null  => ogDesc = content
                case _ =>
              }
            }
          case "link" if canonical == null =>
            // rel is a space-separated TOKEN LIST (HTML spec) — match
            // membership, not string equality ("alternate canonical" counts)
            val rel = attrValue(input, s, e, "rel")
            if (rel != null && rel.toLowerCase(java.util.Locale.ROOT)
                .split("[ \t\n\r\f]+").contains("canonical"))
              canonical = attrValue(input, s, e, "href")
          case _ =>
        }
      }
      t += 1
    }
    HeadMeta(title, desc, canonical, robots, ogTitle, ogDesc, lang)
  }

  /** First href attribute value inside tag bytes [i0, end) — parseStartTag's
    * attribute state machine with value capture instead of flag packing. */
  private def hrefValue(input: Array[Byte], i0: Int, end: Int): String =
    attrValue(input, i0, end, "href")

  /** First value of attribute `name` inside tag bytes [i0, end) — the same
    * state machine as parseStartTag with value capture; the value is
    * ws-trimmed and entity-decoded (attribute-value semantics). Case
    * matching on the attr NAME is exact-lowercase (the tokenizer lowercases
    * nothing here; `nameIs` compares ASCII case-insensitively). */
  private[graft] def attrValue(input: Array[Byte], i0: Int, end: Int, name: String): String = {
    var j = i0 + 1
    while (j < end && (isAsciiLetter(input(j) & 0xff) ||
        (j > i0 + 1 && { val c = input(j) & 0xff; (c >= '0' && c <= '9') || c == '-' }))) j += 1
    while (j < end && input(j) != '>') {
      val c = input(j) & 0xff
      if (isAsciiLetter(c)) {
        val anStart = j
        while (j < end && { val cc = input(j) & 0xff
          isAsciiLetter(cc) || (cc >= '0' && cc <= '9') || cc == '-' || cc == '_' }) j += 1
        val anLen = j - anStart
        while (j < end && (input(j) == ' ' || input(j) == '\t' || input(j) == '\n' || input(j) == '\r')) j += 1
        var vStart = -1
        var vEnd = -1
        if (j < end && input(j) == '=') {
          j += 1
          while (j < end && (input(j) == ' ' || input(j) == '\t' || input(j) == '\n' || input(j) == '\r')) j += 1
          if (j < end && (input(j) == '"' || input(j) == '\'')) {
            val quote = input(j); j += 1
            vStart = j
            while (j < end && input(j) != quote) j += 1
            vEnd = j
            if (j < end) j += 1
          } else {
            vStart = j
            while (j < end && { val cc = input(j) & 0xff; cc != ' ' && cc != '\t' && cc != '\n' && cc != '\r' && cc != '>' }) j += 1
            vEnd = j
          }
        }
        if (vStart >= 0 && nameIs(input, anStart, anLen, name)) {
          var a = vStart
          var b = vEnd
          while (a < b && (input(a) & 0xff) <= ' ') a += 1
          while (b > a && (input(b - 1) & 0xff) <= ' ') b -= 1
          val raw = new String(input, a, b - a, java.nio.charset.StandardCharsets.UTF_8)
          return if (raw.indexOf('&') >= 0) graft.extract.Entities.decode(raw) else raw
        }
      } else j += 1
    }
    null
  }

  private def parseStartTag(input: Array[Byte], i0: Int, n: Int, arena: TokenArena): Int = {
    var j = i0 + 1
    val nameSb = new java.lang.StringBuilder(8)
    while (j < n && (isAsciiLetter(input(j) & 0xff) ||
        (nameSb.length > 0 && { val c = input(j) & 0xff; (c >= '0' && c <= '9') || c == '-' }))) {
      nameSb.append(toLower(input(j) & 0xff).toChar); j += 1
    }
    var flag = 0
    var selfClose = false
    // attribute scan — allocation-free: attr names are matched byte-wise
    // against the only three we care about (href/class/id), values are
    // scanned in place (no String per attribute)
    while (j < n && input(j) != '>') {
      val c = input(j) & 0xff
      if (c == '/' && j + 1 < n && input(j + 1) == '>') { selfClose = true; j += 1 }
      else if (isAsciiLetter(c)) {
        val anStart = j
        while (j < n && { val cc = input(j) & 0xff
          isAsciiLetter(cc) || (cc >= '0' && cc <= '9') || cc == '-' || cc == '_' }) j += 1
        val anLen = j - anStart
        // skip ws
        while (j < n && (input(j) == ' ' || input(j) == '\t' || input(j) == '\n' || input(j) == '\r')) j += 1
        var vStart = -1
        var vEnd = -1
        if (j < n && input(j) == '=') {
          j += 1
          while (j < n && (input(j) == ' ' || input(j) == '\t' || input(j) == '\n' || input(j) == '\r')) j += 1
          if (j < n && (input(j) == '"' || input(j) == '\'')) {
            val quote = input(j); j += 1
            vStart = j
            while (j < n && input(j) != quote) j += 1
            vEnd = j
            if (j < n) j += 1
          } else {
            vStart = j
            while (j < n && { val cc = input(j) & 0xff; cc != ' ' && cc != '\t' && cc != '\n' && cc != '\r' && cc != '>' }) j += 1
            vEnd = j
          }
        }
        if (vStart >= 0) {
          if (nameIs(input, anStart, anLen, "href")) flag |= TokenFlags.HasHref
          else if (nameIs(input, anStart, anLen, "colspan")) {
            if ((flag & TokenFlags.ColspanSeen) == 0) {
              flag |= TokenFlags.ColspanSeen | TokenFlags.packSpan(
                colspanValue(parseUInt(input, vStart, vEnd)), TokenFlags.ColspanShift)
            }
          } else if (nameIs(input, anStart, anLen, "rowspan")) {
            if ((flag & TokenFlags.RowspanSeen) == 0) {
              flag |= TokenFlags.RowspanSeen | TokenFlags.packSpan(
                rowspanValue(parseUInt(input, vStart, vEnd)), TokenFlags.RowspanShift)
            }
          }
          else if (nameIs(input, anStart, anLen, "encoding")) {
            if (containsTexWord(input, vStart, vEnd)) flag |= TokenFlags.TexEncoding
          }
          else if (nameIs(input, anStart, anLen, "class") || nameIs(input, anStart, anLen, "id")) {
            var k = 0
            var done = false
            while (k < boilerHintWords.length && !done) {
              if (containsAscii(input, vStart, vEnd, boilerHintWords(k))) {
                flag |= TokenFlags.HintBoiler; done = true
              }
              k += 1
            }
            if (!done) {
              k = 0
              while (k < contentHintWords.length && !done) {
                if (containsAscii(input, vStart, vEnd, contentHintWords(k))) {
                  flag |= TokenFlags.HintContent; done = true
                }
                k += 1
              }
            }
          }
        }
      } else j += 1
    }
    if (j >= n) return -1 // no '>' — EOF in tag; caller drops '<'..EOF
    j += 1 // consume '>'
    val name = nameSb.toString
    // browsers IGNORE the self-closing slash on non-void HTML elements
    // (HTML5 tree construction): '<div id=x/>' OPENS a div whose content
    // follows as children — honoring the slash would orphan the content as
    // siblings and lose the tag's class/id hints for classification; for
    // rawtext elements the same rule means '<script src=x/>' opens a script
    // whose body must be skipped. Only genuinely void elements self-close.
    val kind = if (HtmlNames.isVoid(name)) Tok.SelfClose else Tok.Start
    arena.add(kind, i0, j, arena.intern(name), flag)
    j
  }

  /** Leading unsigned integer of a byte range, HTML-attribute style: skip
    * leading whitespace, read digits, ignore trailing junk ("2px" → 2);
    * absent digits → -1 (caller defaults). Capped at 1023. */
  private def parseUInt(input: Array[Byte], from: Int, to: Int): Int = {
    var i = from
    while (i < to && (input(i) == ' ' || input(i) == '\t')) i += 1
    var v = 0
    var any = false
    while (i < to && input(i) >= '0' && input(i) <= '9' && v < 1024) {
      v = v * 10 + (input(i) - '0'); any = true; i += 1
    }
    if (!any) -1 else math.min(v, 1023)
  }

  /** HTML5 span-attribute semantics: colspan 0/junk → 1; rowspan junk → 1,
    * but rowspan="0" means "span the remaining rows of the row group" —
    * encoded as the 1023 cap (coverage dies with the table run anyway). */
  private def colspanValue(raw: Int): Int = if (raw <= 0) 1 else raw
  private def rowspanValue(raw: Int): Int =
    if (raw < 0) 1 else if (raw == 0) 1023 else raw

  /** Case-insensitive byte-range equality against an ASCII-lowercase name. */
  @inline private def nameIs(input: Array[Byte], start: Int, len: Int, name: String): Boolean = {
    if (len != name.length) return false
    var k = 0
    while (k < len) {
      if (toLower(input(start + k) & 0xff) != name.charAt(k)) return false
      k += 1
    }
    true
  }

  /** "tex" occurs in the encoding value NOT as the prefix of "text":
    * accepts the MathML annotation conventions ("application/x-tex",
    * "application/x-latex", "TeX", "LaTeX", "text/x-tex") while rejecting
    * plain MIME types ("text/plain", "text/html") whose leading "text"
    * would otherwise satisfy a bare substring match. */
  private def containsTexWord(input: Array[Byte], from: Int, to: Int): Boolean = {
    var i = from
    val limit = to - 3
    while (i <= limit) {
      if (toLower(input(i) & 0xff) == 't' && toLower(input(i + 1) & 0xff) == 'e' &&
          toLower(input(i + 2) & 0xff) == 'x' &&
          (i + 3 >= to || toLower(input(i + 3) & 0xff) != 't')) return true
      i += 1
    }
    false
  }

  /** Case-insensitive ASCII substring search inside a byte range. */
  private def containsAscii(input: Array[Byte], from: Int, to: Int, word: String): Boolean = {
    val m = word.length
    var i = from
    val limit = to - m
    while (i <= limit) {
      var k = 0
      var ok = true
      while (ok && k < m) {
        if (toLower(input(i + k) & 0xff) != word.charAt(k)) ok = false
        k += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  /** Find offset of `</name` (case-insensitive) at or after `from`; n if
    * absent. Per HTML5, the character after the name must end the tag name
    * (whitespace, '/', '>' or EOF) — `</scripty>` must NOT close `<script>`.
    */
  private def findCloseTag(input: Array[Byte], from: Int, n: Int, name: String): Int = {
    var i = from
    val m = name.length
    while (i + m + 1 < n) {
      if (input(i) == '<' && input(i + 1) == '/') {
        var k = 0
        var ok = true
        while (ok && k < m) {
          if (toLower(input(i + 2 + k) & 0xff) != name(k)) ok = false
          k += 1
        }
        if (ok && i + 2 + m < n) {
          val after = input(i + 2 + m) & 0xff
          ok = after == '>' || after == '/' || after == ' ' || after == '\t' ||
            after == '\n' || after == '\r' || after == '\f'
        }
        if (ok) return i
      }
      i += 1
    }
    n
  }
}

/** Static HTML name classes (HTML5 spec lists; public knowledge). */
object HtmlNames {
  private val voidTags = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "param", "source", "track", "wbr")
  private val blockTags = Set("address", "article", "aside", "blockquote", "body",
    "caption", "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html", "li", "main",
    "nav", "ol", "p", "pre", "section", "table", "tbody", "td", "tfoot", "th",
    "thead", "tr", "ul")
  private val skipSubtree = Set("script", "style", "noscript", "svg", "head",
    "iframe", "object", "template")
  private val boilerTags = Set("nav", "header", "footer", "aside")
  private val headingTags = Set("h1", "h2", "h3", "h4", "h5", "h6")
  /** rawtext (script/style) + RCDATA (textarea/title): content is literal
    * text to the matching close tag, and the self-closing slash is ignored */
  private val rawtextTags = Set("script", "style", "textarea", "title")
  /** end tag of these implicitly closes an open sibling of the same name */
  private val autoCloseSibling = Set("p", "li", "td", "th", "tr", "option", "dd", "dt")

  def isVoid(t: String): Boolean = voidTags.contains(t)
  def isBlock(t: String): Boolean = blockTags.contains(t)
  def isSkip(t: String): Boolean = skipSubtree.contains(t)
  def isBoiler(t: String): Boolean = boilerTags.contains(t)
  def isHeading(t: String): Boolean = headingTags.contains(t)
  def isRawtext(t: String): Boolean = rawtextTags.contains(t)
  def autoCloses(t: String): Boolean = autoCloseSibling.contains(t)
}
