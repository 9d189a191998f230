package graft.extract

/** HTML character-reference decoding (the graft's CTCLabelDecode: a canonical
  * "index sequence → chars via dict" pass; ppocr/postprocess/rec_postprocess.py:
  * 195-226 — and the char-dict analog of ppocr/utils/dict/ as reference data:
  * complete, static, broadcast-free because it compiles into the kernel).
  *
  * Coverage (all from the public WHATWG HTML standard §13.5 / ISO HTML specs):
  *  - the COMPLETE HTML5 named set ([[Html5Table]]): 2,125 semicolon names
  *    including the 93 multi-codepoint references (`&NotEqualTilde;` →
  *    U+2242 U+0338, `&fjlig;` → "fj", …), generated from the spec's
  *    entities.json data — not hand-copied pair by pair;
  *  - numeric references `&#D;` / `&#xH;` with the HTML5 compat rules: the
  *    C1 remap (0x80-0x9F resolve via windows-1252, e.g. `&#147;` → '“'),
  *    any digit count (value-clamped), the trailing semicolon OPTIONAL
  *    (missing-semicolon is a parse error whose reference still resolves),
  *    NUL / surrogate / out-of-range → U+FFFD — exactly as browsers emit;
  *  - bare legacy references without the trailing semicolon (`&amp`, `&copy`,
  *    `&nbsp` …) for the HTML5 legacy set (the 106 spec-listed names),
  *    longest-prefix matched exactly like browsers do in text content;
  *  - unknown NAMED references pass through verbatim (never destructive).
  */
object Entities {

  private[extract] val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](4096)
    for ((n, v) <- Html5Table.withSemi) m.put(n, v)
    m
  }

  /** Names that browsers accept WITHOUT a trailing semicolon in text content
    * (the HTML5 legacy set, spec-complete: Latin-1 names, the markup four,
    * their case aliases — 106 names). */
  private val legacy: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](256)
    Html5Table.bare.foreach(s.add)
    s
  }
  private val maxLegacyLen: Int = Html5Table.bare.map(_.length).max // 6

  /** HTML5 numeric-reference C1 remap: 0x80–0x9F resolve through the
    * windows-1252 table (the spec's explicit compat rule). */
  private val c1Remap: Array[String] = {
    val cps = Array(
      8364, 129, 8218, 402, 8222, 8230, 8224, 8225, 710, 8240, 352, 8249,
      338, 141, 381, 143, 144, 8216, 8217, 8220, 8221, 8226, 8211, 8212,
      732, 8482, 353, 8250, 339, 157, 382, 376)
    cps.map(c => new String(Character.toChars(c)))
  }

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def numeric(cp0: Long): String = {
    if (cp0 >= 0x80 && cp0 <= 0x9f) return c1Remap(cp0.toInt - 0x80)
    // HTML5: NUL, surrogate-range, and out-of-range references all decode to
    // U+FFFD — emitting a lone UTF-16 surrogate would make an ill-formed
    // String whose parquet/UTF-8 round trip ('?' substitution) breaks the
    // byte-identity contract; browsers emit U+FFFD for all three cases
    if (cp0 == 0 || cp0 > 0x10FFFFL || (cp0 >= 0xd800 && cp0 <= 0xdfff)) "�"
    else new String(Character.toChars(cp0.toInt))
  }

  /** If a decodable entity starts at `s(i)` (== '&'), return its replacement
    * string; `endAfter(0)` receives the index just past the reference (past
    * the ';' for full refs, past the name for bare legacy refs). Returns null
    * when not an entity (caller keeps the literal '&'). */
  def decodeAt(s: CharSequence, i: Int, endAfter: Array[Int]): String = {
    val n = s.length
    if (i + 1 >= n) return null
    if (s.charAt(i + 1) == '#') {
      // scan the digit run explicitly — browsers consume ANY digit count
      // (zero-padded refs like &#0000000914; are routine); the accumulator
      // clamps once out of range so arbitrarily long runs stay exact
      var j = i + 2
      var hex = false
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hex = true; j += 1 }
      val start = j
      var cp0 = 0L
      while (j < n && {
        val c = s.charAt(j)
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
          else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (d >= 0) {
          cp0 = cp0 * (if (hex) 16 else 10) + d
          if (cp0 > 0x110000L) cp0 = 0x110001L // clamp: already out of range
          true
        } else false
      }) j += 1
      if (j == start) return null
      // HTML5: a missing trailing semicolon is a parse error whose reference
      // STILL resolves — browsers render "&#147quoted&#148" as curly-quoted
      endAfter(0) = if (j < n && s.charAt(j) == ';') j + 1 else j
      numeric(cp0)
    } else {
      // scan the alphanumeric run after '&'
      var j = i + 1
      while (j < n && j - i <= 32 && isAlnum(s.charAt(j))) j += 1
      if (j == i + 1) return null
      val run = s.subSequence(i + 1, j).toString
      if (j < n && s.charAt(j) == ';') {
        val rep = named.get(run)
        if (rep != null) { endAfter(0) = j + 1; return rep }
      }
      // bare legacy reference: longest matching prefix of the run
      var k = math.min(run.length, maxLegacyLen)
      while (k >= 2) {
        val p = if (k == run.length) run else run.substring(0, k)
        if (legacy.contains(p)) { endAfter(0) = i + 1 + k; return named.get(p) }
        k -= 1
      }
      null
    }
  }

  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    val endAfter = new Array[Int](1)
    var last = 0
    while (i >= 0) {
      val replaced = decodeAt(s, i, endAfter)
      if (replaced != null) {
        sb.append(s, last, i).append(replaced)
        last = endAfter(0)
        i = s.indexOf('&', endAfter(0))
      } else {
        i = s.indexOf('&', i + 1)
      }
    }
    sb.append(s, last, s.length)
    sb.toString
  }
}
