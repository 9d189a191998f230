package graft.extract

/** HTML character-reference decoding (the graft's CTCLabelDecode: a canonical
  * "index sequence → chars via dict" pass; ppocr/postprocess/rec_postprocess.py:
  * 195-226 — and the char-dict analog of ppocr/utils/dict/ as reference data:
  * complete, static, broadcast-free because it compiles into the kernel).
  *
  * Coverage (all from the public HTML 4.01 / HTML5 / XML specs):
  *  - the complete HTML 4.01 named set (252 names: Latin-1, symbols/Greek,
  *    markup/i18n specials) plus XML's `apos` — generated from the spec's
  *    codepoint tables below, not hand-copied pair by pair;
  *  - numeric references `&#D;` / `&#xH;`, with the HTML5 C1 remap (0x80-0x9F
  *    resolve via windows-1252, e.g. `&#147;` → '“') — crawled pages use
  *    these constantly;
  *  - bare legacy references without the trailing semicolon (`&amp`, `&copy`,
  *    `&nbsp` …) for the HTML5 legacy set (the HTML 2.0/3.2-era names),
  *    longest-prefix matched exactly like browsers do in text content;
  *  - unknown references pass through verbatim (never destructive).
  */
object Entities {

  // Latin-1 names for codepoints 160..255, in codepoint order (HTML 4.01 §24.2)
  private val latin1Names: Array[String] = Array(
    "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
    "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr",
    "deg", "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot",
    "cedil", "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
    "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig", "Ccedil",
    "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc", "Iuml",
    "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml", "times",
    "Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml", "Yacute", "THORN", "szlig",
    "agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig", "ccedil",
    "egrave", "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
    "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml", "divide",
    "oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")

  // Greek letter names (HTML 4.01 §24.3): capitals 913.. (gap at 930), lower 945..969
  private val greekCaps: Array[String] = Array(
    "Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Zeta", "Eta", "Theta",
    "Iota", "Kappa", "Lambda", "Mu", "Nu", "Xi", "Omicron", "Pi", "Rho")
  private val greekCaps2: Array[String] = Array( // 931..937
    "Sigma", "Tau", "Upsilon", "Phi", "Chi", "Psi", "Omega")
  private val greekLower: Array[String] = Array( // 945..969 (sigmaf=962, sigma=963)
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigmaf", "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega")

  // remaining symbol + special names with explicit codepoints (HTML 4.01 §24.3/§24.4 + apos)
  private val explicit: Array[(String, Int)] = Array(
    "quot" -> 34, "amp" -> 38, "apos" -> 39, "lt" -> 60, "gt" -> 62,
    "OElig" -> 338, "oelig" -> 339, "Scaron" -> 352, "scaron" -> 353,
    "Yuml" -> 376, "fnof" -> 402, "circ" -> 710, "tilde" -> 732,
    "thetasym" -> 977, "upsih" -> 978, "piv" -> 982,
    "ensp" -> 8194, "emsp" -> 8195, "thinsp" -> 8201, "zwnj" -> 8204,
    "zwj" -> 8205, "lrm" -> 8206, "rlm" -> 8207, "ndash" -> 8211,
    "mdash" -> 8212, "lsquo" -> 8216, "rsquo" -> 8217, "sbquo" -> 8218,
    "ldquo" -> 8220, "rdquo" -> 8221, "bdquo" -> 8222, "dagger" -> 8224,
    "Dagger" -> 8225, "bull" -> 8226, "hellip" -> 8230, "permil" -> 8240,
    "prime" -> 8242, "Prime" -> 8243, "lsaquo" -> 8249, "rsaquo" -> 8250,
    "oline" -> 8254, "frasl" -> 8260, "euro" -> 8364, "image" -> 8465,
    "weierp" -> 8472, "real" -> 8476, "trade" -> 8482, "alefsym" -> 8501,
    "larr" -> 8592, "uarr" -> 8593, "rarr" -> 8594, "darr" -> 8595,
    "harr" -> 8596, "crarr" -> 8629, "lArr" -> 8656, "uArr" -> 8657,
    "rArr" -> 8658, "dArr" -> 8659, "hArr" -> 8660,
    "forall" -> 8704, "part" -> 8706, "exist" -> 8707, "empty" -> 8709,
    "nabla" -> 8711, "isin" -> 8712, "notin" -> 8713, "ni" -> 8715,
    "prod" -> 8719, "sum" -> 8721, "minus" -> 8722, "lowast" -> 8727,
    "radic" -> 8730, "prop" -> 8733, "infin" -> 8734, "ang" -> 8736,
    "and" -> 8743, "or" -> 8744, "cap" -> 8745, "cup" -> 8746,
    "int" -> 8747, "there4" -> 8756, "sim" -> 8764, "cong" -> 8773,
    "asymp" -> 8776, "ne" -> 8800, "equiv" -> 8801, "le" -> 8804,
    "ge" -> 8805, "sub" -> 8834, "sup" -> 8835, "nsub" -> 8836,
    "sube" -> 8838, "supe" -> 8839, "oplus" -> 8853, "otimes" -> 8855,
    "perp" -> 8869, "sdot" -> 8901, "lceil" -> 8968, "rceil" -> 8969,
    // lang/rang: HTML5 remapped these to the mathematical angle brackets
    // U+27E8/U+27E9 (HTML 4.01 said U+2329/232A); browsers emit the former
    "lfloor" -> 8970, "rfloor" -> 8971, "lang" -> 10216, "rang" -> 10217,
    "loz" -> 9674, "spades" -> 9824, "clubs" -> 9827, "hearts" -> 9829,
    "diams" -> 9830)

  /** HTML5 second tier: the frequently-seen additions beyond the 4.01 table
    * (ASCII punctuation names, alias names, fractions, spaces, common
    * symbols). A curated SURE subset of the ~2.2k HTML5 list — names only go
    * in here with a verified codepoint; unknown names still pass through
    * verbatim rather than decode wrongly. */
  private val html5: Array[(String, Int)] = Array(
    // ASCII punctuation names
    "excl" -> 33, "num" -> 35, "dollar" -> 36, "percnt" -> 37,
    "lpar" -> 40, "rpar" -> 41, "ast" -> 42, "midast" -> 42, "plus" -> 43,
    "comma" -> 44, "period" -> 46, "sol" -> 47, "colon" -> 58, "semi" -> 59,
    "equals" -> 61, "quest" -> 63, "commat" -> 64, "lsqb" -> 91, "bsol" -> 92,
    "rsqb" -> 93, "Hat" -> 94, "lowbar" -> 95, "grave" -> 96, "lbrace" -> 123,
    "verbar" -> 124, "rbrace" -> 125,
    // alias names for 4.01 codepoints
    "TRADE" -> 8482, "leq" -> 8804, "geq" -> 8805, "subset" -> 8834,
    "supset" -> 8835, "subseteq" -> 8838, "supseteq" -> 8839, "wedge" -> 8743,
    "vee" -> 8744, "emptyset" -> 8709, "ddagger" -> 8225,
    "NonBreakingSpace" -> 160, "ThinSpace" -> 8201, "ohm" -> 937,
    "angst" -> 197, "OpenCurlyQuote" -> 8216, "CloseCurlyQuote" -> 8217,
    "OpenCurlyDoubleQuote" -> 8220, "CloseCurlyDoubleQuote" -> 8221,
    // spaces and dashes
    "hairsp" -> 8202, "puncsp" -> 8200, "numsp" -> 8199, "emsp13" -> 8196,
    "emsp14" -> 8197, "hyphen" -> 8208, "dash" -> 8208, "horbar" -> 8213,
    "Vert" -> 8214,
    // symbols
    "star" -> 9734, "starf" -> 9733, "check" -> 10003, "cross" -> 10007,
    "male" -> 9794, "female" -> 9792, "phone" -> 9742, "numero" -> 8470,
    "copysr" -> 8471, "flat" -> 9837, "sharp" -> 9839,
    // arrows and math beyond 4.01
    "Larr" -> 8606, "Rarr" -> 8608, "mapsto" -> 8614, "ll" -> 8810,
    "gg" -> 8811, "setminus" -> 8726, "coprod" -> 8720,
    // letterlike
    "imath" -> 305, "jmath" -> 567, "ell" -> 8467, "hbar" -> 8463,
    "planck" -> 8463, "naturals" -> 8469, "reals" -> 8477,
    "rationals" -> 8474, "integers" -> 8484, "complexes" -> 8450,
    // fractions U+2153..U+215E
    "frac13" -> 8531, "frac23" -> 8532, "frac15" -> 8533, "frac25" -> 8534,
    "frac35" -> 8535, "frac45" -> 8536, "frac16" -> 8537, "frac56" -> 8538,
    "frac18" -> 8539, "frac38" -> 8540, "frac58" -> 8541, "frac78" -> 8542)

  private def cp(c: Int): String = new String(Character.toChars(c))

  private[extract] val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](1024)
    var i = 0
    while (i < latin1Names.length) { m.put(latin1Names(i), cp(160 + i)); i += 1 }
    i = 0
    while (i < greekCaps.length) { m.put(greekCaps(i), cp(913 + i)); i += 1 }
    i = 0
    while (i < greekCaps2.length) { m.put(greekCaps2(i), cp(931 + i)); i += 1 }
    i = 0
    while (i < greekLower.length) { m.put(greekLower(i), cp(945 + i)); i += 1 }
    for ((n, c) <- explicit) m.put(n, cp(c))
    for ((n, c) <- html5) m.put(n, cp(c))
    // HTML5 legacy uppercase aliases (semicolon or bare)
    for (n <- Array("AMP" -> 38, "LT" -> 60, "GT" -> 62, "QUOT" -> 34,
      "COPY" -> 169, "REG" -> 174)) m.put(n._1, cp(n._2))
    m
  }

  /** Names that browsers accept WITHOUT a trailing semicolon in text content
    * (the HTML5 legacy set: all HTML 2.0/3.2-era names = the Latin-1 table +
    * the markup four + their uppercase aliases). */
  private val legacy: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](256)
    latin1Names.foreach(s.add)
    Array("amp", "lt", "gt", "quot", "AMP", "LT", "GT", "QUOT", "COPY", "REG")
      .foreach(s.add)
    s
  }
  private val maxLegacyLen = 6 // frac12/frac14/frac34/curren/brvbar/iquest/plusmn…

  /** HTML5 numeric-reference C1 remap: 0x80–0x9F resolve through the
    * windows-1252 table (the spec's explicit compat rule). */
  private val c1Remap: Array[String] = {
    val cps = Array(
      8364, 129, 8218, 402, 8222, 8230, 8224, 8225, 710, 8240, 352, 8249,
      338, 141, 381, 143, 144, 8216, 8217, 8220, 8221, 8226, 8211, 8212,
      732, 8482, 353, 8250, 339, 157, 382, 376)
    cps.map(cp)
  }

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def numeric(cp0: Int): String = {
    if (cp0 >= 0x80 && cp0 <= 0x9f) return c1Remap(cp0 - 0x80)
    // HTML5: surrogate-range references decode to U+FFFD — emitting a lone
    // UTF-16 surrogate would make an ill-formed String whose parquet/UTF-8
    // round trip ('?' substitution) breaks the byte-identity contract
    if (cp0 >= 0xd800 && cp0 <= 0xdfff) return "�"
    if (cp0 > 0 && Character.isValidCodePoint(cp0)) new String(Character.toChars(cp0))
    else null
  }

  /** If a decodable entity starts at `s(i)` (== '&'), return its replacement
    * string; `endAfter(0)` receives the index just past the reference (past
    * the ';' for full refs, past the name for bare legacy refs). Returns null
    * when not an entity (caller keeps the literal '&'). */
  def decodeAt(s: String, i: Int, endAfter: Array[Int]): String = {
    val n = s.length
    if (i + 1 >= n) return null
    if (s.charAt(i + 1) == '#') {
      val semi = s.indexOf(';', i + 1)
      if (semi <= i || semi - i > 12) return null
      val body = s.substring(i + 2, semi)
      var replaced: String = null
      if (body.length > 1 && (body.charAt(0) == 'x' || body.charAt(0) == 'X')) {
        try replaced = numeric(Integer.parseInt(body.substring(1), 16))
        catch { case _: NumberFormatException => () }
      } else if (body.nonEmpty) {
        try replaced = numeric(Integer.parseInt(body))
        catch { case _: NumberFormatException => () }
      }
      if (replaced != null) endAfter(0) = semi + 1
      replaced
    } else {
      // scan the alphanumeric run after '&'
      var j = i + 1
      while (j < n && j - i <= 32 && isAlnum(s.charAt(j))) j += 1
      if (j == i + 1) return null
      val run = s.substring(i + 1, j)
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
