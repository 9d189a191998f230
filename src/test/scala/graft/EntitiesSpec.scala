package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{Entities, Html5Table}

/** Complete WHATWG named-reference table (2,125 names incl. multi-codepoint)
  * + legacy bare refs + numeric C1 remap, spec-exact behaviors. */
class EntitiesSpec extends AnyFunSuite {

  test("the table is the complete WHATWG set: 2,125 names, 93 multi-codepoint, 106 bare") {
    assert(Html5Table.withSemi.length == 2125)
    assert(Html5Table.withSemi.map(_._1).distinct.length == 2125)
    val multiCp = Html5Table.withSemi.count { case (_, v) => v.codePointCount(0, v.length) >= 2 }
    assert(multiCp == 93)
    assert(Html5Table.bare.length == 106)
    val semiNames = Html5Table.withSemi.map(_._1).toSet
    assert(Html5Table.bare.forall(semiNames.contains), "every bare name has a ;-form")
    assert(Html5Table.bare.map(_.length).max == 6)
  }

  test("HTML5 long-tail and multi-codepoint references decode") {
    assert(Entities.decode("&NotEqualTilde;") == "\u2242\u0338")
    assert(Entities.decode("&fjlig;") == "fj")
    assert(Entities.decode("&bnequiv;") == "\u2261\u20E5")
    assert(Entities.decode("&acE;") == "\u223E\u0333")
    assert(Entities.decode("&ThickSpace;") == "\u205F\u200A")
    assert(Entities.decode("&Rarrtl;") == "\u2916")
    assert(Entities.decode("&CounterClockwiseContourIntegral;") == "\u2233")
    assert(Entities.decode("&nvlt;") == "<\u20D2") // multi-cp starting with ASCII '<'
    assert(Entities.decode("&UnderBar;") == "_")
  }

  test("the complete HTML 4.01 table decodes (spot checks across all groups)") {
    val cases = Seq(
      // latin-1
      "&nbsp;" -> " ", "&iexcl;" -> "¡", "&THORN;" -> "Þ", "&thorn;" -> "þ",
      "&yuml;" -> "ÿ", "&Agrave;" -> "À", "&oslash;" -> "ø", "&frac34;" -> "¾",
      "&shy;" -> "­", "&eth;" -> "ð", "&Oacute;" -> "Ó",
      // greek
      "&Alpha;" -> "Α", "&Rho;" -> "Ρ", "&Sigma;" -> "Σ", "&Omega;" -> "Ω",
      "&alpha;" -> "α", "&sigmaf;" -> "ς", "&sigma;" -> "σ", "&omega;" -> "ω",
      "&thetasym;" -> "ϑ", "&piv;" -> "ϖ",
      // symbols
      "&rarr;" -> "→", "&hArr;" -> "⇔", "&sum;" -> "∑", "&int;" -> "∫",
      "&ne;" -> "≠", "&le;" -> "≤", "&sube;" -> "⊆", "&oplus;" -> "⊕",
      "&lceil;" -> "⌈", "&rang;" -> "\u27e9", "&spades;" -> "♠", "&loz;" -> "◊",
      "&infin;" -> "∞", "&there4;" -> "∴", "&weierp;" -> "℘", "&alefsym;" -> "ℵ",
      // specials
      "&OElig;" -> "Œ", "&scaron;" -> "š", "&Yuml;" -> "Ÿ", "&circ;" -> "ˆ",
      "&ensp;" -> " ", "&zwnj;" -> "‌", "&permil;" -> "‰",
      "&lsaquo;" -> "‹", "&euro;" -> "€", "&apos;" -> "'", "&bdquo;" -> "„")
    for ((in, want) <- cases)
      assert(Entities.decode(in) == want, s"$in should decode to $want")
  }

  test("numeric refs: decimal, hex, and the HTML5 C1 windows-1252 remap") {
    assert(Entities.decode("&#65;&#x42;&#x1F600;") == "AB😀")
    assert(Entities.decode("&#147;x&#148; &#133; &#150;") == "“x” … –")
    // NUL / out-of-range (incl. zero-padded overflow) → U+FFFD, as browsers emit
    assert(Entities.decode("&#0; &#x110000;") == "� �")
    assert(Entities.decode("&#0000000914;") == "Β") // zero-padded, browsers decode
    assert(Entities.decode("&#99999999999999999999;") == "�") // overflow clamps to FFFD
    // any digit count is consumed (browsers have no cap): 36 hex digits
    assert(Entities.decode("&#x" + ("0" * 33) + "41;") == "A")
    assert(Entities.decode("&#" + ("0" * 40) + "914;") == "\u0392")
    // surrogate range → U+FFFD (a lone surrogate would be an ill-formed String)
    assert(Entities.decode("&#xD800;&#xDFFF;&#55357;") == "���")
    // missing trailing semicolon: parse error per spec, but the reference
    // still resolves — exactly what browsers render
    assert(Entities.decode("he said &#147quoted&#148 ok") == "he said \u201Cquoted\u201D ok")
    assert(Entities.decode("A&#x42C") == "A\u042C") // hex form, bare
    assert(Entities.decode("&# x") == "&# x") // no digits: literal
  }

  test("bare legacy refs decode without a semicolon; non-legacy don't") {
    assert(Entities.decode("Tom &amp Jerry") == "Tom & Jerry")
    assert(Entities.decode("&copy 1999") == "© 1999")
    assert(Entities.decode("&nbsp&nbsp") == "  ")
    assert(Entities.decode("x&sup2 = y") == "x² = y")
    assert(Entities.decode("&AMP&LT&GT") == "&<>")
    // rarr is NOT legacy: bare form passes through
    assert(Entities.decode("a &rarr b") == "a &rarr b")
    assert(Entities.decode("&rarr; works") == "→ works")
  }

  test("longest-prefix rule for names terminated by ';' but unknown") {
    assert(Entities.decode("&notanentity;") == "¬anentity;")
    assert(Entities.decode("&notin;") == "∉") // the full name wins over the 'not' prefix
    assert(Entities.decode("&zzz;") == "&zzz;")
    assert(Entities.decode("&ampersand") == "&ersand") // longest legacy prefix 'amp'
  }

  test("case sensitivity is spec-exact") {
    assert(Entities.decode("&Auml;&auml;") == "Ää")
    assert(Entities.decode("&Sigma;&sigma;") == "Σσ")
    assert(Entities.decode("&Rarr;") == "↠")
    assert(Entities.decode("&Xscr;&xscr;") == "𝒳𝓍") // script letters differ by case (non-BMP)
  }

  test("decode is non-destructive on plain text and stray ampersands") {
    val s = "a & b && c &; &# &x20; 100% plain"
    assert(Entities.decode(s) == s)
  }

  test("fuzz: random ampersand soup never throws, output is deterministic and well-formed") {
    val rng = new java.util.Random(1234L)
    val pieces = Array("&", "#", ";", "x", "amp", "lt", "not", "0", "9", "A", "f",
      "NotEqualTilde", "zzz", " ", "Β", "00000000000000000000000000000000000001")
    for (_ <- 0 until 3000) {
      val sb = new StringBuilder
      for (_ <- 0 until (1 + rng.nextInt(12))) sb.append(pieces(rng.nextInt(pieces.length)))
      val s = sb.toString
      val a = Entities.decode(s)
      val b = Entities.decode(s)
      assert(a == b)
      // output must be a well-formed UTF-16 String (no lone surrogates — the
      // parquet/UTF-8 byte-identity contract)
      var i = 0
      while (i < a.length) {
        val c = a.charAt(i)
        if (Character.isHighSurrogate(c))
          assert(i + 1 < a.length && Character.isLowSurrogate(a.charAt(i + 1)), s"lone high surrogate in decode of: $s")
        else assert(!Character.isLowSurrogate(c) ||
          (i > 0 && Character.isHighSurrogate(a.charAt(i - 1))), s"lone low surrogate in decode of: $s")
        i += 1
      }
    }
  }
}
