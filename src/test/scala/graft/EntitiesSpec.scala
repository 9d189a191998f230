package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Entities

/** Full named-reference table: HTML 4.01's 252 names + apos + legacy bare
  * refs + numeric C1 remap, spec-exact behaviors. */
class EntitiesSpec extends AnyFunSuite {

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
    assert(Entities.decode("&#0; &#x110000;") == "&#0; &#x110000;") // invalid pass through
    // surrogate range → U+FFFD (a lone surrogate would be an ill-formed String)
    assert(Entities.decode("&#xD800;&#xDFFF;&#55357;") == "���")
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
    assert(Entities.decode("&Rarr;") == "↠") // HTML5 second tier
    assert(Entities.decode("&Rarrtl;") == "&Rarrtl;") // beyond the curated set: pass through
  }

  test("decode is non-destructive on plain text and stray ampersands") {
    val s = "a & b && c &; &# &x20; 100% plain"
    assert(Entities.decode(s) == s)
  }
}
