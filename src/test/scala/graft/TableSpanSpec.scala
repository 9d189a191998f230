package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Extractor

/** colspan/rowspan occupancy in table assembly (≡ the reference's span-aware
  * structure decode, ppocr/postprocess/table_postprocess.py:60-94). */
class TableSpanSpec extends AnyFunSuite {

  private def extract(body: String): String =
    Extractor.extract("u", s"<html><body>$body</body></html>".getBytes("UTF-8")).text

  test("span-free tables keep the pre-span byte format") {
    val t = "<table><tr><td>a1</td><td>b1</td></tr><tr><td>a2</td><td>b2</td></tr></table>"
    assert(extract(t) == "a1 | b1\na2 | b2")
  }

  test("rowspan leaves an empty slot in the covered row") {
    val t = """<table>
      |<tr><td rowspan="2">A</td><td>B</td><td>C</td></tr>
      |<tr><td>D</td><td>E</td></tr>
      |<tr><td>F</td><td>G</td><td>H</td></tr>
      |</table>""".stripMargin
    // row 2's D/E sit under B/C, with A's column left empty
    assert(extract(t) == "A | B | C\n | D | E\nF | G | H")
  }

  test("colspan advances the column cursor (no phantom slots)") {
    val t = """<table>
      |<tr><td>A</td><td>B</td><td>C</td></tr>
      |<tr><td colspan="2">D</td><td>E</td></tr>
      |</table>""".stripMargin
    assert(extract(t) == "A | B | C\nD | E")
  }

  test("rowspan + colspan combined") {
    val t = """<table>
      |<tr><td rowspan="2" colspan="2">A</td><td>B</td></tr>
      |<tr><td>C</td></tr>
      |<tr><td>D</td><td>E</td><td>F</td></tr>
      |</table>""".stripMargin
    // row 1: C sits in column 2 under B; columns 0-1 covered by A
    assert(extract(t) == "A | B\n |  | C\nD | E | F")
  }

  test("rowspan=3 covers two following rows") {
    val t = """<table>
      |<tr><td rowspan="3">A</td><td>B</td></tr>
      |<tr><td>C</td></tr>
      |<tr><td>D</td></tr>
      |<tr><td>E</td><td>F</td></tr>
      |</table>""".stripMargin
    assert(extract(t) == "A | B\n | C\n | D\nE | F")
  }

  test("junk span values behave like 1; huge values clamp") {
    val t = """<table>
      |<tr><td rowspan="abc">A</td><td rowspan="junk">B</td></tr>
      |<tr><td>C</td><td>D</td></tr>
      |</table>""".stripMargin
    assert(extract(t) == "A | B\nC | D")
    val t2 = """<table><tr><td colspan="99999">A</td></tr><tr><td>B</td></tr></table>"""
    assert(extract(t2) == "A\nB")
  }

  test("rowspan=0 spans the remaining rows (HTML5), not just one") {
    val t = """<table>
      |<tr><td rowspan="0">A</td><td>B</td></tr>
      |<tr><td>C</td></tr>
      |<tr><td>D</td></tr>
      |</table>""".stripMargin
    assert(extract(t) == "A | B\n | C\n | D")
  }

  test("duplicate span attributes: first one wins (browser rule)") {
    val t = """<table>
      |<tr><td rowspan="2" rowspan="5">A</td><td colspan="1" colspan="3">B</td><td>C</td></tr>
      |<tr><td>D</td><td>E</td></tr>
      |<tr><td>F</td><td>G</td><td>H</td></tr>
      |</table>""".stripMargin
    assert(extract(t) == "A | B | C\n | D | E\nF | G | H")
  }

  test("trailing covered column keeps its slot") {
    val t = """<table>
      |<tr><td>A</td><td rowspan="2">B</td></tr>
      |<tr><td>C</td></tr>
      |</table>""".stripMargin
    assert(extract(t) == "A | B\nC | ")
  }

  test("nested inline markup inside a spanned cell still counts as one cell") {
    val t = """<table>
      |<tr><td rowspan="2"><b>A</b> bold</td><td>B</td></tr>
      |<tr><td>C</td></tr>
      |</table>""".stripMargin
    assert(extract(t) == "A bold | B\n | C")
  }
}
