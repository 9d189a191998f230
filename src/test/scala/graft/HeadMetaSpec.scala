package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.htmltok.{HtmlTokenizer, TokenArena}
import graft.pipeline.CorpusSource

/** Head-metadata extraction (headMeta / graft_head_meta / x24): WAT
  * Head-record fields with first-wins duplicate handling, entity decode,
  * case-insensitive rel/name matching, and script-body phantom immunity —
  * plus the closed-form authored corpus end to end.
  */
class HeadMetaSpec extends AnyFunSuite {

  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def meta(html: String) =
    HtmlTokenizer.headMeta(html.getBytes(StandardCharsets.UTF_8), new TokenArena())

  test("title: RCDATA body, entity decode, whitespace normalize, first wins") {
    val m = meta("<html><head><title> A &amp;  B </title><title>WRONG</title></head></html>")
    assert(m.title == "A & B")
    assert(meta("<title></title>").title == "")
    assert(meta("<p>no title</p>").title == null)
    // markup inside title is RCDATA — literal text, not tags
    assert(meta("<title>a <b> c</title>").title == "a <b> c")
  }

  test("meta description/robots: first wins; valueless content is absent") {
    val m = meta(
      """<meta name="description" content="first &amp; real">""" +
        """<meta name="description" content="WRONG">""" +
        """<meta name="robots" content="noindex">""")
    assert(m.description == "first & real")
    assert(m.robots == "noindex")
    assert(meta("""<meta name="description">""").description == null)
    assert(meta("""<META NAME="Description" CONTENT="caps">""").description == "caps")
  }

  test("og properties and html lang") {
    val m = meta(
      """<html lang="en-US"><head><meta property="og:title" content="OT">""" +
        """<meta property="og:description" content="OD"></head></html>""")
    assert(m.ogTitle == "OT" && m.ogDescription == "OD" && m.lang == "en-US")
    assert(meta("<html><p>x</p></html>").lang == null)
  }

  test("link rel=canonical: case-insensitive rel, href entity-decoded; first wins") {
    val m = meta(
      """<link rel="CANONICAL" href="/c?a=1&amp;b=2">""" +
        """<link rel="canonical" href="/WRONG">""" +
        """<link rel="stylesheet" href="/ignored.css">""")
    assert(m.canonical == "/c?a=1&b=2")
  }

  test("script/style bodies cannot fake metadata") {
    val m = meta(
      """<script>var s='<meta name="description" content="phantom">';</script>""" +
        """<style>/*<title>nope</title>*/</style>""" +
        """<meta name="description" content="real">""")
    assert(m.description == "real")
    assert(m.title == null)
  }

  test("x24 corpus: every field matches its closed form") {
    val n = 40
    val rows = SparkEntry.queries("x24_head_meta")(spark, "").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 280) // the query's corpus size; closed form checked on the first n
    (0 until n).foreach { i =>
      val host = s"m${i % 5}.example.org"
      val r = rows(s"https://$host/page$i")
      assert(r.getString(1) == s"Site ${i % 5} & Review $i", s"title $i")
      assert(r.getString(2) == s"Summary of article $i & context", s"desc $i")
      val canon = if (i % 2 == 0) s"https://$host/canon/$i" else null
      assert(r.getString(3) == canon, s"canonical $i")
      val robots = if (i % 3 == 0) "noindex, follow" else null
      assert(r.getString(4) == robots, s"robots $i")
      val ogT = if (i % 5 != 0) s"OG Article $i" else null
      val ogD = if (i % 5 != 0) s"og summary $i" else null
      assert(r.getString(5) == ogT && r.getString(6) == ogD, s"og $i")
      val lang = if (i % 7 != 0) CorpusSource.metaLang(i) else null
      assert(r.getString(7) == lang, s"lang $i")
    }
  }

  test("SQL surface: graft_head_meta registered and field-addressable") {
    graft.expressions.GraftExpressions.register(spark)
    CorpusSource.metaPages(spark, 12).toDF().createOrReplaceTempView("meta_pages")
    val got = spark.sql(
      """SELECT url, graft_head_meta(html).title AS t,
        |       graft_head_meta(html).lang AS l
        |FROM meta_pages WHERE url LIKE '%page3' """.stripMargin).collect()
    assert(got.length == 1)
    assert(got(0).getString(1) == "Site 3 & Review 3")
    assert(got(0).getString(2) == CorpusSource.metaLang(3))
  }
}
