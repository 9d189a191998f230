package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sitemaps
import graft.functions.Sitemaps.Entry
import graft.htmltok.TokenArena
import graft.pipeline.CorpusSource

/** Sitemap ingestion (sitemaps.org protocol) and the x26 frontier
  * composition: urlset vs sitemapindex, CDATA-verbatim locs, entity decode,
  * whitespace trim, missing lastmod — then canonicalize + robots-gate.
  */
class SitemapSpec extends AnyFunSuite {

  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def parse(xml: String): Vector[Entry] =
    Sitemaps.parse(xml.getBytes(StandardCharsets.UTF_8), new TokenArena())

  test("urlset: loc + lastmod, missing lastmod, entity decode, ws trim") {
    val got = parse(
      """<?xml version="1.0"?><urlset>
        |<url><loc>https://a.org/x</loc><lastmod>2024-01-02</lastmod></url>
        |<url><loc> https://a.org/q?a=1&amp;b=2 </loc></url>
        |</urlset>""".stripMargin)
    assert(got == Vector(
      Entry("https://a.org/x", "2024-01-02", index = false),
      Entry("https://a.org/q?a=1&b=2", null, index = false)))
  }

  test("CDATA loc is verbatim (no entity decode inside CDATA)") {
    val got = parse("<urlset><url><loc><![CDATA[https://a.org/raw&amp;lit]]></loc></url></urlset>")
    assert(got == Vector(Entry("https://a.org/raw&amp;lit", null, index = false)))
  }

  test("loc split across text/CDATA fragments concatenates (no truncation)") {
    val got = parse("<urlset><url><loc>https://a.org/?a=1<![CDATA[&]]>b=2</loc></url></urlset>")
    assert(got == Vector(Entry("https://a.org/?a=1&b=2", null, index = false)))
  }

  test("html rel token list: 'alternate canonical' still yields the canonical") {
    val m = graft.htmltok.HtmlTokenizer.headMeta(
      """<link rel="alternate canonical" href="https://s/x">"""
        .getBytes(StandardCharsets.UTF_8), new TokenArena())
    assert(m.canonical == "https://s/x")
  }

  test("sitemapindex entries are flagged; empty locs are skipped") {
    val got = parse(
      """<sitemapindex>
        |<sitemap><loc>https://a.org/s1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
        |<sitemap><loc></loc></sitemap>
        |<sitemap><loc>https://a.org/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin)
    assert(got == Vector(
      Entry("https://a.org/s1.xml", "2024-02-01", index = true),
      Entry("https://a.org/s2.xml", null, index = true)))
  }

  test("fuzz: mutated and random bytes never throw; entries stay well-formed") {
    // Sitemaps.parse rides the tag-soup tokenizer, so malformed XML must
    // degrade, never throw — same contract the WARC/PDF/media readers pin.
    val base =
      ("""<?xml version="1.0"?><urlset>""" +
        (0 until 6).map(i =>
          s"<url><loc>https://h$i.org/p?a=1&amp;b=$i</loc>" +
            s"<lastmod>2024-03-0$i</lastmod></url>").mkString +
        "<url><loc><![CDATA[https://raw.org/&amp;x]]></loc></url></urlset>")
        .getBytes(StandardCharsets.UTF_8)
    val arena = new TokenArena()
    def check(bytes: Array[Byte]): Unit = {
      val got = Sitemaps.parse(bytes, arena) // must not throw
      got.foreach { e =>
        assert(e.loc.nonEmpty && e.loc == e.loc.trim)
        assert(e.lastmod == null || e.lastmod.nonEmpty)
      }
    }
    val rnd = new scala.util.Random(0x51e7L)
    for (_ <- 0 until 300) { // single-byte mutations anywhere in the doc
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      check(b)
    }
    for (_ <- 0 until 100) { // pure noise, including bytes that sniff as markup
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      check(b)
    }
    for (cut <- 1 until base.length by 7) // truncation at every 7th offset
      check(java.util.Arrays.copyOfRange(base, 0, cut))
  }

  test("x26 frontier: closed-form rows, canon folding, robots verdicts") {
    val rows = SparkEntry.queries("x26_sitemap_frontier")(spark, "").collect()
      .map(r => r.getString(1) ->
        ((r.getString(0), r.getString(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    // 40 docs: 5 sitemapindex docs (i%8==7 → 2 entries), 35 urlsets (6 locs)
    assert(rows.size == 35 * 6 + 5 * 2)
    (0 until 40).filterNot(_ % 8 == 7).foreach { i =>
      val host = s"h${i % 5}.example.org"
      val su = s"https://$host/sitemap$i.xml"
      // plain loc with lastmod, allowed by default
      assert(rows(s"https://$host/home/page$i.html") == ((su, "2024-01-15", false, true)))
      // prefix-disallowed
      assert(rows(s"https://$host/private/doc$i") == ((su, null, false, false)))
      // CDATA loc; $-anchored wildcard disallow
      assert(rows(s"https://$host/data/file$i.json") == ((su, "2024-01-16", false, false)))
      // uppercase scheme+host folded by canon; query preserved; allowed
      assert(rows(s"https://$host/s$i?a=1&b=2") == ((su, null, false, true)))
      // near-miss of the anchored rule
      assert(rows(s"https://$host/data/file$i.jsonl") == ((su, null, false, true)))
      assert(rows(s"https://$host/tmp/cache$i") == ((su, null, false, false)))
    }
    (0 until 40).filter(_ % 8 == 7).foreach { i =>
      val host = s"h${i % 5}.example.org"
      val su = s"https://$host/sitemap$i.xml"
      // shard pointers: flagged, not robots-blocked (no rule matches)
      assert(rows(s"https://$host/sitemap${i}_a.xml") == ((su, "2024-02-01", true, true)))
      assert(rows(s"https://$host/sitemap${i}_b.xml") == ((su, null, true, true)))
    }
  }
}
