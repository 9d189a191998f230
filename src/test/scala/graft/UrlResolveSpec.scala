package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.UrlKernel
import graft.pipeline.CorpusSource

/** RFC 3986 §5 reference resolution: the spec's own §5.4.1 (normal) and
  * §5.4.2 (abnormal) vectors, plus the base-aware outlink surface (x27)
  * over the authored corpus.
  */
class UrlResolveSpec extends AnyFunSuite {

  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = "http://a/b/c/d;p?q"

  test("RFC 3986 §5.4.1 normal examples") {
    val vectors = Seq(
      "g:h" -> "g:h", "g" -> "http://a/b/c/g", "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/", "/g" -> "http://a/g", "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y", "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s", "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s", ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x", "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q", "." -> "http://a/b/c/", "./" -> "http://a/b/c/",
      ".." -> "http://a/b/", "../" -> "http://a/b/", "../g" -> "http://a/b/g",
      "../.." -> "http://a/", "../../" -> "http://a/", "../../g" -> "http://a/g")
    vectors.foreach { case (ref, want) =>
      assert(UrlKernel.resolve(base, ref) == want, s"ref [$ref]")
    }
  }

  test("RFC 3986 §5.4.2 abnormal examples") {
    val vectors = Seq(
      "../../../g" -> "http://a/g", "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g", "/../g" -> "http://a/g", "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g", "g.." -> "http://a/b/c/g..", "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g", "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h", "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y", "g;x=1/../y" -> "http://a/b/c/y",
      "g?y/./x" -> "http://a/b/c/g?y/./x", "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g#s/./x", "g#s/../x" -> "http://a/b/c/g#s/../x",
      "http:g" -> "http:g") // strict parser: scheme-carrying ref taken as-is
    vectors.foreach { case (ref, want) =>
      assert(UrlKernel.resolve(base, ref) == want, s"ref [$ref]")
    }
  }

  test("authority edge cases: empty base path, port, userinfo preserved") {
    assert(UrlKernel.resolve("https://h.example.org", "g") == "https://h.example.org/g")
    assert(UrlKernel.resolve("https://u@h:8080/a/b?x", "../c") == "https://u@h:8080/c")
    assert(UrlKernel.resolve("https://h/a/", "") == "https://h/a/")
  }

  test("anchors BEFORE the base tag still resolve against it (HTML on-demand rule)") {
    import graft.htmltok.{HtmlTokenizer, TokenArena}
    val html = """<a href="g"><base href="https://cdn.example/x/"><a href="h">"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val got = HtmlTokenizer.resolvedLinks(html, new TokenArena(),
      "https://site/dir/p.html")
    assert(got == Vector("https://cdn.example/x/g", "https://cdn.example/x/h"))
  }

  test("adversarial segment counts stay linear (no quadratic dot-removal)") {
    val longRel = ("a/" * 100000) + "z"
    val longDots = ("../" * 100000) + "z"
    val t0 = System.nanoTime()
    val r1 = UrlKernel.resolve("http://h/b/", longRel)
    val r2 = UrlKernel.resolve("http://h/b/", longDots)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(r1.endsWith("/z") && r2 == "http://h/z")
    assert(ms < 500.0, s"dot-segment removal took ${ms}ms on 100k segments")
  }

  test("x27 corpus: all eight reference classes, base honored and first-wins") {
    val rows = SparkEntry.queries("x27_resolved_links")(spark, "").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byUrl = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(rows.length == 280 * 8)
    (0 until 280).foreach { i =>
      val url = s"https://b${i % 4}.example.org/sec/sub/page$i.html"
      val hasBase = i % 3 == 0
      val dir = if (hasBase) s"https://cdn${i % 2}.example.net/assets/"
                else s"https://b${i % 4}.example.org/sec/sub/"
      val docOrigin = if (hasBase) s"https://cdn${i % 2}.example.net"
                      else s"https://b${i % 4}.example.org"
      val baseDoc = if (hasBase) s"https://cdn${i % 2}.example.net/assets/"
                    else url
      val expected = Set(
        s"${dir}g$i.html",
        s"${dir}same$i.html",
        // "../up" from /assets/ climbs to the cdn root; from /sec/sub/ to /sec/
        (if (hasBase) s"$docOrigin/up$i.html" else s"https://b${i % 4}.example.org/sec/up$i.html"),
        s"$docOrigin/rooted$i",
        // query-only keeps the base PATH (doc path, or /assets/ under a base tag)
        (if (hasBase) s"$docOrigin/assets/?q=$i" else s"$url?q=$i"),
        s"https://peer.example.org/p$i",
        s"https://abs.example.org/x$i",
        s"$baseDoc#frag$i")
      assert(byUrl(url) == expected, s"page $i (base=$hasBase)")
    }
  }
}
