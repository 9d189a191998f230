package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{GraftExpressions, UrlKernel}

/** Contract tests for RFC 3986 URL canonicalization ([[UrlKernel]]) — the
  * url-level-dedup key function — and the x19 collapse invariant over the
  * golden corpus.
  */
class UrlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def c(s: String): String = UrlKernel.canonical(s)

  test("scheme/host lowercase, default port strip, fragment strip") {
    assert(c("HTTPS://Example.ORG:443/A/b#sec-2") == "https://example.org/A/b")
    assert(c("http://example.org:80/") == "http://example.org/")
    assert(c("http://example.org:8080/x") == "http://example.org:8080/x")
    assert(c("https://example.org:80/x") == "https://example.org:80/x",
      "80 is not the https default")
  }

  test("path normalization: empty -> /, trailing slash dropped off-root") {
    assert(c("https://example.org") == "https://example.org/")
    assert(c("https://example.org/") == "https://example.org/")
    assert(c("https://example.org/a/") == "https://example.org/a")
    assert(c("https://example.org/a/b/") == "https://example.org/a/b")
  }

  test("percent-escapes: hex uppercased, unreserved decoded, malformed kept") {
    assert(c("https://example.org/a%2fb") == "https://example.org/a%2Fb")
    assert(c("https://example.org/%7Euser/%41%31%2d") == "https://example.org/~user/A1-")
    assert(c("https://example.org/x%zz") == "https://example.org/x%zz")
    assert(c("https://example.org/trail%2") == "https://example.org/trail%2")
  }

  test("query: tracking keys dropped, params sorted, empty query removed") {
    assert(c("https://example.org/p?b=2&a=1") == "https://example.org/p?a=1&b=2")
    assert(c("https://example.org/p?utm_source=f&a=1&UTM_campaign=x&gclid=g")
      == "https://example.org/p?a=1")
    assert(c("https://example.org/p?utm_source=f") == "https://example.org/p")
    assert(c("https://example.org/p?") == "https://example.org/p")
    // stable for duplicate keys: original relative order survives the sort
    assert(c("https://example.org/p?a=2&a=1") == "https://example.org/p?a=1&a=2")
    assert(c("https://example.org/p?x=1&x=0") == "https://example.org/p?x=0&x=1")
  }

  test("authority edge cases: userinfo kept, ipv6 port, trailing-dot FQDN") {
    assert(c("https://u:pw@Example.org/x") == "https://u:pw@example.org/x")
    assert(c("http://[2001:DB8::1]:80/x") == "http://[2001:db8::1]/x")
    assert(c("http://[2001:db8::1]:8080/x") == "http://[2001:db8::1]:8080/x")
    assert(c("https://example.org./x") == "https://example.org/x")
  }

  test("non-http schemes and scheme-less strings pass through (fragment still stripped)") {
    assert(c("ftp://Example.org/X#f") == "ftp://Example.org/X")
    assert(c("mailto:a@b.c") == "mailto:a@b.c")
    assert(c("example.org/x#f") == "example.org/x")
    assert(c("  https://example.org/x  ") == "https://example.org/x")
  }

  test("x19 invariant: five raw variants collapse to exactly two canonical groups") {
    val out = SparkEntry.queries("x19_url_dedup")(spark, "").collect()
    assert(out.length == 560, s"280 pages x 2 canonical groups, got ${out.length}")
    val byN = out.groupBy(_.getLong(1)).map { case (k, v) => k -> v.length }
    assert(byN == Map(3L -> 280, 2L -> 280),
      s"plain/fragment/tracking collapse to 3, reordered-query pair to 2: $byN")
  }

  test("host(): canonical lowercase host; empty for authority-less inputs") {
    assert(UrlKernel.host("HTTPS://W3.Example.ORG:443/f01/doc3") == "w3.example.org")
    assert(UrlKernel.host("http://u:pw@Example.org.:8080/x?q#f") == "example.org")
    assert(UrlKernel.host("http://[2001:DB8::1]:8080/x") == "[2001:db8::1]")
    assert(UrlKernel.host("mailto:a@b.c") == "")
    assert(UrlKernel.host("example.org/x") == "")
  }

  test("x20: five subdomain shards, 56 docs each, hosts canonicalized") {
    val out = SparkEntry.queries("x20_host_stats")(spark, "").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toList
    assert(out == (0 until 5).map(i => s"w$i.example.org" -> 56L).toList, out.toString)
  }

  test("graft_nfc: combining sequences compose; already-NFC text returns unchanged") {
    import graft.expressions.NfcKernel
    import org.apache.spark.unsafe.types.UTF8String
    val dec = "cafe\u0301 A\u030A"                  // DECOMPOSED combining sequences
    val comp = NfcKernel.nfc(UTF8String.fromString(dec)).toString
    assert(comp == "caf\u00E9 \u00C5" && comp.length == dec.length - 2,
      s"expected precomposed e-acute and A-ring: $comp")
    // fast path: an already-normalized UTF8String comes back reference-equal
    val ascii = UTF8String.fromString("plain ascii")
    assert(NfcKernel.nfc(ascii) eq ascii)
    // SQL + codegen surface
    GraftExpressions.register(spark)
    val df = spark.range(1)
      .select(concat(lit("x"), col("id"), lit(" e\u0301")).as("t"))
    df.createOrReplaceTempView("nfc_tmp")
    val r = spark.sql("SELECT graft_nfc(t) AS n, length(graft_nfc(t)) AS l FROM nfc_tmp").collect()
    assert(r.head.getString(0) == "x0 \u00E9" && r.head.getInt(1) == 4)
    val plan = df.select(GraftExpressions.nfc(col("t")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_nfc"), s"no codegen span in:\n$plan")
  }

  test("canonical idempotence counterexamples found by review/fuzz stay fixed") {
    // each of these historically produced a key that re-canonicalized to a
    // DIFFERENT key (incremental-crawl key drift); pin the fixed points
    val cases = Seq(
      "https://h.example.org/a//",            // multi trailing slash
      "http://a../x",                         // multi trailing FQDN dot
      "http://h/a/ ?utm_x=1",                 // dropped query exposes "/a/ "
      "http://h/p?\u0000&utm_x=1",            // junk-only param left "?<NUL>"
      "http://h/p?\u0000",                    // junk-only sole param
      "https://h/x\u0000////",                // interior NUL before slashes
      "ftp://X/y \t#frag")                    // pass-through exposing trailing ws
    for (u <- cases) {
      val c1 = UrlKernel.canonical(u)
      assert(UrlKernel.canonical(c1) == c1,
        s"u=[${FuzzUtil.hex(u)}] c1=[${FuzzUtil.hex(c1)}] " +
          s"c2=[${FuzzUtil.hex(UrlKernel.canonical(c1))}]")
    }
    assert(c("http://h/a/ ?utm_x=1") == "http://h/a")
    assert(c("http://h/p?\u0000&utm_x=1") == "http://h/p")
  }

  test("fuzz: canonical/host/path never throw and canonical is idempotent") {
    // crawl URLs are arbitrary bytes; a kernel throw kills the whole task.
    // Also pins IDEMPOTENCE: re-canonicalizing a stored canonical key must
    // be the identity, or an incremental crawl's keys drift between runs.
    val rng = new FuzzUtil.Rng(0x9e3779b97f4a7c15L)
    def nextInt(bound: Int): Int = rng.nextInt(bound)
    val atoms = Array("http://", "HTTPS://", "//", "://", "#", "?", "&", "=",
      "%", "%2", "%2F", "%zz", "@", ":", ":80", ":443", "]", "[::1]", ".",
      "..", "/", "a", "Ex.Org", "é́", "😀", " ", "\t",
      "utm_x=1", "fbclid=z", "%41", "%c3%a9", "\u0000", "+?", "a//b",
      " ?utm_x=1", "/ ", "?\u0000&utm_x=1") // review-found drift shapes
    for (round <- 0 until 12000) {
      val sb = new StringBuilder
      if (round % 4 == 3) { // pure random BMP chars (lone surrogates included)
        val n = 1 + nextInt(24)
        for (_ <- 0 until n) sb.append(nextInt(0xffff).toChar)
      } else {
        val n = 1 + nextInt(12)
        for (_ <- 0 until n) sb.append(atoms(nextInt(atoms.length)))
      }
      val u = sb.toString
      val c1 = UrlKernel.canonical(u) // must not throw
      UrlKernel.host(u); UrlKernel.path(u) // must not throw
      val c2 = UrlKernel.canonical(c1)
      assert(c2 == c1, s"not idempotent for u=[${FuzzUtil.hex(u)}] " +
        s"c1=[${FuzzUtil.hex(c1)}] c2=[${FuzzUtil.hex(c2)}]")
    }
  }

  test("fuzz: resolve never throws; absolute refs are base-independent; stable") {
    val rng = new FuzzUtil.Rng(0x243f6a8885a308d3L)
    def nextInt(bound: Int): Int = rng.nextInt(bound)
    val atoms = Array("../", "./", "..", ".", "/", "//", "a", "b/", "?q=1",
      "#f", "http://x/", "HTTPS://Y", ":", "%2e%2e/", "g;p=1", "", "?", "#",
      "\u0000", "😀", " ", "a:b", "//h:8080", "...", "/../")
    val base1 = "https://h.example.org/a/b/c?q=0"
    val base2 = "http://other.example.net/z"
    for (round <- 0 until 12000) {
      val sb = new StringBuilder
      if (round % 4 == 3) {
        val n = 1 + nextInt(24)
        for (_ <- 0 until n) sb.append(nextInt(0xffff).toChar)
      } else {
        val n = 1 + nextInt(8)
        for (_ <- 0 until n) sb.append(atoms(nextInt(atoms.length)))
      }
      val ref = sb.toString
      val r1 = UrlKernel.resolve(base1, ref) // must not throw
      import FuzzUtil.hex
      // a ref with its own scheme resolves the same against ANY base (§5.2.2)
      if (ref.trim.matches("(?s)^[A-Za-z][A-Za-z0-9+.-]*:.*")) {
        val r2 = UrlKernel.resolve(base2, ref)
        assert(r1 == r2, s"absolute ref base-dependent: ref=[${hex(ref)}]")
      }
      // re-resolving the (absolute) output against the same base is stable —
      // the frontier stores resolved URLs; a drift re-queues known pages
      val rr = UrlKernel.resolve(base1, r1)
      assert(rr == r1,
        s"not stable: ref=[${hex(ref)}] r1=[${hex(r1)}] rr=[${hex(rr)}]")
    }
  }

  test("graft_url_canon runs inside WholeStageCodegen and via SQL") {
    GraftExpressions.register(spark)
    // spark.range is a codegen'd source (a local Seq constant-folds to a
    // LocalTableScan with no codegen span to observe)
    val df = spark.range(1)
      .select(concat(lit("https://Example.org:443/a/?b=2&a="), col("id"), lit("1#f")).as("u"))
    df.createOrReplaceTempView("urls_tmp")
    val sqlOut = spark.sql("SELECT graft_url_canon(u) AS cu FROM urls_tmp").collect()
    assert(sqlOut.head.getString(0) == "https://example.org/a?a=01&b=2")
    val plan = df.select(GraftExpressions.urlCanon(col("u")))
      .queryExecution.executedPlan.toString
    // "*(1)" is the WholeStageCodegen marker in the compact plan string
    assert(plan.contains("*(1) Project [graft_url_canon"), s"no codegen span in:\n$plan")
    assert(!plan.contains("Exchange"), plan)
  }
}
