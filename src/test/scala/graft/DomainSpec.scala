package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DomainFunctions

/** Registrable-domain extraction (d50): PSL rule parsing and the published
  * algorithm's precedence/edge cases over an authored host matrix, checked
  * against hand-derived answers from the publicsuffix.org spec examples.
  */
class DomainSpec extends AnyFunSuite {

  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("parseRules: normal, wildcard, and exception shapes") {
    assert(DomainFunctions.parseRules(Seq("com")) ==
      Seq(("com", false, 1, 0)))
    assert(DomainFunctions.parseRules(Seq("co.uk")) ==
      Seq(("co.uk", false, 2, 0)))
    // `*` counts as a label in the prevailing-rule comparison
    assert(DomainFunctions.parseRules(Seq("*.ck")) ==
      Seq(("ck", false, 2, -1)))
    assert(DomainFunctions.parseRules(Seq("!www.ck")) ==
      Seq(("www.ck", true, 2, 1)))
  }

  test("registrableDomain: PSL algorithm over the authored matrix") {
    import spark.implicits._
    val hosts = Seq(
      1L -> "example.com",          // 1-label rule
      2L -> "www.example.com",      // extra label beyond registrable
      3L -> "example.co.uk",        // multi-label suffix beats 'uk'
      4L -> "www.example.co.uk",
      5L -> "uk",                   // host IS a public suffix
      6L -> "co.uk",                // host IS a multi-label public suffix
      7L -> "foo.ck",               // wildcard: ps = foo.ck, no reg
      8L -> "bar.foo.ck",           // wildcard: reg = bar.foo.ck
      9L -> "www.ck",               // exception beats the wildcard
      10L -> "sub.www.ck",          // exception: reg = www.ck
      11L -> "pages.github.io",     // private-domain style 2-label rule
      12L -> "github.io",           // host == rule → NULL registrable
      13L -> "example.xyz",         // no rule → implicit * (last label)
      14L -> "xyz",                 // implicit *, host == suffix
      15L -> "a.b.example.xyz")     // implicit *, deep host
      .toDF("doc_id", "host").repartition(5)
    val out = DomainFunctions.registrableDomain(hosts).collect()
      .map(r => r.getLong(0) -> (r.getString(2), Option(r.getString(3))))
      .toMap
    assert(out(1L) == ("com", Some("example.com")))
    assert(out(2L) == ("com", Some("example.com")))
    assert(out(3L) == ("co.uk", Some("example.co.uk")))
    assert(out(4L) == ("co.uk", Some("example.co.uk")))
    assert(out(5L) == ("uk", None))
    assert(out(6L) == ("co.uk", None))
    assert(out(7L) == ("foo.ck", None))
    assert(out(8L) == ("foo.ck", Some("bar.foo.ck")))
    assert(out(9L) == ("ck", Some("www.ck")))
    assert(out(10L) == ("ck", Some("www.ck")))
    assert(out(11L) == ("github.io", Some("pages.github.io")))
    assert(out(12L) == ("github.io", None))
    assert(out(13L) == ("xyz", Some("example.xyz")))
    assert(out(14L) == ("xyz", None))
    assert(out(15L) == ("xyz", Some("example.xyz")))
  }

  test("domainCap: one budget per registrable domain, doc_id keep order, NULL-reg fallback") {
    import spark.implicits._
    // 6 pages spread over subdomains of ONE registrable domain, 2 pages on
    // another, plus 3 pages whose host IS a public suffix (NULL registrable
    // → keyed by host)
    val hosts = (Seq(
      1L -> "www.example.co.uk", 2L -> "blog.example.co.uk",
      3L -> "a.b.example.co.uk", 4L -> "example.co.uk",
      5L -> "shop.example.co.uk", 6L -> "m.example.co.uk",
      7L -> "other.com", 8L -> "www.other.com") ++
      Seq(9L, 10L, 11L).map(_ -> "github.io"))
      .toDF("doc_id", "host").repartition(4)
    val out = DomainFunctions.domainCap(hosts, maxPerDomain = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // subdomains all spend example.co.uk's budget; keep order is doc_id
    assert(out(1L) == (("example.co.uk", 1L, true)))
    assert(out(2L) == (("example.co.uk", 2L, true)))
    for (d <- 3L to 6L)
      assert(out(d)._1 == "example.co.uk" && !out(d)._3, s"doc $d over cap")
    assert(out(7L) == (("other.com", 1L, true)))
    assert(out(8L) == (("other.com", 2L, true)))
    // public-suffix hosts budget under the host key
    assert(out(9L) == (("github.io", 1L, true)))
    assert(out(10L) == (("github.io", 2L, true)))
    assert(out(11L) == (("github.io", 3L, false)))
  }

  test("registrableDomain: partition-invariant and window exchange is array-free") {
    import spark.implicits._
    val hosts = (0L until 64L)
      .map(i => i -> s"w$i.s${i % 7}.example.co.uk").toDF("doc_id", "host")
    val a = DomainFunctions.registrableDomain(hosts.repartition(1)).collect()
    val b = DomainFunctions.registrableDomain(hosts.repartition(13)).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.forall(_.getString(3) == s"example.co.uk"))
    // the labels array dies in the scan stage: the projection above the
    // doc_id rejoin (which computes the final columns from whatever crossed
    // that exchange) must consume fb_* fallback strings, never ls
    val plan = DomainFunctions.registrableDomain(hosts)
      .queryExecution.executedPlan.toString
    val finals = plan.linesIterator.filter(_.contains("AS public_suffix#")).toSeq
    assert(finals.nonEmpty, plan)
    assert(!finals.exists(_.contains("ls#")), finals.mkString("\n"))
  }
}
