package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Robots, RobotsFunctions}
import graft.functions.Robots.Rule
import graft.pipeline.CorpusSource

/** robots.txt handling (RFC 9309): parser group formation, wildcard/anchor
  * matching, longest-match decisions, the relational prefix gate (d38), and
  * the authored end-to-end corpus (x25).
  */
class RobotsSpec extends AnyFunSuite {

  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("parse: * group rules collected; non-* groups and comments ignored") {
    val rules = Robots.parse(CorpusSource.robotsTxt(0))
    assert(rules == Vector(
      Rule("/private/", allow = false),
      Rule("/private/archive/", allow = true),
      Rule("/*.json$", allow = false),
      Rule("/tmp*", allow = false)))
  }

  test("parse: consecutive User-agent lines form ONE group (RFC 9309 §2.1)") {
    val txt = "User-agent: foo\nUser-agent: *\nDisallow: /x\n" +
      "User-agent: bar\nDisallow: /y\n"
    assert(Robots.parse(txt) == Vector(Rule("/x", allow = false)))
    // a directive ends the agent run: the second UA opens a NEW group
    val txt2 = "User-agent: *\nDisallow: /x\nUser-agent: bar\nDisallow: /y\n"
    assert(Robots.parse(txt2) == Vector(Rule("/x", allow = false)))
  }

  test("parse: empty Disallow is no rule; case-insensitive keys; inline comments") {
    assert(Robots.parse("User-agent: *\nDisallow:\n").isEmpty)
    assert(Robots.parse("USER-AGENT: *\nDISALLOW: /a # comment\n")
      == Vector(Rule("/a", allow = false)))
  }

  test("matches: prefix, wildcard, anchor") {
    assert(Robots.matches("/private/doc", "/private/"))
    assert(!Robots.matches("/pr", "/private/"))
    assert(Robots.matches("/a/b/file.json", "/*.json$"))
    assert(!Robots.matches("/a/b/file.jsonl", "/*.json$"))
    assert(Robots.matches("/a.json/b.json", "/*.json$"))
    assert(Robots.matches("/tmp", "/tmp*"))
    assert(Robots.matches("/tmp/x", "/tmp*"))
    assert(!Robots.matches("/tm", "/tmp*"))
    assert(Robots.matches("/fish", "/fish$"))
    assert(!Robots.matches("/fish/", "/fish$"))
    assert(Robots.matches("/x/mid/y", "/*mid*"))
    assert(!Robots.matches("/x/y", "/*mid*"))
  }

  test("decide: longest match wins; allow wins ties; no match allows") {
    val rules = Seq(Rule("/p/", allow = false), Rule("/p/keep/", allow = true))
    assert(!Robots.decide("/p/x", rules))
    assert(Robots.decide("/p/keep/x", rules))
    assert(Robots.decide("/other", rules))
    // tie: same length, opposite directives → allow (order-independent)
    val tie = Seq(Rule("/a/", allow = false), Rule("/a$", allow = true))
    assert(Robots.decide("/a/", tie) == Robots.decide("/a/", tie.reverse))
    assert(!Robots.decide("/a/", tie)) // only /a/ matches "/a/"; /a$ does not
    val realTie = Seq(Rule("/ab", allow = false), Rule("/a*", allow = true))
    assert(Robots.decide("/ab", realTie) && Robots.decide("/ab", realTie.reverse))
  }

  test("robotsFilter (relational prefix gate) agrees with decide row-by-row") {
    val s = spark; import s.implicits._
    val prefixRules = RobotsFunctions.d38Rules
    val urls = (0 until 120).map { i =>
      val host = s"src${i % 20}.example.org"
      val path = Seq("/pub/a", "/private/p", "/private/archive/x", "/tmp/t",
        "/pub/data/d", "/")(i % 6) + i
      (i.toLong, s"https://$host$path", host, path)
    }
    val got = RobotsFunctions.robotsFilter(
      urls.toDF("doc_id", "url", "host", "path"),
      prefixRules.toDF("host", "prefix", "allow"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    urls.foreach { case (id, _, host, path) =>
      val hostRules = prefixRules.collect { case (h, p, a) if h == host => Rule(p, a) }
      assert(got(id) == Robots.decide(path, hostRules), s"url $id $host$path")
    }
  }

  test("x25 corpus: every frontier verdict matches its closed form") {
    val rows = SparkEntry.queries("x25_robots_gate")(spark, "").collect()
      .map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rows.size == 300)
    (0 until 300).foreach { i =>
      assert(rows(CorpusSource.frontierUrl(i)) == CorpusSource.frontierAllowed(i),
        s"frontier $i ${CorpusSource.frontierUrl(i)}")
    }
  }

  test("matches: property — agrees with a regex reference on random patterns/paths") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val piece = Gen.oneOf("/", "a", "b", "ab", ".json", "tmp", "*", "$", "x")
    val str = (n: Int) => Gen.listOfN(n, piece).map(_.mkString)
    val gen = for {
      pn <- Gen.chooseNum(1, 6); sn <- Gen.chooseNum(0, 8)
      pat <- str(pn); path <- str(sn)
    } yield (pat, "/" + path)
    def ref(path: String, pattern: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val pat = if (anchored) pattern.dropRight(1) else pattern
      val rx = pat.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
      val m = java.util.regex.Pattern
        .compile(rx, java.util.regex.Pattern.DOTALL).matcher(path)
      if (anchored) m.matches() else m.lookingAt()
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000),
      Prop.forAll(gen) { case (pat, path) =>
        pat.isEmpty || Robots.matches(path, pat) == ref(path, pat)
      })
    assert(res.passed, res.status.toString)
  }

  test("url path kernel: path+query extraction") {
    import graft.expressions.UrlKernel
    assert(UrlKernel.path("https://h.example.org/a/b?q=1#frag") == "/a/b?q=1")
    assert(UrlKernel.path("https://h.example.org") == "/")
    assert(UrlKernel.path("https://h.example.org?q=1") == "/?q=1")
    assert(UrlKernel.path("/already/path") == "/already/path")
    assert(UrlKernel.path("no-scheme") == "/")
    // a query-embedded URL must not be re-parsed as an authority — the
    // leading-'/' rule runs FIRST (review fix): a robots 'Disallow: /r'
    // must still see the real path
    assert(UrlKernel.path("/r?to=https://x.com/y") == "/r?to=https://x.com/y")
    assert(UrlKernel.path("https://h.org/r?to=https://x.com/y") == "/r?to=https://x.com/y")
    assert(UrlKernel.host("/r?to=https://x.com/y") == "")
  }

  test("crawlSchedule: per-host serialized slots, host-affine workers, makespan") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // three hosts of different sizes and delays, deliberately shuffled rows
    val rows = Seq(
      ("a.org", "https://a.org/3", 100L), ("b.org", "https://b.org/1", 250L),
      ("a.org", "https://a.org/1", 100L), ("c.org", "https://c.org/1", 50L),
      ("a.org", "https://a.org/2", 100L), ("b.org", "https://b.org/2", 250L))
    val in = rows.toDF("host", "url", "delay_ms").repartition(5)
    val out = RobotsFunctions.crawlSchedule(in, workers = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

    // per host: slots are 0..n-1 in url order, fetch_at = slot*delay,
    // makespan = (n-1)*delay — the politeness serialization contract
    val byHost = out.groupBy(_._1)
    for ((h, rs) <- byHost) {
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (0L until rs.length).toSeq, h)
      assert(sorted.map(_._2).toSeq == sorted.map(_._2).sorted.toSeq,
        s"$h slots must follow url order")
      assert(sorted.forall(r => r._6 == r._4 * r._3), h)
      assert(rs.map(_._7).distinct.toSeq == Seq((rs.length - 1) * rs.head._3), h)
      // host affinity: one worker per host, inside the shard range
      assert(rs.map(_._5).distinct.length == 1 && rs.head._5 >= 0 &&
        rs.head._5 < 4, h)
    }
    // worker assignment is the md5 discipline — stable across runs/partitioning
    val again = RobotsFunctions.crawlSchedule(in.repartition(2), workers = 4)
      .select(col("host"), col("worker")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byHost.keys.forall(h => again(h) == byHost(h).head._5))
  }

  test("parse: UTF-8 BOM before the first User-agent line is stripped") {
    val rules = Robots.parse("\uFEFF" + "User-agent: *\nDisallow: /private/\n")
    assert(rules == Vector(Rule("/private/", allow = false)),
      "a BOM must not make the politeness gate fail open")
  }

  test("x31 crawl plan: only allowed urls scheduled, discovery delays wired, per-host slots") {
    val rows = SparkEntry.queries("x31_crawl_plan")(spark, "")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // every scheduled url passed the robots gate (re-checked independently)
    val ruleMap = CorpusSource.frontierRuleMap
    for ((h, u, _, _, _) <- rows)
      assert(Robots.decide(graft.expressions.UrlKernel.path(u),
        ruleMap.getOrElse(h, Vector.empty)), u)
    // the schedule is EXACTLY x26's allowed non-index locs: sitemap-INDEX
    // shard urls are discovery artifacts and must not consume fetch slots
    val frontier = SparkEntry.queries("x26_sitemap_frontier")(spark, "")
      .select("loc", "is_index", "allowed") // by name: robust to reorder
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    val wantUrls = frontier.collect { case (loc, idx, ok)
      if ok && !idx && graft.expressions.UrlKernel.host(loc).nonEmpty => loc
    }.toSet
    assert(frontier.exists(_._2), "fixture must contain index entries")
    assert(rows.map(_._2).toSet == wantUrls,
      "scheduled urls != x26 allowed non-index locs")
    // delays come from the x30 discovery records, per host
    for ((h, _, d, _, _) <- rows) {
      val idx = h.stripPrefix("h").takeWhile(_.isDigit).toInt
      val want = Robots.discovery(CorpusSource.robotsTxt(idx))._2.get
      assert(d == want, s"$h delay $d != $want")
    }
    // per host: slots 0..n-1 in url order (the d49 politeness contract)
    for ((h, rs) <- rows.groupBy(_._1)) {
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (0L until rs.length).toSeq, h)
      assert(sorted.map(_._2).toSeq == sorted.map(_._2).sorted.toSeq, h)
      assert(rs.map(_._5).distinct.length == 1, s"$h one worker shard")
    }
    // determinism: a second run is identical (the x-surface contract)
    val again = SparkEntry.queries("x31_crawl_plan")(spark, "")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == again.toSeq)
  }

  test("recrawlPriority: change-ratio verdicts, exact boundary, cold-start hot") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val caps = Seq(
      // A: 4 captures, 2 versions -> 2·1 < 3, stable
      ("a", ts(1), "v1"), ("a", ts(2), "v1"), ("a", ts(3), "v2"), ("a", ts(4), "v1"),
      // B: 3 captures, 3 versions -> 4 >= 2, hot
      ("b", ts(1), "v1"), ("b", ts(2), "v2"), ("b", ts(3), "v3"),
      // C: boundary 2·(2−1) == (3−1) -> hot (the >= edge)
      ("c", ts(1), "v1"), ("c", ts(2), "v1"), ("c", ts(3), "v2"),
      // D: single capture -> vacuously hot (cold-start explore)
      ("d", ts(5), "v1"))
      .toDF("url", "warc_ts", "text").repartition(3)
    val out = RobotsFunctions.recrawlPriority(caps).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getTimestamp(3), r.getTimestamp(4),
          r.getBoolean(5)))).toMap
    assert(out("a") == ((4L, 2L, ts(1), ts(4), false)))
    assert(out("b") == ((3L, 3L, ts(1), ts(3), true)))
    assert(out("c") == ((3L, 2L, ts(1), ts(3), true)))
    assert(out("d") == ((1L, 1L, ts(5), ts(5), true)))
  }

  test("discovery: sitemaps group-independent + first-dup wins; crawl-delay from * group") {
    // even host: sitemap inside the googlebot group + news sitemap + a
    // trailing duplicate of the first; delay 5s, second value ignored
    val (m0, d0) = Robots.discovery(CorpusSource.robotsTxt(0))
    assert(m0 == Vector("https://h0.example.org/sitemap.xml",
      "https://h0.example.org/sitemap-news.xml"), m0.toString)
    assert(d0 == Some(5000L))
    // odd host: one sitemap (dup removed), fractional-seconds delay
    val (m1, d1) = Robots.discovery(CorpusSource.robotsTxt(1))
    assert(m1 == Vector("https://h1.example.org/sitemap.xml"), m1.toString)
    assert(d1 == Some(2500L))
  }

  test("discovery: non-* crawl-delay ignored; bad values skipped; BOM; comments") {
    // delay only in a non-* group \u2192 none for us
    assert(Robots.discovery(
      "User-agent: googlebot\nCrawl-delay: 7\nUser-agent: *\nDisallow: /x/\n")
      ._2.isEmpty)
    // non-numeric delay skipped, later good value in the same group wins
    assert(Robots.discovery(
      "User-agent: *\nCrawl-delay: fast\nCrawl-delay: 1.25\n")
      ._2 == Some(1250L))
    // negative / NaN / Infinity must not poison the schedule — all skipped
    for (bad <- Seq("-1", "NaN", "Infinity", "-Infinity"))
      assert(Robots.discovery(s"User-agent: *\nCrawl-delay: $bad\n")._2.isEmpty,
        bad)
    assert(Robots.discovery(
      "User-agent: *\nCrawl-delay: -3\nCrawl-delay: 2\n")._2 == Some(2000L),
      "a rejected value must not consume the first-wins slot")
    // BOM + comment stripping apply to discovery lines too
    val (m, d) = Robots.discovery(
      "\uFEFFSitemap: https://a.example/s.xml # primary\nUser-agent: *\nCrawl-delay: 2 # s\n")
    assert(m == Vector("https://a.example/s.xml") && d == Some(2000L))
    // a finite-but-absurd delay caps at one hour: 9e18 s would round to
    // Long.MaxValue ms and overflow slot * delay_ms into NEGATIVE fetch
    // times \u2014 the backwards schedule the finite guard exists to prevent
    for (huge <- Seq("9000000000000000000", "1e18", "3601"))
      assert(Robots.discovery(s"User-agent: *\nCrawl-delay: $huge\n")
        ._2 == Some(3600000L), huge)
    assert(Robots.discovery("User-agent: *\nCrawl-delay: 3600\n")
      ._2 == Some(3600000L), "the cap boundary itself is honored exactly")
  }
}
