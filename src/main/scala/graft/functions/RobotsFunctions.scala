package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt handling (RFC 9309, public spec) — the crawl-politeness gate a
  * Common-Crawl-style curation pipeline applies before a URL enters the
  * corpus. The reference pipeline consumes pre-fetched corpora, so this is
  * part of the "operations a large-scale training-data pipeline needs"
  * surface, not a reference graft.
  *
  * Two layers:
  *  - [[Robots.parse]] / [[Robots.decide]]: a row-local RFC 9309 parser and
  *    matcher (incl. the `*` wildcard and `$` end-anchor the RFC requires
  *    crawlers to support) — runs inside the ingest scan, zero shuffle.
  *  - [[RobotsFunctions.robotsFilter]]: the relational recast over a rules
  *    TABLE with prefix rules (SQL-expressible, DuckDB-oracled as d38) —
  *    longest-match wins, allow wins ties, no-match allows (all RFC 9309
  *    §2.2.2 semantics).
  */
object Robots {

  /** One `*`-agent rule: `pattern` is the raw rule path (may contain the
    * `*` wildcard and a trailing `$` anchor); `allow` its directive. */
  final case class Rule(pattern: String, allow: Boolean)

  /** Parse a robots.txt body: groups are runs of consecutive `User-agent`
    * lines followed by their directives (RFC 9309 §2.1); only the groups
    * naming agent `*` contribute (we are a generic crawler; RFC merges
    * multiple matching groups). `#` comments strip to end of line, keys are
    * case-insensitive, an EMPTY Disallow value is no rule at all, and
    * unknown directives (Crawl-delay, Sitemap, …) are skipped inside and
    * outside groups. */
  def parse(txt0: String): Vector[Rule] = scan(txt0)._1

  /** The ONE lexer + group state machine behind [[parse]] and
    * [[discovery]] — a single pass collects `*`-group rules, Sitemap lines,
    * and the `*`-group Crawl-delay together, so the two surfaces can never
    * diverge on lexing (BOM, comments, key folding) or group formation. */
  private def scan(txt0: String): (Vector[Rule], Vector[String], Option[Long]) = {
    // strip a UTF-8 BOM: real-world robots.txt files saved by Windows
    // tooling lead with U+FEFF, which would glue onto the first key and
    // silently drop the whole * group -- the gate must not fail open on it
    val txt = if (txt0.nonEmpty && txt0.charAt(0) == '\uFEFF') txt0.substring(1) else txt0
    val out = Vector.newBuilder[Rule]
    val maps = Vector.newBuilder[String]
    val seen = new java.util.HashSet[String]()
    var delay: Option[Long] = None
    var inStar = false       // current group names agent *
    var inAgentRun = false   // still collecting consecutive User-agent lines
    txt.linesIterator.foreach { line0 =>
      val hash = line0.indexOf('#')
      val line = (if (hash >= 0) line0.substring(0, hash) else line0).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!inAgentRun) { inStar = false; inAgentRun = true }
              if (value == "*") inStar = true
            case "allow" | "disallow" =>
              inAgentRun = false
              if (inStar && value.nonEmpty)
                out += Rule(value, allow = key == "allow")
              // empty Disallow ("everything allowed") adds no rule; an empty
              // Allow is equally vacuous
            case "sitemap" =>
              inAgentRun = false
              if (value.nonEmpty && seen.add(value)) maps += value
            case "crawl-delay" =>
              inAgentRun = false
              if (inStar && delay.isEmpty && value.nonEmpty)
                try {
                  val v = value.toDouble
                  // finite + non-negative only, and CAPPED at one hour: a
                  // negative/NaN/Infinity delay would run the d49 schedule
                  // backwards or drop the politeness gap entirely — and an
                  // uncapped finite one (Crawl-delay: 9e18 rounds to
                  // Long.MaxValue ms) overflows `slot * delay_ms` into
                  // negative fetch times, the same backwards schedule by
                  // another door. Crawlers cap honored delays in practice.
                  if (java.lang.Double.isFinite(v) && v >= 0)
                    delay = Some(math.min(math.round(v * 1000.0), 3600000L))
                } catch { case _: NumberFormatException => }
            case _ =>
              inAgentRun = false // any other directive ends a user-agent run
          }
        }
      }
    }
    (out.result(), maps.result(), delay)
  }

  /** RFC 9309 pattern match of `path` against `pattern`: literal prefix
    * match, `*` matches any (possibly empty) span, a trailing `$` anchors
    * the end. Greedy left-to-right with backtracking via segment search. */
  def matches(path: String, pattern: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val segs = pat.split("\\*", -1)
    var pos = 0
    var k = 0
    while (k < segs.length) {
      val seg = segs(k)
      if (k == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (k == segs.length - 1 && anchored) {
        // last segment must END the path (at or after pos)
        return path.length - seg.length >= pos && path.endsWith(seg)
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      k += 1
    }
    if (anchored) pos == path.length else true
  }

  /** RFC 9309 §2.2.2 decision: the most specific (longest-pattern) matching
    * rule wins; a tie between allow and disallow resolves to allow; no
    * matching rule allows. Deterministic for any rule order. */
  def decide(path: String, rules: Seq[Rule]): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (matches(path, r.pattern)) {
        val l = r.pattern.length
        if (l > bestLen) { bestLen = l; bestAllow = r.allow }
        else if (l == bestLen && r.allow) bestAllow = true
      }
    }
    if (bestLen < 0) true else bestAllow
  }

  /** Discovery records of a robots.txt body — the two directives [[parse]]
    * deliberately skips:
    *  - `Sitemap:` (sitemaps.org protocol; GROUP-INDEPENDENT per the spec,
    *    collected anywhere in the file, file order, first occurrence wins
    *    on duplicates) — the standard sitemap-discovery path that seeds the
    *    x26 frontier;
    *  - `Crawl-delay:` from the `*` group (de-facto directive, seconds,
    *    fractional values occur in the wild) — the per-host delay the d49
    *    politeness scheduler consumes, returned in ms; the FIRST value in
    *    a `*` group wins (documented choice); non-numeric, negative, and
    *    non-finite values are ignored (a bad delay must not poison the
    *    d49 schedule).
    * Same lexical rules as [[parse]]: BOM strip, `#` comments, trimmed
    * case-insensitive keys. */
  def discovery(txt0: String): (Vector[String], Option[Long]) = {
    val (_, maps, delay) = scan(txt0)
    (maps, delay)
  }
}

object RobotsFunctions {

  /** Deterministic prefix-only rule set for the d38 oracle surface — built
    * from this ONE Seq by both the Spark query and the DuckDB VALUES table
    * (the langMarkers discipline) so the two sides can never drift. Every
    * source-host shares a politeness core; EVEN sources also fence their
    * data API (per-host rule isolation exercised). */
  val d38Rules: Seq[(String, String, Boolean)] =
    (0 until 20).flatMap { n =>
      val host = s"src$n.example.org"
      val core = Seq(
        (host, "/private/", false),
        (host, "/private/archive/", true),
        (host, "/tmp", false))
      if (n % 2 == 0) core :+ ((host, "/pub/data/", false)) else core
    }

  /** Relational robots gate over PREFIX rules (the SQL-expressible subset —
    * wildcard rules go through [[Robots.decide]] row-locally, x25):
    * `urls` must have (doc_id, url, host, path); `rules` (host, prefix,
    * allow). Returns (doc_id, url, allowed) for every input url.
    *
    * Scale shape (10^12 urls): the rules table is O(hosts × rules) — orders
    * below the frontier — so the match join broadcasts under AQE; the
    * longest-match verdict reduces matched candidates (bounded by rules per
    * host) with max(struct(len, allow)), one narrow aggregation; unmatched
    * urls never shuffle at all (left join + coalesce default-allow).
    */
  def robotsFilter(urls: DataFrame, rules: DataFrame): DataFrame = {
    val matched = urls.join(rules,
        urls("host") === rules("host") &&
          urls("path").startsWith(rules("prefix")))
      .groupBy(urls("doc_id").as("doc_id"))
      // max over (pattern length, allow): longest wins; at equal length the
      // struct order makes allow=true beat allow=false — the RFC tie rule
      .agg(max(struct(length(rules("prefix")).as("l"), rules("allow").as("a")))
        .as("best"))
      .select(col("doc_id"), col("best.a").as("a"))
    urls.select(col("doc_id"), col("url"))
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("url"),
        coalesce(col("a"), lit(true)).as("allowed"))
      .orderBy("doc_id")
  }

  /** Adaptive-recrawl priority — the capture-history side of crawl
    * scheduling (change-frequency estimation à la Cho & Garcia-Molina,
    * "Effective Page Refresh Policies for Web Crawlers", TODS 2003): a url
    * whose payload digest changed in most observed intervals should be
    * re-fetched sooner than one that never changes. Input captures
    * (url, warc_ts, text) — the same contract as [[DedupFunctions
    * .revisitRecords]]; output one row per url: capture/version counts,
    * observation span, and the `hot` verdict (changed in ≥ half its
    * intervals, exact integer arithmetic `2·(versions−1) ≥ captures−1` —
    * the d37 rational-threshold discipline, so engines agree at
    * boundaries). A single-capture url is vacuously hot (0 ≥ 0): no
    * interval evidence yet, so the policy explores it — the standard
    * cold-start choice.
    *
    * Scale shape: TWO narrow combining aggregations — (url, digest) first
    * (the d52 key, map-side combine collapses identical re-fetches before
    * anything moves), then url; the exchanges carry (url, 32-hex digest,
    * two timestamps, a count). No window, no text, no countDistinct
    * expand. */
  def recrawlPriority(captures: DataFrame): DataFrame =
    captures
      .select(col("url"), md5(col("text").cast("binary")).as("digest"),
        col("warc_ts"))
      .groupBy(col("url"), col("digest"))
      .agg(count(lit(1)).as("n"), min(col("warc_ts")).as("lo"),
        max(col("warc_ts")).as("hi"))
      .groupBy(col("url"))
      .agg(sum(col("n")).cast("long").as("n_captures"),
        count(lit(1)).cast("long").as("n_versions"),
        min(col("lo")).as("first_ts"), max(col("hi")).as("last_ts"))
      .withColumn("hot",
        lit(2) * (col("n_versions") - 1) >= col("n_captures") - 1)
      .orderBy("url")

  /** Crawl-politeness SCHEDULER — the fetch-plan step between the frontier
    * (x26) and the fetcher: a polite crawler serializes requests per host
    * with that host's delay between them (public crawler methodology:
    * Heritrix/Nutch politeness queues; the de-facto Crawl-delay convention).
    * `urls` must have (url, host, delay_ms). Per host, urls fetch in url
    * order: slot k fires at k × delay_ms (a RELATIVE schedule — the caller
    * adds its epoch). Hosts are assigned to `workers` fetcher shards
    * host-affinely (md5 of the host, the hashSplit discipline) so per-host
    * serialization never needs cross-worker coordination. Emits the full
    * plan plus per-host makespan — the knob a crawl planner balances
    * shards by.
    *
    * Scale shape (10^9-url frontier): ONE host-keyed window does slotting
    * (per-host sequential fetching is the POLITENESS constraint, so a
    * per-host sort is irreducible work, not an engine artifact); the
    * exchange carries (host, url) strings only; worker assignment and the
    * makespan are row-local arithmetic / a same-key window over the slotted
    * table — no second shuffle. A hot host (10^6 urls on one key) is a slow
    * CRAWL, not a slow plan: its schedule is one partition's linear scan. */
  def crawlSchedule(urls: DataFrame, workers: Int = 4): DataFrame = {
    require(workers > 0, "workers must be positive")
    val w = Window.partitionBy(col("host")).orderBy(col("url"))
    val slot = (row_number().over(w) - 1).cast("long")
    val worker = pmod(
      conv(substring(md5(col("host").cast("binary")), 1, 8), 16, 10)
        .cast("long"), lit(workers.toLong))
    urls.select(col("host"), col("url"), col("delay_ms"),
        slot.as("slot"), worker.as("worker"))
      // spacing = the per-HOST max delay, not the per-row value: the input
      // schema permits inconsistent delay_ms within one host, and slot *
      // row-delay would interleave fetches out of order and break the
      // politeness gap this schedule exists to guarantee; max is the
      // conservative (most polite) reconciliation, and a no-op when the
      // host's rows agree (the robots-derived normal case)
      .withColumn("fetch_at_ms",
        col("slot") * max(col("delay_ms")).over(Window.partitionBy(col("host"))))
      .withColumn("host_makespan_ms",
        max(col("fetch_at_ms")).over(Window.partitionBy(col("host"))))
      .orderBy("host", "slot")
  }
}
