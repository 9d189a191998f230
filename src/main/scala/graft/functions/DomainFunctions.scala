package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Registrable-domain extraction — the Public Suffix List algorithm
  * (publicsuffix.org/list/, public spec) that turns a raw host into the
  * per-SITE aggregation key every crawl pipeline groups by: host stats
  * (x20), template removal (d37), politeness budgets (d49) all want
  * `blog.example.co.uk` and `www.example.co.uk` to land on ONE key
  * (`example.co.uk`), which naive "last two labels" gets wrong for every
  * multi-label suffix (co.uk, ac.jp) and every wildcard/exception entry.
  *
  * Algorithm (the PSL spec, verbatim): a rule matches when its labels equal
  * the right-most labels of the host, `*` matching exactly one label; the
  * prevailing rule is the exception rule if any matches, else the matching
  * rule with the MOST labels, else the implicit `*` (last label). Public
  * suffix = the prevailing rule's span (an exception rule: minus its
  * leftmost label); registrable domain = public suffix plus one more host
  * label, NULL when the host IS a public suffix.
  *
  * Relational recast (identical in Spark and the DuckDB oracle): explode
  * the host's label-suffixes with their positions, equi-join a broadcast
  * rules table on the suffix string (wildcard rules join on their TAIL and
  * require position ≥ 2 — one label must precede the tail), derive the
  * public-suffix POSITION per match via the rule-kind delta, take the
  * prevailing match with one row_number window ordered (exception DESC,
  * rule labels DESC, position ASC), and left-join back so rule-less hosts
  * fall to the implicit `*`.
  *
  * Scale shape (10^12 urls): the real PSL is ~9k rules — a classic
  * broadcast dim (the d38/q06 discipline); the suffix explode is ≤ the
  * host's label count (row-local, bounded); the window keys on doc_id over
  * MATCH candidates only (a few rows each, strings only — the labels array
  * is dropped before the exchange). No all-pairs, no wide payload.
  */
object DomainFunctions {

  /** PSL-style rules, a labeled deterministic STAND-IN subset of the real
    * list (the d31 weight-table discipline — the algorithm is the product,
    * the table is data): `rule` in PSL syntax (`!` exception, `*.` wildcard).
    */
  val d50Rules: Seq[String] = Seq(
    "com", "org", "net", "io", "github.io", "uk", "co.uk", "ac.uk",
    "jp", "ac.jp", "us", "*.ck", "!www.ck")

  /** One parsed rule row: what a host suffix must EQUAL to match
    * (`matchStr` — a wildcard rule's tail), the rule-kind flags, the
    * prevailing-order label count of the rule (`*` counts as a label), and
    * the public-suffix position delta relative to the matched position
    * (0 normal, +1 exception — drop the leading label, −1 wildcard — the
    * `*` label sits one position left of the tail). */
  def parseRules(rules: Seq[String]): Seq[(String, Boolean, Int, Int)] =
    rules.map { r =>
      if (r.startsWith("!")) {
        val body = r.substring(1)
        (body, true, body.count(_ == '.') + 1, 1)
      } else if (r.startsWith("*.")) {
        val tail = r.substring(2)
        (tail, false, tail.count(_ == '.') + 2, -1)
      } else (r, false, r.count(_ == '.') + 1, 0)
    }

  /** Per-domain contribution cap — the anti-domination gate of RefinedWeb /
    * CCNet-style curation: no registrable domain may contribute more than
    * `maxPerDomain` pages to the corpus (subdomain farms and SEO mills
    * otherwise swamp the token budget). Keys on [[registrableDomain]]'s
    * output (the whole point: `a.blog.example.co.uk` and
    * `www.example.co.uk` spend ONE budget); hosts that ARE a public suffix
    * (registrable NULL) fall back to the host itself as their key. Keep
    * order is doc_id (deterministic); emits every row with its rank and
    * verdict so the audit trail survives (the d44 per-rule-verdict
    * discipline).
    *
    * Scale shape: d50's shape plus ONE domain_key-keyed window over
    * (doc_id, key-string) rows. A mega-domain is one partition's linear
    * scan — and is exactly the row this operator exists to trim. */
  def domainCap(hosts: DataFrame, maxPerDomain: Int,
                rules: Seq[String] = d50Rules): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain=$maxPerDomain")
    // compose over the UNORDERED derivation: the domain_key hash exchange
    // right below would destroy a presentation sort anyway — paying a
    // global range-partition + sort first is pure waste at corpus scale
    registrableDomainUnordered(hosts, rules)
      .select(col("doc_id"),
        coalesce(col("registrable"), col("host")).as("domain_key"))
      .withColumn("site_rank", row_number().over(
        Window.partitionBy(col("domain_key")).orderBy(col("doc_id")))
        .cast("long"))
      .withColumn("kept", col("site_rank") <= maxPerDomain)
      .orderBy("doc_id")
  }

  /** `hosts` must have (doc_id, host). Returns (doc_id, host,
    * public_suffix, registrable) for every input row, ordered by doc_id.
    * `rules` defaults to the stand-in table; pass the full PSL in
    * production. Internal compositions ([[domainCap]]) use the unordered
    * variant and skip the presentation sort. */
  def registrableDomain(hosts: DataFrame, rules: Seq[String] = d50Rules): DataFrame =
    registrableDomainUnordered(hosts, rules).orderBy("doc_id")

  private def registrableDomainUnordered(
      hosts: DataFrame, rules: Seq[String]): DataFrame = {
    val spark = hosts.sparkSession
    import spark.implicits._
    val ruleDf = parseRules(rules).toDF("match_str", "is_exc", "rule_labels", "delta")

    val labeled = hosts.select(col("doc_id"), col("host"),
      split(col("host"), "\\.").as("ls"))
      .withColumn("n", size(col("ls")))

    // candidate suffixes with 1-based positions; k = position of the
    // suffix's first label in the host
    val cand = labeled
      .select(col("doc_id"), col("host"), col("ls"), col("n"),
        posexplode(sequence(lit(1), col("n"))))
      .select(col("doc_id"), col("host"), col("ls"), col("n"),
        col("col").as("k"),
        array_join(slice(col("ls"), col("col"),
          col("n") - col("col") + 1), ".").as("suffix"))

    // join rules; a wildcard match needs a label BEFORE the tail (k ≥ 2);
    // derive the public-suffix position, then materialize ps / registrable
    // as strings so the window exchange carries no array column
    val matched = cand.join(broadcast(ruleDf), col("suffix") === col("match_str"))
      .where(col("delta") =!= -1 || col("k") >= 2)
      .withColumn("ps_pos", col("k") - when(col("delta") === -1, 1)
        .when(col("delta") === 1, -1).otherwise(0))
      // an exception rule's suffix must still fit in the host
      .where(col("ps_pos") <= col("n"))
      .select(col("doc_id"), col("is_exc"), col("rule_labels"), col("ps_pos"),
        array_join(slice(col("ls"), col("ps_pos"),
          col("n") - col("ps_pos") + 1), ".").as("ps"),
        when(col("ps_pos") >= 2,
          array_join(slice(col("ls"), col("ps_pos") - 1,
            col("n") - col("ps_pos") + 2), ".")).as("reg"))

    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("is_exc").desc, col("rule_labels").desc, col("ps_pos").asc)
    val best = matched.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("ps"), col("reg"))

    // implicit `*` fallback: public suffix = last label. The fallback keys
    // on the MATCH being absent (ps null), not on reg being null — a matched
    // host that IS a public suffix has reg legitimately NULL. Fallback
    // values are materialized as scalars BEFORE the rejoin so the labels
    // array never rides the doc_id exchange (plan-pinned).
    val base = labeled.select(col("doc_id"), col("host"),
      element_at(col("ls"), -1).as("fb_ps"),
      when(col("n") >= 2,
        array_join(slice(col("ls"), col("n") - 1, lit(2)), ".")).as("fb_reg"))
    base.join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("host"),
        coalesce(col("ps"), col("fb_ps")).as("public_suffix"),
        when(col("ps").isNotNull, col("reg")).otherwise(col("fb_reg"))
          .as("registrable"))
  }
}
