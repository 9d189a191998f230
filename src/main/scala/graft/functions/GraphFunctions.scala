package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph operators over edge tables (d20's connected components lives in
  * DedupFunctions; this file holds rank/centrality shapes).
  */
object GraphFunctions {

  /** PageRank (Brin & Page 1998, public) over a weighted edge list
    * (src, dst, cnt) — `iters` damped power iterations from a uniform start:
    * `r'(v) = (1-d)/N + d · Σ_{u→v} r(u) · cnt(u,v)/outW(u)` (no dangling
    * redistribution — nodes without outlinks simply leak rank mass, the
    * standard simplification; document when it matters). Returns
    * (node, rank) with raw doubles.
    *
    * Determinism/oracle discipline: per-node inbound contributions are
    * folded in SOURCE order (`sort_array` over collected (src, c) structs,
    * then a left fold) — the float sum is bit-stable at any parallelism and
    * reproducible by an oracle's `list_sum(list(c ORDER BY src))`. All
    * constants stay in engine-double arithmetic ((1-d)/N is computed the
    * same op sequence both sides) so ranks hash-match WITHOUT rounding.
    *
    * Scale shape: per iteration, ONE equi-join of edges against the rank
    * table on src and ONE (dst) aggregation — the canonical two exchanges
    * of distributed PageRank; both key on node ids, never on payloads.
    * Edges are pre-normalized once (cnt/outW). The collect_list per dst is
    * bounded by in-degree (fan-in); a celebrity node at web scale gets the
    * same two-stage salted treatment as any hot aggregation key (q09) at
    * the cost of fixing a fold order per salt — or drop the bit-stability
    * requirement and use a plain sum. `localCheckpoint` cuts per-iteration
    * lineage (the x13 discipline). N is O(1) control-plane state. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1, s"iters=$iters d=$damping")
    // localCheckpoint nodes AND the normalized edge table (the x13
    // discipline): both feed EVERY iteration's job — unmaterialized, the
    // union-distinct and the outW join replan per iteration, iters× the
    // documented one-time normalization cost
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank over an empty edge list")
    val outW = edges.groupBy(col("src")).agg(sum(col("cnt")).as("w"))
    val e = edges.join(outW, Seq("src"))
      .select(col("src"), col("dst"), (col("cnt").cast("double") / col("w")).as("p"))
      .localCheckpoint()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), col("src"), (col("rank") * col("p")).as("c"))
      val inSum = contribs.groupBy(col("dst"))
        .agg(aggregate(sort_array(collect_list(struct(col("src"), col("c")))),
          lit(0.0), (acc, x) => acc + x("c")).as("s"))
      ranks = nodes.join(inSum, nodes("node") === inSum("dst"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) + lit(damping) * coalesce(col("s"), lit(0.0)))
            .as("rank"))
        .localCheckpoint()
    }
    ranks.orderBy("node")
  }

  /** Event-type navigation graph: transitions between consecutive events of
    * a user (ordered by ts with event_id tiebreak), aggregated to weighted
    * (src, dst, cnt) edges — the clickstream Markov graph. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .select(col("prev").as("src"), col("event_type").as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
  }
}
