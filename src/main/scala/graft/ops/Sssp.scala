package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round single-source shortest paths over a WEIGHTED edge
  * list (frontier Bellman-Ford — the distributed SSSP that Dijkstra's
  * priority queue can't express; rounds ≡ Pregel supersteps): after R
  * rounds the distance is the exact minimum cost over paths of ≤ R
  * edges, so bounding R makes the result closed-form — an
  * unrolled-CTE oracle replays it exactly (the [[Bfs]] contract,
  * weighted).
  *
  * Frontier form: only nodes IMPROVED in round r−1 relax in round r.
  * By induction this computes the same dist_r as the textbook
  * all-edges round (a non-improved node's relaxations were already
  * applied the round after it last improved), while the per-round
  * work drops from O(E) to O(edges out of the frontier).
  *
  * Exactness: integer costs only (the caller quantizes weights — the
  * q_sssp query uses `10⁶ div support`), so min/plus arithmetic is
  * engine-exact; ties in the final ranking break by node id.
  *
  * Scale shape: per round, one equi join (frontier ⋈ edges, hash on
  * node ids), one (node → min) hash agg, and ONE full-outer min-merge
  * into the dist frame that also tags improvements — a single lazy
  * checkpoint materialized by the improvement-count probe (one Spark
  * job per round), with next round's frontier a free filter over the
  * materialized merge. Rounds are bounded; nothing collects. */
object Sssp {

  /** @param edges weighted (src, dst, cost) list, traversed both
    *              directions; cost must be a nonneg integer column.
    * @param seed  source node id.
    * @return (node, d) exact min path cost within maxRounds edges. */
  /** The materialized bidirectional weighted traversal frame — built
    * ONCE per graph and shared with the seed scan (the Bfs.undOf
    * rule: every consumer of a raw edge frame re-executes the whole
    * upstream graph build). */
  def edOf(edges: DataFrame): DataFrame = {
    // checkpoint the DIRECTED projection, derive the reverse
    // direction narrowly (the Bfs.undOf rule: checkpointing the
    // union would run the upstream build once per leg)
    val e = edges.select(col("src").cast("long").as("a"),
        col("dst").cast("long").as("b"), col("cost").cast("long"))
      .localCheckpoint(true)
    val ed = e.union(e.select(col("b").as("a"), col("a").as("b"),
      col("cost")))
    // fail-fast envelope (the VoptHist rule): the bounded-round
    // min-merge is only shortest-paths for NONNEG costs — a negative
    // cost silently degrades to "min cost over <= R edges", which no
    // oracle mirrors. One-row agg over the materialized checkpoint.
    val minCost = ed.agg(min(col("cost"))).collect()(0)
    require(minCost.isNullAt(0) || minCost.getLong(0) >= 0L,
      s"Sssp requires nonneg integer costs; min(cost) = " +
        s"${minCost.getLong(0)}")
    ed
  }

  def boundedBellmanFord(edges: DataFrame, seed: Long,
      maxRounds: Int): DataFrame =
    bellmanFordOnEd(edOf(edges), seed, maxRounds)

  /** [[boundedBellmanFord]] over an already-materialized [[edOf]]
    * frame. */
  def bellmanFordOnEd(ed: DataFrame, seed: Long,
      maxRounds: Int): DataFrame = {
    require(maxRounds >= 1)
    val spark = ed.sparkSession
    import spark.implicits._
    var dist = Seq((seed, 0L)).toDF("node", "d").localCheckpoint(true)
    var frontier = dist
    var frontierRows = 1L
    var r = 1
    var done = false
    while (r <= maxRounds && !done) {
      // ONE job per round (measured ~2x over the improved-frame +
      // anti-merge form, which paid two materializations and an extra
      // shuffle): relax the frontier, min-merge into dist via ONE
      // full-outer join (using-columns coalesce the key), tag
      // improvements, lazy-checkpoint; the improvement-count probe
      // materializes the merged frame, and next round's frontier is a
      // free filter over it.
      // count-informed broadcast (the Bfs rule): the materialized
      // edge frame otherwise re-exchanges every round
      val cand = Bfs.bcastIfSmall(frontier, frontierRows)
        .join(ed, col("node") === col("a"))
        .select(col("b").as("node"), (col("d") + col("cost")).as("nd"))
        .groupBy(col("node")).agg(min(col("nd")).as("nd"))
      val better = col("d").isNull ||
        (col("nd").isNotNull && col("nd") < col("d"))
      val merged = dist.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          when(better, col("nd")).otherwise(col("d")).as("d"),
          better.as("imp"))
        .localCheckpoint(false)
      val nImp = merged.where(col("imp")).count() // the probe job
      if (nImp == 0L) done = true
      else {
        dist = merged.select(col("node"), col("d"))
        frontier = merged.where(col("imp")).select(col("node"), col("d"))
        frontierRows = nImp
        r += 1
      }
    }
    dist.select(col("node"), col("d"))
  }

  /** Top-k nearest nodes from the md5-rank-smallest seed:
    * (rk, node, dist_cost), dist ascending, ties by node id. */
  def nearestFromMd5Seed(edges: DataFrame, maxRounds: Int,
      k: Int): DataFrame = {
    // one graph build: the seed scan reads the materialized frame
    val ed = edOf(edges)
    val seedRows = ed
      .select(col("a").as("node")).distinct()
      .orderBy(substring(md5(col("node").cast("string")), 1, 13),
        col("node"))
      .limit(1).collect()
    import org.apache.spark.sql.expressions.Window
    // empty-graph-safe (the sampledBrandes rule): no edges -> no seed
    // -> an empty (rk, node, dist_cost) frame, not an AIOOBE
    if (seedRows.isEmpty) {
      val spark = edges.sparkSession
      return spark.range(0).select(col("id").as("rk"),
        col("id").as("node"), col("id").as("dist_cost"))
    }
    val seed = seedRows(0).getLong(0)
    bellmanFordOnEd(ed, seed, maxRounds)
      .orderBy(asc("d"), asc("node")).limit(k)
      .select(row_number().over(Window.orderBy(asc("d"), asc("node")))
          .cast("long").as("rk"),
        col("node"), col("d").as("dist_cost"))
  }
}
