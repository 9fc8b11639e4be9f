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
  * node ids), one (node → min) hash agg, one left join against the
  * current dist frame, count-scaled fan-in, lazy checkpoint
  * materialized by the count probe; the dist frame re-checkpoints
  * eagerly per round (it feeds two joins next round). Rounds are
  * bounded; nothing collects. */
object Sssp {

  /** @param edges weighted (src, dst, cost) list, traversed both
    *              directions; cost must be a nonneg integer column.
    * @param seed  source node id.
    * @return (node, d) exact min path cost within maxRounds edges. */
  def boundedBellmanFord(edges: DataFrame, seed: Long,
      maxRounds: Int): DataFrame = {
    require(maxRounds >= 1)
    val spark = edges.sparkSession
    import spark.implicits._
    val shuffleParts = spark.sessionState.conf.numShufflePartitions
    val ed = edges.select(col("src").cast("long").as("a"),
        col("dst").cast("long").as("b"), col("cost").cast("long"))
      .union(edges.select(col("dst").cast("long").as("a"),
        col("src").cast("long").as("b"), col("cost").cast("long")))
      .localCheckpoint(true)
    var dist = Seq((seed, 0L)).toDF("node", "d").localCheckpoint(true)
    var frontier = dist
    var frontierRows = 1L
    var r = 1
    var done = false
    while (r <= maxRounds && !done) {
      val cand = frontier
        .join(ed, col("node") === col("a"))
        .select(col("b").as("node"), (col("d") + col("cost")).as("nd"))
        .groupBy(col("node")).agg(min(col("nd")).as("nd"))
      val improved = cand
        .join(dist, Seq("node"), "left")
        .where(col("d").isNull || col("nd") < col("d"))
        .select(col("node"), col("nd").as("d"))
        .coalesce(Bfs.fanIn(frontierRows, shuffleParts))
        .localCheckpoint(false)
      val n = improved.count() // one job; count IS the probe
      if (n == 0L) done = true
      else {
        dist = dist.join(improved, Seq("node"), "left_anti")
          .unionByName(improved)
          .localCheckpoint(true) // feeds two joins next round
        frontier = improved
        frontierRows = n
        r += 1
      }
    }
    dist
  }

  /** Top-k nearest nodes from the md5-rank-smallest seed:
    * (rk, node, dist_cost), dist ascending, ties by node id. */
  def nearestFromMd5Seed(edges: DataFrame, maxRounds: Int,
      k: Int): DataFrame = {
    val seed = edges
      .select(col("src").cast("long").as("node"))
      .union(edges.select(col("dst").cast("long").as("node")))
      .distinct()
      .orderBy(substring(md5(col("node").cast("string")), 1, 13),
        col("node"))
      .limit(1).collect()(0).getLong(0)
    import org.apache.spark.sql.expressions.Window
    boundedBellmanFord(edges, seed, maxRounds)
      .orderBy(asc("d"), asc("node")).limit(k)
      .select(row_number().over(Window.orderBy(asc("d"), asc("node")))
          .cast("long").as("rk"),
        col("node"), col("d").as("dist_cost"))
  }
}
