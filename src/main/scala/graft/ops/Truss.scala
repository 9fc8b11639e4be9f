package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition by support peeling (Cohen, "Trusses: cohesive
  * subgraphs for social network analysis", 2008): the k-truss is the
  * maximal subgraph in which every EDGE participates in at least k−2
  * triangles (of the subgraph). The edge-level sibling of [[KCore]] —
  * a strictly stronger cohesion screen (every k-truss is a (k−1)-core)
  * and the standard community-backbone primitive.
  *
  * Peeling: per round, compute each surviving edge's triangle support
  * with the degree-oriented adjacency-intersection recipe (the
  * [[Triangles]] form — every out-neighbor array bounded O(√m), one
  * native `array_intersect` per edge, no wedge shuffle), drop edges
  * below k−2, repeat until the edge count stops shrinking. The edge
  * set shrinks monotonically, so an unchanged count IS the fixpoint
  * (the KCore stop rule); `localCheckpoint` truncates lineage per
  * round. Rounds are bounded by the peeling depth.
  */
object Truss {

  /** Per-edge triangle support of a canonical (src < dst) edge list:
    * (src, dst, sup) — edges in no triangle are ABSENT (support 0).
    * Each triangle {a,b,c} found once via degree orientation, then
    * exploded onto its three canonical edges. */
  private[ops] def supports(e0: DataFrame): DataFrame = {
    val deg = e0.select(col("src").as("node"))
      .unionAll(e0.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val lower = struct(col("ds"), col("src")) < struct(col("dd"), col("dst"))
    val oriented = e0
      .join(deg.select(col("node").as("src"), col("deg").as("ds")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("dd")), "dst")
      .select(when(lower, col("src")).otherwise(col("dst")).as("a"),
        when(lower, col("dst")).otherwise(col("src")).as("b"))
      .localCheckpoint(true) // adjacency + probe legs: compute once
    val adj = oriented.groupBy(col("a"))
      .agg(collect_list(col("b")).as("nbrs"))
    val tris = oriented
      .join(adj.select(col("a"), col("nbrs").as("na")), "a")
      .join(adj.select(col("a").as("b"), col("nbrs").as("nb")), "b")
      .select(col("a"), col("b"),
        explode(array_intersect(col("na"), col("nb"))).as("c"))
    tris.select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
      .unionAll(tris.select(least(col("a"), col("c")).as("src"),
        greatest(col("a"), col("c")).as("dst")))
      .unionAll(tris.select(least(col("b"), col("c")).as("src"),
        greatest(col("b"), col("c")).as("dst")))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("sup"))
  }

  /** @param edges undirected simple graph, canonical src < dst, no
    *              duplicates.
    * @param maxRounds hard bound on peeling rounds. Exhausting it
    *                  without reaching the fixpoint THROWS rather than
    *                  silently returning a non-truss edge set — callers
    *                  pairing with an unrolled SQL oracle must keep
    *                  `maxRounds <= nLayers` so a too-deep peel fails
    *                  loudly instead of diverging the hash gate.
    * @return (trussEdges, rounds): the k-truss edge list and the
    *         number of strict-shrink peeling rounds to the fixpoint. */
  def truss(edges: DataFrame, k: Int,
      maxRounds: Int = 64): (DataFrame, Int) = {
    require(k >= 3, s"k must be >= 3, got $k")
    var cur = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    var curCount = cur.count()
    var round = 0
    var done = curCount == 0
    while (!done && round < maxRounds) {
      val keep = supports(cur).where(col("sup") >= k - 2)
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
      val m = keep.count()
      if (m == curCount) done = true // nothing dropped: fixpoint
      else {
        cur = keep // the support frame's edges ARE the survivors
        curCount = m
        round += 1
        if (m == 0) done = true
      }
    }
    if (!done) throw new IllegalStateException(
      s"k-truss peel still shrinking after maxRounds=$maxRounds " +
        s"(edges=$curCount): result would not be a $k-truss; raise " +
        "maxRounds (and any paired oracle's nLayers)")
    (if (curCount == 0) cur.limit(0) else cur, round)
  }
}
