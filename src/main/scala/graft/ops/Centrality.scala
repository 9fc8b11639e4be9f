package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampled harmonic centrality (Eppstein & Wang 2004 pivot sampling;
  * harmonic rather than closeness per Boldi & Vigna 2014 — the form
  * that handles disconnected graphs gracefully): centrality of v ≈
  * Σ_{s ∈ sample} 1/d(s, v) over a bounded deterministic source
  * sample. All-pairs BFS is the textbook non-starter at scale; pivot
  * sampling is the published answer, and bounding BOTH the sample and
  * the depth makes the result closed-form — exactly replayable by a
  * recursive-CTE oracle (the [[Bfs]] contract, multi-source).
  *
  * Exactness: each 1/d term floors ONCE to micro-units as the integer
  * `10⁶ div d` (d is an exact hop count ≥ 1, so this is pure integer
  * arithmetic — not even the floor-once double chain is needed), and
  * centralities are integer sums. Sources are the md5-rank-smallest
  * nodes (replayable, the GridKmeans sample rule).
  *
  * Scale shape: ONE multi-source frontier expansion — the per-hop
  * frontier carries (source, node) pairs so all |S| BFS trees advance
  * in the same join (work per hop = Σ frontier boundaries, hash on
  * node ids), LEFT ANTI against the visited set, `localCheckpoint`
  * lineage truncation per hop. The |S|× state factor is explicit and
  * bounded; nothing collects. */
object Centrality {

  /** @param edges undirected (src, dst) canonical edge list.
    * @return (rk, node, h_micro, n_reached): top-k nodes by sampled
    *         harmonic centrality in micro-units (ties by node id). */
  def sampledHarmonic(edges: DataFrame, nSources: Int, maxDepth: Int,
      k: Int): DataFrame = {
    require(nSources >= 1 && maxDepth >= 1 && k >= 1)
    val shuffleParts =
      edges.sparkSession.sessionState.conf.numShufflePartitions
    // long ids at entry (the Hits/Truss rule); one shared recipe for
    // the materialized bidirectional traversal frame
    val und = Bfs.undOf(edges)
    val srcs = und.select(col("a").as("node")).distinct()
      .orderBy(substring(md5(col("node").cast("string")), 1, 13),
        col("node"))
      .limit(nSources)
    var visited = srcs.select(col("node").as("s"), col("node"),
        lit(0).as("d"))
      .localCheckpoint(true)
    var visitedRows = nSources.toLong
    var frontier = visited.select(col("s"), col("node"))
    var frontierRows = nSources.toLong
    var h = 1
    var exhausted = false
    while (h <= maxDepth && !exhausted) {
      // same per-round economics as Bfs.hopsDetailed: count-scaled
      // fan-in on the frontier, lazy checkpoint materialized by the
      // count that doubles as the emptiness probe (ONE job per hop),
      // never re-checkpoint the visited union of already-materialized
      // frames — and count-informed broadcasts (the Bfs rule: the
      // checkpointed edge frame otherwise re-exchanges every hop)
      val next = Bfs.bcastIfSmall(frontier, frontierRows)
        .join(und, col("node") === col("a"))
        .select(col("s"), col("b").as("node")).distinct()
        .join(Bfs.bcastIfSmall(visited.select(col("s"), col("node")),
            visitedRows),
          Seq("s", "node"), "left_anti")
        .coalesce(Bfs.fanIn(frontierRows, shuffleParts))
        .localCheckpoint(false)
      val n = next.count()
      if (n == 0L) exhausted = true
      else {
        visited = visited
          .unionByName(next.select(col("s"), col("node"), lit(h).as("d")))
        visitedRows += n
        frontier = next.select(col("s"), col("node"))
        frontierRows = n
        h += 1
      }
    }
    import org.apache.spark.sql.expressions.Window
    visited.where(col("d") >= 1)
      .groupBy(col("node"))
      .agg(sum(expr("1000000L div d")).as("h_micro"),
        count(lit(1)).as("n_reached"))
      .orderBy(desc("h_micro"), asc("node")).limit(k)
      .select(row_number().over(
          Window.orderBy(desc("h_micro"), asc("node")))
          .cast("long").as("rk"),
        col("node"), col("h_micro"), col("n_reached"))
  }

  /** Double-sweep diameter LOWER BOUND (Magnien, Latapy & Habib
    * 2009 — the standard cheap bound; exact on trees): BFS from the
    * md5-rank-smallest node, take the farthest reached node (max hop,
    * ties to the smaller id), BFS again from it — the second
    * eccentricity lower-bounds the diameter, usually tightly on
    * real-world graphs. Two bounded [[Bfs]]-shaped expansions (the
    * same frontier + LEFT ANTI machinery), each depth-capped at
    * `maxDepth`.
    *
    * Round economics: both sweeps run through [[Bfs.sweepStats]] —
    * ONE job per hop whose probe aggregate carries eccentricity, the
    * farthest-node argmax (hop desc ⇒ last layer; node asc ⇒ its
    * min) and the reached count, so the former post-sweep argmax and
    * count jobs are gone; the edge build materializes ONCE (undOf
    * checkpoints the directed frame, the reverse derives narrowly).
    * The driver touches per-layer stat rows only. Returns one row:
    * (seed, far_node, ecc1, diameter_lb, n_reached). */
  def diameterDoubleSweep(edges: DataFrame, maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // ONE materialized traversal frame for the seed scan and BOTH
    // sweeps — each expansion on a raw edge frame would re-execute
    // the whole upstream graph build (measured: the co-purchase
    // self-join ran three times before this hoist)
    val und = Bfs.undOf(edges)
    val seed = und.select(col("a").as("node")).distinct()
      .orderBy(substring(md5(col("node").cast("string")), 1, 13),
        col("node"))
      .limit(1).collect()(0).getLong(0)
    val (ecc1, farNode, _) = Bfs.sweepStats(und, seed, maxDepth)
    val (ecc2, _, nReached) = Bfs.sweepStats(und, farNode, maxDepth)
    Seq((seed, farNode, ecc1.toLong, ecc2.toLong, nReached))
      .toDF("seed", "far_node", "ecc1", "diameter_lb", "n_reached")
  }
}
