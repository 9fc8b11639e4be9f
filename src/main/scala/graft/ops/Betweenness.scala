package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampled betweenness centrality (Brandes 2001 dependency
  * accumulation over a bounded pivot sample — the standard scalable
  * estimator per Brandes & Pich 2007): for each sampled source s, a
  * forward BFS records depth d(s,v) AND shortest-path counts σ(s,v),
  * then a backward per-layer pass accumulates the dependency
  *   δ(v) = Σ_{w: d(w)=d(v)+1, (v,w)∈E} σ(v)/σ(w) · (1 + δ(w)),
  * and betweenness(v) = Σ_s δ_s(v). All-pairs Brandes is O(V·E) —
  * the pivot sample and depth cap make the result closed-form and
  * bounded, exactly like [[Centrality.sampledHarmonic]].
  *
  * Exactness: σ is a pure integer path count; each dependency term
  * floors ONCE to micro-units as the pure-integer
  * `(σ_v · (10⁶ + δ_w)) div σ_w` (trunc ≡ floor: everything is
  * nonneg), so δ and the final sums are integer arithmetic end to
  * end — an unrolled-CTE oracle replays sampling, both passes, and
  * the ranking bit-for-bit (no float ever enters).
  *
  * Scale shape: the forward pass is ONE multi-source frontier
  * expansion (the [[Centrality]] recipe — per hop: frontier ⋈ edges,
  * groupBy (s,node) summing σ map-side, LEFT ANTI vs visited,
  * count-scaled fan-in, lazy checkpoint materialized by the count
  * probe). The backward pass is `maxDepth` layer joins, each
  * O(edges between adjacent layers), hash-partitioned on node ids;
  * per-layer frames are the already-materialized forward checkpoints.
  * Nothing collects beyond one-row envelope guards.
  *
  * Overflow envelope (fail fast, never silently diverge — the
  * VoptHist/Hits rule): σ_max < 2²⁰ and δ_max < 2⁴² are checked as
  * one-row aggregates, so every product σ_v·(10⁶+δ_w) < 2⁶³ on both
  * engines (DuckDB would error on BIGINT overflow; Spark ANSI too —
  * the require makes the bound a declared semantic, not luck). */
object Betweenness {

  /** @param edges undirected canonical (src, dst) edge list.
    * @return (rk, node, bc_micro, n_src): top-k nodes by sampled
    *         betweenness in micro-units (ties by node id); n_src =
    *         sampled sources whose BFS tree contains the node at
    *         depth >= 1. */
  def sampledBrandes(edges: DataFrame, nSources: Int, maxDepth: Int,
      k: Int): DataFrame = {
    require(nSources >= 1 && maxDepth >= 2 && k >= 1)
    val spark = edges.sparkSession
    import spark.implicits._
    val shuffleParts = spark.sessionState.conf.numShufflePartitions
    // long ids at entry (the Hits/Truss rule); one shared recipe for
    // the materialized bidirectional traversal frame
    val und = Bfs.undOf(edges)
    val srcs = und.select(col("a").as("node")).distinct()
      .orderBy(substring(md5(col("node").cast("string")), 1, 13),
        col("node"))
      .limit(nSources)

    // ---- forward pass: multi-source BFS carrying sigma ----
    var visited = srcs.select(col("node").as("s"), col("node"),
        lit(1L).as("sigma"))
      .localCheckpoint(true)
    val layers = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val layerRows = scala.collection.mutable.ArrayBuffer[Long]()
    var frontier = visited
    var frontierRows = nSources.toLong
    var visitedRows = nSources.toLong
    var h = 1
    var exhausted = false
    while (h <= maxDepth && !exhausted) {
      // sigma(v at h) = sum of sigma over its depth-(h-1) neighbors;
      // aggregate FIRST (collapses the exploded edge rows to ≤|S|·V
      // map-side-combined groups), THEN anti-join the settled
      // (s,node) pairs — anti-joining the edge-level rows first was
      // measured 2x slower (the join re-shuffles the whole wedge
      // stream; excluded nodes' sums are discarded either way)
      // count-informed broadcasts (the Bfs rule): frontier/visited
      // sizes are exact from the probes; without the hint the
      // materialized edge frame re-exchanges every hop
      val next = Bfs.bcastIfSmall(frontier, frontierRows)
        .join(und, col("node") === col("a"))
        .select(col("s"), col("b").as("node"), col("sigma"))
        .groupBy(col("s"), col("node"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(Bfs.bcastIfSmall(visited.select(col("s"), col("node")),
          visitedRows), Seq("s", "node"), "left_anti")
        .coalesce(Bfs.fanIn(frontierRows, shuffleParts))
        .localCheckpoint(false)
      val n = next.count() // one job per hop; count IS the probe
      if (n == 0L) exhausted = true
      else {
        layers += next
        layerRows += n
        visited = visited.unionByName(next)
        visitedRows += n
        frontier = next
        frontierRows = n
        h += 1
      }
    }
    val hmax = layers.size // deepest populated layer (0 if none)
    if (hmax == 0) {
      // sources never expand: every sampled delta is empty
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("rk", "node", "bc_micro", "n_src")
    }
    // ONE envelope job over the already-materialized layer frames
    val sigMax = layers.map(_.select(col("sigma"))).reduce(_ union _)
      .agg(max(col("sigma"))).collect()(0).getLong(0)
    require(sigMax < (1L << 20),
      s"Brandes sigma envelope exceeded: max path count $sigMax >= 2^20 " +
        "— the micro-unit dependency product would overflow BIGINT; " +
        "lower maxDepth or sample sparser sources")

    // ---- backward pass: per-layer dependency accumulation ----
    // deepest layer has delta = 0; layer h reads layer h+1 only
    var deltaNext = layers(hmax - 1)
      .select(col("s"), col("node"), col("sigma"), lit(0L).as("delta"))
    val deltas = scala.collection.mutable.ArrayBuffer[DataFrame](deltaNext)
    var bh = hmax - 1
    while (bh >= 1) {
      // layer sizes are known from the forward probes — broadcast
      // both per-layer sides so the edge frame is probed map-side
      val v = Bfs.bcastIfSmall(
        layers(bh - 1).select(col("s"), col("node").as("vnode"),
          col("sigma").as("vsigma")), layerRows(bh - 1))
      val w = Bfs.bcastIfSmall(
        deltaNext.select(col("s").as("ws"),
          col("node").as("wnode"), col("sigma").as("wsigma"),
          col("delta").as("wdelta")), layerRows(bh))
      val contrib = v
        .join(und, col("vnode") === col("a"))
        .join(w, col("ws") === col("s") && col("wnode") === col("b"))
        .select(col("s"), col("vnode").as("node"),
          expr("(vsigma * (1000000 + wdelta)) div wsigma").as("term"))
        .groupBy(col("s"), col("node"))
        .agg(sum(col("term")).as("dsum"))
      val dh = layers(bh - 1)
        .join(contrib, Seq("s", "node"), "left")
        .select(col("s"), col("node"), col("sigma"),
          coalesce(col("dsum"), lit(0L)).as("delta"))
        .localCheckpoint(false) // lazy: the envelope agg materializes it
      val dMax = dh.agg(max(col("delta"))).collect()(0).getLong(0)
      require(dMax < (1L << 42),
        s"Brandes delta envelope exceeded: max dependency $dMax >= 2^42 " +
          "— the next layer's product would overflow BIGINT")
      deltas += dh
      deltaNext = dh
      bh -= 1
    }

    import org.apache.spark.sql.expressions.Window
    deltas.reduce(_ unionByName _)
      .groupBy(col("node"))
      .agg(sum(col("delta")).as("bc_micro"),
        count(lit(1)).as("n_src"))
      .orderBy(desc("bc_micro"), asc("node")).limit(k)
      .select(row_number().over(
          Window.orderBy(desc("bc_micro"), asc("node")))
          .cast("long").as("rk"),
        col("node"), col("bc_micro"), col("n_src"))
  }
}
