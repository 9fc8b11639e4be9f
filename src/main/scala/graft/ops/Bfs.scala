package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth breadth-first search over an undirected edge list:
  * exact minimum hop distance from a seed node for every node within
  * `maxHops` (bounded depth makes the result closed-form — no
  * convergence detection needed, and a recursive-CTE oracle can
  * replay it exactly).
  *
  * Scale shape: the classic frontier expansion — per hop, one equi
  * join of the CURRENT FRONTIER (not the visited set) against the
  * edge list, then a LEFT ANTI join against the visited set; both
  * hash on node ids. Work per round is O(frontier boundary), total
  * O(edges within the ball); `localCheckpoint` truncates lineage per
  * hop (the ConnectedComponents/PageRank/KCore recipe). The visited
  * frame stays distributed throughout — nothing collects.
  *
  * Per-round economics (measured — job latency dominates wall time on
  * small graphs, task fan-in dominates at scale):
  *   - ONE Spark job per hop: the checkpoint is LAZY and materializes
  *     inside the `count()` that doubles as the emptiness probe (the
  *     former eager-checkpoint + `isEmpty` pair was two jobs).
  *   - The frontier coalesces to a fan-in SCALED BY the previous
  *     frontier's row count (floor 8 — a ball boundary at test SF is
  *     a sliver of the 32-partition join output, and every later job
  *     pays one task per partition; ceiling = the session's shuffle
  *     partitions). A fixed fan-in would serialize a 10⁶–10⁷-row
  *     frontier through 8 tasks at 100× scale.
  */
object Bfs {

  /** Rows per post-coalesce frontier partition the fan-in targets.
    * ~64k longs/task keeps a checkpoint partition well under a MB
    * while never letting a large frontier funnel through few tasks. */
  private[ops] val TargetRowsPerPartition = 65536L

  /** Count-scaled coalesce fan-in: floor 8 (sliver frontiers pay the
    * fewest per-job tasks), ceiling `shuffleParts` (coalesce above the
    * parent partition count is a no-op anyway). */
  private[ops] def fanIn(prevRows: Long, shuffleParts: Int): Int =
    math.max(8L, math.min(shuffleParts.toLong,
      prevRows / TargetRowsPerPartition + 1L)).toInt

  /** Row ceiling for count-informed broadcasts inside frontier loops.
    * The traversal frame is a localCheckpoint — UnknownPartitioning
    * and default (huge) stats — so the planner re-EXCHANGES the whole
    * edge frame on every hop's join unless the frontier side
    * broadcasts. The loop KNOWS the frontier/visited row counts
    * exactly (the probe returns them), so it broadcasts whenever the
    * side is ≤ this many 8-byte ids (~32 MB) and falls back to the
    * shuffle join above it — the dial a 100× frontier flips
    * automatically. */
  private[graft] val BroadcastRowLimit = 4L << 20

  /** `frame` hinted for broadcast iff its KNOWN row count is under
    * [[BroadcastRowLimit]]. */
  private[graft] def bcastIfSmall(frame: DataFrame, rows: Long): DataFrame =
    if (rows <= BroadcastRowLimit) broadcast(frame) else frame

  /** The materialized bidirectional traversal frame: build it ONCE
    * per graph and share it across sweeps/loops — every expansion the
    * caller runs on a non-checkpointed edge frame re-executes the
    * whole upstream graph build (the double-sweep paid the
    * co-purchase self-join three times before this was hoisted).
    *
    * The checkpoint wraps the DIRECTED projection and the reverse
    * direction derives narrowly from it: checkpointing the union
    * instead would execute the upstream build once per union LEG —
    * the whole edge build ran twice (measured ~1.5 s of
    * q_diameter_2sweep's 5.7 at sf0.1) — and would also double the
    * stored bytes at scale. */
  def undOf(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("a"),
        col("dst").cast("long").as("b"))
      .localCheckpoint(true)
    e.union(e.select(col("b").as("a"), col("a").as("b")))
  }

  /** @param edges undirected `(src, dst)` edge list (canonical
    *              direction fine — both directions are traversed).
    * @return (node, hop) — minimum hop distance, hop <= maxHops. */
  def hops(edges: DataFrame, seed: Long, maxHops: Int): DataFrame =
    hopsDetailed(edges, seed, maxHops)._1

  /** [[hops]] plus the loop telemetry the caller otherwise pays extra
    * jobs to recover: (visited, deepestHop, lastNonEmptyFrontier).
    * `deepestHop` is the max hop in `visited` (0 when the seed never
    * expands) and the last frontier is exactly the `deepestHop`-hop
    * node set — the double-sweep argmax reads off it with a one-row
    * `min` instead of sorting the whole visited union. */
  def hopsDetailed(edges: DataFrame, seed: Long,
      maxHops: Int): (DataFrame, Int, DataFrame) =
    hopsOnUnd(undOf(edges), seed, maxHops)

  /** [[hopsDetailed]] over an already-materialized [[undOf]] frame. */
  def hopsOnUnd(und: DataFrame, seed: Long,
      maxHops: Int): (DataFrame, Int, DataFrame) = {
    val spark = und.sparkSession
    import spark.implicits._
    val shuffleParts = spark.sessionState.conf.numShufflePartitions
    var visited = Seq((seed, 0)).toDF("node", "hop").localCheckpoint(true)
    var visitedRows = 1L
    var frontier = visited.select(col("node"))
    var frontierRows = 1L
    var h = 1
    var exhausted = false
    while (h <= maxHops && !exhausted) {
      // count-informed broadcasts: the expansion probes the
      // checkpointed edge frame MAP-SIDE (no per-hop edge exchange)
      // and the anti-join stays map-side while visited is small
      val next = bcastIfSmall(frontier, frontierRows)
        .join(und, col("node") === col("a"))
        .select(col("b").as("node")).distinct()
        .join(bcastIfSmall(visited.select(col("node")), visitedRows),
          Seq("node"), "left_anti")
        .coalesce(fanIn(frontierRows, shuffleParts))
        .localCheckpoint(false) // lazy: materializes inside count()
      val n = next.count() // the one job per hop; count IS the probe
      if (n == 0L) exhausted = true
      else {
        // NO re-checkpoint of visited: it is a shallow union of
        // already-materialized per-hop frames, so re-checkpointing it
        // every round was one full extra job per hop for nothing
        visited = visited.union(next.select(col("node"), lit(h).as("hop")))
        visitedRows += n
        frontier = next
        frontierRows = n
        h += 1
      }
    }
    (visited, h - 1, frontier)
  }

  /** Per-layer telemetry of one batched sweep: hop, node count, min
    * node id. */
  final case class LayerStat(hop: Int, n: Long, minNode: Long)

  /** BFS sweep returning telemetry only — the probe that materializes
    * each round is a per-layer `(count, min(node))` aggregate instead
    * of a bare count, so eccentricity, the farthest-node argmax (hop
    * desc, node asc ⇒ last layer's min) and the reached count all
    * come out of the loop probes; callers pay ZERO extra jobs after
    * the sweep (the double-sweep formerly paid an argmax job and a
    * count job on top). Layer semantics are EXACTLY [[hopsOnUnd]]'s
    * (asserted in CentralitySpec), so oracles are untouched.
    *
    * `hopsPerJob > 1` additionally expands that many layers inside
    * one Spark job: cascaded DEDUPED one-hop candidate sets (layer
    * i+1 expands from layer i's candidates minus the visited set),
    * per-node `min(d)` attributing intra-batch layers, one ANTI, one
    * probe. Measured on q_diameter_2sweep's tiny-ball sweeps this is
    * a LOSS (the floor is sequential shuffle STAGES, not jobs, and
    * batching adds stages), so the default stays 1 — the dial exists
    * for genuinely job-latency-bound deployments (e.g. high
    * scheduler-overhead clusters).
    *
    * @return (ecc, farMinNode, nReached): deepest nonempty hop (0 if
    *         the seed never expands), min node id of that deepest
    *         layer (the seed itself at ecc 0), total nodes reached
    *         including the seed. */
  def sweepStats(und: DataFrame, seed: Long, maxHops: Int,
      hopsPerJob: Int = 1): (Int, Long, Long) = {
    require(hopsPerJob >= 1)
    val spark = und.sparkSession
    import spark.implicits._
    val shuffleParts = spark.sessionState.conf.numShufflePartitions
    var visited = Seq((seed, 0)).toDF("node", "hop").localCheckpoint(true)
    var frontier = visited.select(col("node"))
    var frontierRows = 1L
    var ecc = 0
    var farMin = seed
    var farMinStale = false // true while the deepest layer's argmax
                            // hasn't been read (count-probe rounds)
    var nReached = 1L
    var h = 0
    var exhausted = false
    while (h < maxHops && !exhausted) {
      val steps = math.min(hopsPerJob, maxHops - h)
      // count-informed broadcast of the visited set (the frontier
      // broadcast only applies to the batch's FIRST expansion — the
      // inner layers' sizes are unknown until the probe)
      val vSmall = bcastIfSmall(visited.select(col("node")), nReached)
      val layers = scala.collection.mutable.ArrayBuffer[DataFrame]()
      var cur = bcastIfSmall(frontier, frontierRows)
      for (i <- 1 to steps) {
        val c = cur.join(und, col("node") === col("a"))
          .select(col("b").as("node")).distinct()
        layers += c.withColumn("hop", lit(h + i))
        // exact layer h+i membership feeds the next expansion: the
        // candidate set minus everything visited BEFORE this batch
        // (intra-batch earlier layers can't appear — a candidate at
        // layer i+1 with true distance <= h+i is already in layer i's
        // candidate set, and min(hop) below attributes it there)
        if (i < steps)
          cur = c.join(vSmall, Seq("node"), "left_anti")
      }
      // single-layer rounds skip the min(hop) attribution aggregate:
      // the candidate set is already deduped by its distinct
      val merged =
        if (steps == 1) layers.head
        else layers.reduce(_ unionByName _)
          .groupBy(col("node")).agg(min(col("hop")).as("hop"))
      val batch = merged
        .join(vSmall, Seq("node"), "left_anti")
        .coalesce(fanIn(frontierRows, shuffleParts))
        .localCheckpoint(false)
      if (steps == 1) {
        // single-layer probe: a bare count (one stage, no exchange —
        // a per-layer aggregate probe measured ~1 extra stage per hop
        // and ate the savings); farMin recovers in ONE argmax job
        // after the loop
        val n = batch.count()
        if (n == 0L) exhausted = true
        else {
          ecc = h + 1; nReached += n; frontierRows = n
          farMinStale = true
          visited = visited.union(batch)
          frontier = batch.where(col("hop") === ecc).select(col("node"))
          h += 1
        }
      } else {
        // batched rounds need per-layer attribution: ONE probe job
        // returning each new layer's count + min node id
        val stats = batch.groupBy(col("hop"))
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
            min(col("node")).as("mn"))
          .collect()
          .map(r => LayerStat(r.getInt(0), r.getLong(1), r.getLong(2)))
          .sortBy(_.hop)
        var d = h + 1
        var open = true
        stats.foreach { s =>
          if (open && s.hop == d) {
            ecc = s.hop; farMin = s.minNode; nReached += s.n
            frontierRows = s.n
            farMinStale = false
            d += 1
          } else open = false // a gap means the sweep ended mid-batch
        }
        if (ecc < h + steps) exhausted = true
        else {
          visited = visited.union(batch)
          frontier = batch.where(col("hop") === ecc).select(col("node"))
          h += steps
        }
      }
    }
    // the min-node argmax of the deepest layer is one tiny job over
    // the final (coalesced, materialized) frontier — only when a
    // count-probe round left it unread
    if (farMinStale && ecc > 0)
      farMin = frontier.agg(min(col("node"))).collect()(0).getLong(0)
    (ecc, farMin, nReached)
  }
}
