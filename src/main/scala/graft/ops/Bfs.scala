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

  /** The materialized bidirectional traversal frame: build it ONCE
    * per graph and share it across sweeps/loops — every expansion the
    * caller runs on a non-checkpointed edge frame re-executes the
    * whole upstream graph build (the double-sweep paid the
    * co-purchase self-join three times before this was hoisted). */
  def undOf(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long").as("a"),
        col("dst").cast("long").as("b"))
      .union(edges.select(col("dst").cast("long").as("a"),
        col("src").cast("long").as("b")))
      .localCheckpoint(true)

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
    var frontier = visited.select(col("node"))
    var frontierRows = 1L
    var h = 1
    var exhausted = false
    while (h <= maxHops && !exhausted) {
      val next = frontier.join(und, col("node") === col("a"))
        .select(col("b").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .coalesce(fanIn(frontierRows, shuffleParts))
        .localCheckpoint(false) // lazy: materializes inside count()
      val n = next.count() // the one job per hop; count IS the probe
      if (n == 0L) exhausted = true
      else {
        // NO re-checkpoint of visited: it is a shallow union of
        // already-materialized per-hop frames, so re-checkpointing it
        // every round was one full extra job per hop for nothing
        visited = visited.union(next.select(col("node"), lit(h).as("hop")))
        frontier = next
        frontierRows = n
        h += 1
      }
    }
    (visited, h - 1, frontier)
  }
}
