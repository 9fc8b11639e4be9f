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
  */
object Bfs {

  /** @param edges undirected `(src, dst)` edge list (canonical
    *              direction fine — both directions are traversed).
    * @return (node, hop) — minimum hop distance, hop <= maxHops. */
  def hops(edges: DataFrame, seed: Long, maxHops: Int): DataFrame = {
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
      .localCheckpoint(true)
    val spark = edges.sparkSession
    import spark.implicits._
    var visited = Seq((seed, 0)).toDF("node", "hop").localCheckpoint(true)
    var frontier = visited.select(col("node"))
    var h = 1
    var exhausted = false
    while (h <= maxHops && !exhausted) {
      // coalesce the (tiny) frontier before materializing: a ball
      // boundary is a sliver of the 32-partition join output, and
      // every later job pays one task per partition (A/B: the
      // per-round task count dominated wall time on small graphs)
      val next = frontier.join(und, col("node") === col("a"))
        .select(col("b").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .coalesce(8)
        .localCheckpoint(true)
      if (next.isEmpty) exhausted = true
      else {
        // NO re-checkpoint of visited: it is a shallow union of
        // already-materialized per-hop frames, so re-checkpointing it
        // every round was one full extra job per hop for nothing
        visited = visited.union(next.select(col("node"), lit(h).as("hop")))
        frontier = next
        h += 1
      }
    }
    visited
  }
}
