package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration damped PageRank over an explicit edge list — the
  * importance-weighting companion to ConnectedComponents (e.g. domain/
  * document authority as a quality-mixing signal).
  *
  * Each iteration is ONE equi-join (previous ranks onto edges keyed by
  * src) + ONE aggregate (contributions summed by dst) + a left join
  * back onto the node set — all shuffles on the node id, so successive
  * iterations reuse the same hash partitioning; no collect touches the
  * driver and nothing is quadratic in the graph. `localCheckpoint`
  * truncates the growing lineage each round (the ConnectedComponents
  * lesson). The edge+degree frame is materialized once and reused by
  * every iteration.
  *
  * Dangling nodes (no out-edges) simply leak their mass — the common
  * simplification; callers who need the strict stochastic form can add
  * a dangling-mass redistribution term per iteration. A FIXED iteration
  * count (not convergence-tested) keeps the result deterministic and
  * oracle-checkable.
  */
object PageRank {

  /** @param nodes one row per vertex, column `id`
    * @param edges  directed edges, columns `src`, `dst`
    * @param n      vertex count (caller-supplied; one bounded scalar)
    * @return (id, rank) after `iters` damped iterations from 1/n */
  def ranks(nodes: DataFrame, edges: DataFrame, n: Long, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(n > 0, "empty graph")
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outd"))
    val e = edges.join(deg, Seq("src")).localCheckpoint(true)
    var r = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      // count-informed broadcasts (the Bfs rule): the rank and
      // contribution frames are <= n rows — the caller-supplied
      // scalar — while the checkpointed edge frame would otherwise
      // re-exchange every iteration
      val contrib = e
        .join(Bfs.bcastIfSmall(r.withColumnRenamed("id", "src"), n),
          Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("outd")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inbound"))
      r = nodes.select(col("id"))
        .join(Bfs.bcastIfSmall(contrib, n), Seq("id"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("inbound"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    r
  }
}
