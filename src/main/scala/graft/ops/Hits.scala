package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg, JACM 1999) over a directed /
  * bipartite edge list — the mutually-reinforcing companion to
  * [[PageRank]] (authority = pointed to by good hubs, hub = points at
  * good authorities; on a customer→part graph: influential buyers and
  * flagship parts).
  *
  * Iterated ENTIRELY on the integer grid so the fixed-iteration result
  * is deterministic and engine-replayable (the gridLeadingAxis recipe,
  * but matrix-free and DISTRIBUTED): scores live on a 10⁶ fixed-point
  * grid; each iteration is
  *
  *   `a(p) = Σ_{u→p} h(u)` then `a ← a·10⁶ div max(a)`,
  *   `h(u) = Σ_{u→p} a(p)` then `h ← h·10⁶ div max(h)`,
  *
  * where every sum is an exact BIGINT and the truncating div agrees in
  * every engine on nonnegatives. Spark shape per iteration: two
  * equi-join + hash-aggregate passes keyed on node ids (successive
  * iterations reuse the partitioning — the PageRank loop), and the
  * max-norm rides as a one-row broadcast crossJoin — a mid-loop
  * collect instead measured +12-25% (it ADDS a synchronous job per
  * half-iteration, where the broadcast agg executes inside the
  * checkpoint job); `localCheckpoint` truncates lineage per round.
  *
  * Bound: `10⁶ · max(raw)` must stay inside BIGINT; since every score
  * is ≤ 10⁶ after renorm, `raw ≤ 10⁶·degree`, so the envelope is
  * `10¹² · max_degree < 2⁶³` (max degree < ~9.2·10⁶) — ENFORCED by
  * ONE degree aggregate at entry (fail fast instead of wrapping while
  * a HUGEINT oracle diverges); past that, move the renorm product to
  * DECIMAL(38,0). */
object Hits {

  /** @param edges directed edges (src, dst), no duplicates.
    * @return (hubs, authorities): (id, s) frames on the 10⁶ grid. */
  def scores(edges: DataFrame, iters: Int = 4): (DataFrame, DataFrame) = {
    require(iters >= 1, s"iters $iters")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    var h = e.select(col("src").as("id")).distinct()
      .select(col("id"), lit(1000000L).as("s"))
      .localCheckpoint(true)
    var a: DataFrame = null
    // ONE bounded degree aggregate enforces the whole loop's BIGINT
    // envelope up front (raw ≤ 10⁶·degree every iteration) — a per-
    // renorm collect measured +12-25% wall (extra sync job per half-
    // iteration); null max = empty graph, which the loop handles
    val maxDegRow = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
      .agg(max(col("d")).as("mx"), count(lit(1)).as("n")).collect()(0)
    if (!maxDegRow.isNullAt(0)) {
      val maxDeg = maxDegRow.getLong(0)
      require(maxDeg <= Long.MaxValue / 1000000L / 1000000L,
        s"max degree $maxDeg would wrap raw*1000000 in BIGINT on the " +
          "10^6 grid — move the renorm product to DECIMAL(38,0)")
    }
    // count-informed broadcast (the Bfs rule): the checkpointed edge
    // frame has UnknownPartitioning, so joining the O(V) score frame
    // without a hint re-EXCHANGES all of e twice per iteration; the
    // node count is already on the envelope row
    val nNodes = maxDegRow.getLong(1)
    def scoreSide(df: DataFrame): DataFrame =
      Bfs.bcastIfSmall(df, nNodes)
    for (_ <- 1 to iters) {
      val araw = e
        .join(scoreSide(h.select(col("id").as("src"), col("s").as("hs"))),
          Seq("src"))
        .groupBy(col("dst")).agg(sum(col("hs")).as("raw"))
      a = araw.crossJoin(broadcast(araw.agg(max(col("raw")).as("mx"))))
        .selectExpr("dst AS id", "CAST(raw * 1000000 DIV mx AS BIGINT) AS s")
        .localCheckpoint(true)
      val hraw = e
        .join(scoreSide(a.select(col("id").as("dst"), col("s").as("as_"))),
          Seq("dst"))
        .groupBy(col("src")).agg(sum(col("as_")).as("raw"))
      h = hraw.crossJoin(broadcast(hraw.agg(max(col("raw")).as("mx"))))
        .selectExpr("src AS id", "CAST(raw * 1000000 DIV mx AS BIGINT) AS s")
        .localCheckpoint(true)
    }
    (h, a)
  }
}
