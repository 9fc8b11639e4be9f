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
  * iterations reuse the partitioning — the PageRank loop); the
  * max-norm is a ONE-ROW aggregate collect embedded back as a literal
  * (the bounded-collect class — same cost as the broadcast exchange it
  * replaces, and it lets the BIGINT envelope be CHECKED driver-side);
  * nothing quadratic; `localCheckpoint` truncates lineage per round.
  *
  * Bound: `10⁶ · max(raw)` must stay inside BIGINT, i.e.
  * `10¹² · max_degree` (max degree < ~9·10⁶) — ENFORCED per renorm on
  * the collected max, so an over-degree graph fails loudly instead of
  * wrapping while a HUGEINT oracle diverges; past that, move the
  * renorm product to DECIMAL(38,0). */
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
    // one-row max collect: bounded by construction, and the require is
    // the fail-fast on the raw*10^6 BIGINT envelope (Spark would wrap
    // silently where a HUGEINT replay differs)
    def mxOf(raw: DataFrame): Long = {
      val row = raw.agg(max(col("raw"))).collect()(0)
      require(!row.isNullAt(0), "HITS needs a nonempty edge list")
      val mx = row.getLong(0)
      require(mx <= Long.MaxValue / 1000000L,
        s"max raw score $mx would wrap raw*1000000 in BIGINT: " +
          "max degree too large for the 10^6 grid — use DECIMAL(38,0)")
      mx
    }
    for (_ <- 1 to iters) {
      val araw = e
        .join(h.select(col("id").as("src"), col("s").as("hs")), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("hs")).as("raw"))
      a = araw
        .selectExpr("dst AS id",
          s"CAST(raw * 1000000 DIV ${mxOf(araw)}L AS BIGINT) AS s")
        .localCheckpoint(true)
      val hraw = e
        .join(a.select(col("id").as("dst"), col("s").as("as_")), Seq("dst"))
        .groupBy(col("src")).agg(sum(col("as_")).as("raw"))
      h = hraw
        .selectExpr("src AS id",
          s"CAST(raw * 1000000 DIV ${mxOf(hraw)}L AS BIGINT) AS s")
        .localCheckpoint(true)
    }
    (h, a)
  }
}
