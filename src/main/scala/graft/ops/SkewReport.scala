package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew diagnostic — the measurement that feeds the salting /
  * AQE-skew-join decision ([[Skew]]): given per-key row counts, how
  * unevenly is the table distributed over its join/grouping key?
  * Emits all-integer statistics, so the numbers are engine-exact:
  *
  *   - `gini_bp`: Gini coefficient of the count distribution in basis
  *     points, from the rank form G = Σ(2i−n−1)·x(i) / (n·Σx) over
  *     ascending counts — pure integer arithmetic (the weight sum
  *     over any equal-value block is permutation-invariant, so ties
  *     don't perturb it), floor-divided per the basis-point rule;
  *   - `top1_bp`: largest key's share of all rows;
  *   - `p50_cnt`: the ⌈n/2⌉-th smallest count — a VALUE from the
  *     data (engine-exact selection, never an interpolated quantile).
  *
  * Scale shape: one aggregate to per-key counts (map-side combined),
  * then the deterministic global-rank machinery
  * ([[Shuffle.positionsBy]] — range exchange + zipWithIndex, no
  * one-reducer row_number) over the COUNTS table, whose size is key
  * cardinality, not input rows; the ranked counts are eagerly
  * checkpointed because both the stats aggregate and the median
  * selection consume them. gini_bp ≈ 0 → uniform keys; → 10000 →
  * one key owns the table (salt it, or route the join through
  * [[Skew]]).
  */
object SkewReport {

  /** Skew statistics of `df` grouped by `keyCol`: one row
    * (n_keys, n_rows, min_cnt, max_cnt, p50_cnt, gini_bp, top1_bp). */
  def of(df: DataFrame, keyCol: String): DataFrame =
    ofCounts(
      df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt")),
      keyCol, "cnt")

  /** Same, over a pre-aggregated (key, count) frame. */
  def ofCounts(counts: DataFrame, keyCol: String,
      cntCol: String): DataFrame = {
    val ranked = Shuffle.positionsBy(
        counts.select(col(keyCol).cast("string").as("__k"),
          col(cntCol).cast("long").as("__c")),
        Seq("__c", "__k"), "__i") // 0-based ascending rank, ties by key
      .select(col("__c"), (col("__i") + 1L).as("__r"))
      .localCheckpoint(true) // two consumers: stats agg + median pick
    val stats = ranked.agg(
      count(lit(1)).as("n_keys"),
      sum(col("__c")).as("n_rows"),
      min(col("__c")).as("min_cnt"),
      max(col("__c")).as("max_cnt"),
      sum(lit(2L) * col("__r") * col("__c")).as("__s2"))
    // the ⌈n/2⌉-th smallest count — a one-row broadcast each way
    val p50 = ranked
      .join(broadcast(stats.select(col("n_keys").as("__n"))),
        // integer div: Column./ on longs is DOUBLE division and the
        // equality against the long rank would never hold for even n
        col("__r") === expr("(__n + 1L) div 2L"))
      .select(col("__c").as("p50_cnt"))
    stats.crossJoin(broadcast(p50))
      .select(col("n_keys"), col("n_rows"), col("min_cnt"),
        col("max_cnt"), col("p50_cnt"),
        expr("(__s2 - (n_keys + 1L) * n_rows) * 10000L div " +
          "(n_keys * n_rows)").as("gini_bp"),
        expr("max_cnt * 10000L div n_rows").as("top1_bp"))
  }
}
