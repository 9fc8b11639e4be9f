package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-free per-group ranking — the scale-shaped replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY ...)` when `g` has FEW
  * distinct values: the window form funnels each group through one
  * task (the measured 10× low-cardinality-window pathology), while
  * this computes the same ranks from ONE global range-sort:
  *
  *   1. [[Shuffle.positionsBy]] orders the whole frame by
  *      (group, orderCols...) — deterministic global positions from a
  *      range exchange + zipWithIndex, parallel across ALL data
  *      regardless of group count;
  *   2. positions are contiguous per group, so
  *      `rank = global_pos − min(global_pos in group) + 1`; the
  *      per-group offsets are a tiny aggregate broadcast back.
  *
  * Exactly row_number semantics (ties broken by the caller-supplied
  * unique tie column), for 2 groups or 2 billion. Cost: one range
  * exchange over the data + one broadcast — the same order of work a
  * well-partitioned window needs, minus the skew ceiling.
  */
object GroupRank {

  /** Append `rank` (1-based within `groupCol`, ordered by `orderCols`
    * then `tieCol`) and `n_in_group`. `tieCol` must be unique. */
  def ranks(df: DataFrame, groupCol: String, orderCols: Seq[String],
      tieCol: String): DataFrame = {
    val pos = Shuffle.positionsBy(df,
      (groupCol +: orderCols) :+ tieCol, "__gpos")
    val offsets = pos.groupBy(col(groupCol))
      .agg(min(col("__gpos")).as("__goff"),
        count(lit(1)).as("n_in_group"))
    pos.join(broadcast(offsets), Seq(groupCol))
      .withColumn("rank", col("__gpos") - col("__goff") + 1L)
      .drop("__gpos", "__goff")
  }
}
