package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key calendar completion + last-observation-carried-forward —
  * the time-series continuity step every monitoring/feature pipeline
  * needs: a (key, day) metric table usually has holes (no events that
  * day), and downstream consumers (drift monitors, trailing windows,
  * training-feature joins) want one row per key per day with the last
  * observed level carried across the gap.
  *
  * Scale shape: the calendar explodes `sequence(lo, hi)` PER KEY — row
  * count is bounded by each key's own observed span, never |keys| ×
  * global range, so a key active for a week costs 7 rows even in a
  * 10-year corpus. The carry-forward window partitions by the
  * HIGH-cardinality key (users, documents, hosts) with at most
  * span-days rows per partition — bounded, skew-free; the
  * low-cardinality-window trap from the build notes does not apply.
  * Everything else is one aggregate (spans) and one equi-join back.
  */
object GapFill {

  /** Complete `df` (one row per (key, day) — pre-aggregate first) to a
    * dense per-key daily calendar over each key's observed [min, max]
    * day span. Every `valueCols` column gains a `<c>_filled` twin =
    * last non-null observation at or before that day; `is_gap` = 1 on
    * manufactured rows. */
  def daily(df: DataFrame, keyCol: String, dayCol: String,
      valueCols: Seq[String]): DataFrame = {
    val spans = df.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val calendar = spans.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"),
        expr("interval 1 day"))).as(dayCol))
    val joined = calendar.join(df, Seq(keyCol, dayCol), "left")
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** [[daily]] with an explicit gap marker: `df` rows are tagged
    * before the calendar join, so `is_gap` is exact even when source
    * value columns contain legitimate nulls. */
  def dailyWithGaps(df: DataFrame, keyCol: String, dayCol: String,
      valueCols: Seq[String]): DataFrame = {
    val tagged = df.withColumn("__obs", lit(1))
    daily(tagged, keyCol, dayCol, valueCols)
      .withColumn("is_gap",
        when(col("__obs").isNull, 1L).otherwise(0L))
      .drop("__obs", "__obs_filled")
  }

  /** Convenience: events → per-(key, day) row counts and a
    * floor-integer level metric, gap-filled. `level` must be a
    * deterministic per-row Column; the carried metric is
    * `floor(max(level)·100)` — an integer, so the carry and the
    * oracle compare exactly (the count-ratio/round-midpoint rule). */
  def dailyActivity(events: DataFrame, keyCol: String, tsCol: Column,
      level: Column): DataFrame = {
    val dailyAgg = events
      .groupBy(col(keyCol), to_date(tsCol).as("day"))
      .agg(count(lit(1)).as("n"),
        floor(max(level) * 100).cast("long").as("level_cents"))
    dailyWithGaps(dailyAgg, keyCol, "day", Seq("level_cents"))
      .select(col(keyCol), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("level_cents_filled"), col("is_gap"))
  }
}
