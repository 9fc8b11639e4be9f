package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic token-budget sampling: keep, per source, the prefix
  * of documents — in seeded-hash order — whose cumulative token count
  * stays within the budget. This is the mixture-building primitive for
  * "cap source X at N tokens": reproducible (hash order, no RNG),
  * unbiased (hash order is uniform), and exact (a document is kept iff
  * the running total through it fits).
  *
  * The naive plan is `sum(tokens) OVER (PARTITION BY source ORDER BY
  * hash)` — with a handful of sources that funnels the whole corpus
  * into |sources| reducer partitions for the sort, the measured
  * unbounded-window-over-low-cardinality-key failure mode from the
  * build notes. Instead the cumulative sum is BUCKETED:
  *
  *   1. bucket = first hex byte of the order key (256 buckets) — a
  *      PREFIX of the key, so buckets are contiguous ranges of the
  *      per-source order;
  *   2. per-(source, bucket) token totals (one tiny aggregate) turn
  *      into per-bucket EXCLUSIVE offsets with a window over the
  *      ≤ |sources|×256-row summary — trivially small;
  *   3. the per-doc running sum is a window over (source, bucket) —
  *      |sources|×256 partitions, skew-free — plus the broadcast
  *      bucket offset.
  *
  * Every corpus-sized stage is an aggregate or a fine-grained window;
  * nothing sorts per source globally.
  */
object BudgetSample {

  /** `df` + (`toks`, `cum`) with `cum` = per-source running token
    * total in seeded order, then filtered to `cum <= budget`.
    * `tokens` must be a deterministic per-row Column. */
  def byBudget(df: DataFrame, sourceCol: String, idCol: String,
      tokens: Column, seed: Long, budget: Long): DataFrame = {
    val keyed = df.withColumn("toks", tokens)
      .withColumn("k",
        md5(concat(lit(seed.toString), lit("|"), col(idCol).cast("string"))))
      .withColumn("bucket", substring(col("k"), 1, 2))
    val offsets = keyed.groupBy(col(sourceCol), col("bucket"))
      .agg(sum(col("toks")).as("b_toks"))
      .withColumn("offset",
        coalesce(sum(col("b_toks")).over(
          Window.partitionBy(sourceCol).orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("b_toks")
    val withCum = keyed
      .join(broadcast(offsets), Seq(sourceCol, "bucket"))
      .withColumn("cum",
        col("offset") + sum(col("toks")).over(
          Window.partitionBy(sourceCol, "bucket")
            .orderBy(col("k"), col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withCum.where(col("cum") <= budget)
      .drop("k", "bucket", "offset")
  }
}
