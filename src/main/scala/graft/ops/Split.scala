package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test splitting — the split decision is a
  * pure function of the LEAKAGE UNIT's key (dedup group, domain,
  * user), never of the row, so every member of a unit lands in the
  * same split by construction. Splitting rows independently and
  * "checking for leakage" afterwards is the classic eval-contamination
  * bug: two near-identical documents straddle train and test and the
  * benchmark silently measures memorization. Here straddling is
  * impossible — there is nothing to check.
  *
  * The coin is the same deterministic md5 draw as [[Sampling]]
  * (first 4 hex digits, a uniform draw on [0, 16^4)), compared
  * against cumulative hex thresholds, so the assignment is
  * bit-reproducible on any engine that can md5 — the oracle replays
  * the identical decision — and is a scan-stage expression: zero
  * shuffle, composes with pushdown, works identically on 500 rows or
  * 100 TB because no coordination of any kind is required.
  */
object Split {

  /** Split-name column for a row whose leakage unit is `groupKey`.
    * `splits` are (name, fraction) in declaration order; fractions
    * must sum to 1 (±1/65536 rounding). */
  def assign(groupKey: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.size >= 2, "need at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-6,
      s"fractions must sum to 1: $splits")
    val coin = substring(md5(groupKey.cast("string")), 1, 4)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    // ascending when-chain: first matching cumulative threshold wins
    val first = when(coin < lit(Sampling.threshold(cums.head)),
      lit(splits.head._1))
    splits.tail.init.zip(cums.tail.init)
      .foldLeft(first) { case (acc, ((name, _), cum)) =>
        acc.when(coin < lit(Sampling.threshold(cum)), lit(name))
      }
      .otherwise(lit(splits.last._1))
  }

  /** Assign every row of `df` to a split keyed by `groupKeyCol`. */
  def byGroup(df: DataFrame, groupKeyCol: String,
      splits: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", assign(col(groupKeyCol), splits))

  /** Group-aware k-fold assignment for cross-validation: fold index
    * in [0, k) as a pure function of the leakage-unit key — the same
    * md5 coin as [[assign]] read as a 16-bit integer mod k, so folds
    * are engine-reproducible (oracle: ('0x' || hex)::BIGINT % k) and
    * group members can never straddle folds. Scan-stage, zero
    * shuffle; each held-out fold is a filter, never a copy. */
  def foldOf(groupKey: Column, k: Int): Column = {
    require(k >= 2, s"need at least 2 folds: $k")
    pmod(conv(substring(md5(groupKey.cast("string")), 1, 4), 16, 10)
      .cast("long"), lit(k.toLong))
  }

  /** Per-split summary: docs, groups, and docs that belong to a
    * multi-copy group (the rows where leakage-unaware splitting would
    * have risked contamination). Two-stage aggregate — per
    * (split, group) first, then per split — so no distinct-induced
    * Expand touches the input. */
  def summary(df: DataFrame, groupKeyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    val perGroup = byGroup(df, groupKeyCol, splits)
      .groupBy(col("split"), col(groupKeyCol))
      .agg(count(lit(1)).as("n_copies"))
    perGroup.groupBy(col("split"))
      .agg(sum(col("n_copies")).as("n_docs"),
        count(lit(1)).as("n_groups"),
        sum(when(col("n_copies") > 1, col("n_copies")).otherwise(0L))
          .as("n_dup_docs"))
      .orderBy(asc("split"))
  }
}
