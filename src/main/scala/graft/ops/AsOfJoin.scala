package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with
  * `right.ts <= left.ts` on the same key — the standard align-to-most-
  * recent operator (market data, feature lookups, "last config before
  * this event"). Spark has no built-in as-of join; the naive encoding
  * is a range join that Catalyst executes as a broadcast-nested-loop —
  * a scale-killer when both sides are large.
  *
  * This implementation is the union-and-sweep form: tag both sides,
  * union them, and run ONE window sweep per key ordered by (ts, side)
  * carrying the last-seen right row forward. Cost is a single shuffle
  * of (|L| + |R|) rows on the key — the same shuffle a plain join
  * would pay — and no pairwise blowup regardless of how many right
  * rows precede a left row. Right rows sort BEFORE left rows at an
  * equal timestamp, so a right row at exactly left.ts matches
  * (inclusive semantics, same as DuckDB's `ASOF JOIN ... ON l.ts >=
  * r.ts`, which the oracle uses).
  *
  * At 100 TB: the window never materializes a per-key array — it is a
  * running `last(..., ignoreNulls)` over a sort the shuffle already
  * paid for. Skewed keys degrade to a per-key sort, not a cross
  * product.
  */
object AsOfJoin {

  /** Left-outer as-of join. `rightVals` columns arrive as
    * `asof_<name>`, plus `asof_ts` (the matched right timestamp);
    * unmatched left rows keep them NULL. The whole right row is
    * carried as ONE struct, so NULLs inside right value columns stay
    * attached to their own row. `right` should be unique per
    * (key, ts); if not, the duplicate that sorts last wins. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // Right payload struct: (ts, v1, v2, ...); NULL on left rows.
    val rStruct = struct(col(ts).as("ts") +: rightVals.map(col): _*)
    val r = right.withColumn("__side", lit(0))
      .select(col(key), col(ts), col("__side"), rStruct.as("__r"))
    val l = left.withColumn("__side", lit(1))
      .select(col(key), col(ts), col("__side"),
        lit(null).cast(r.schema("__r").dataType).as("__r"),
        struct(leftCols.toIndexedSeq.map(col): _*).as("__l"))
    val lr = l.unionByName(
      r.withColumn("__l", lit(null).cast(l.schema("__l").dataType)))
    val w = Window.partitionBy(col(key)).orderBy(asc(ts), asc("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lr.select(col("__side"), col("__l"),
        last(col("__r"), ignoreNulls = true).over(w).as("__r"))
      .where(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(c => col(s"__l.$c")) ++
        (col("__r.ts").as("asof_ts") +:
          rightVals.map(v => col(s"__r.$v").as(s"asof_$v"))): _*)
  }
}
