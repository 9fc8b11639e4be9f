package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Interval-containment range join: points (one timestamp/number) vs
  * intervals [start, end), matched by `start <= p < end`. Catalyst
  * plans a bare inequality join as BroadcastNestedLoopJoin — fine only
  * while one side broadcasts; with two large sides it is the canonical
  * scale-killer.
  *
  * Bucketed form: pick a bin width, explode every interval into the
  * coarse bins it overlaps (an interval of length L lands in
  * ceil(L/bin)+1 bins — a small constant when bin ≈ interval length),
  * bin each point once, then EQUI-join on the bin and post-filter the
  * exact containment. A point's bin is unique, so a (point, interval)
  * pair meets in exactly one bin — no dedup step. Cost: one hash
  * shuffle on the bin key for both sides; the join is a plain
  * SortMergeJoin/ShuffledHashJoin that AQE can rebalance. This is the
  * shape that survives two 100-TB sides; Spark picks it for neither
  * side automatically.
  */
object RangeJoin {

  /** Inner range join. `points` carries numeric/epoch column `p`;
    * `intervals` carries numeric `startCol`/`endCol` (end exclusive).
    * `binWidth` should be ≈ the typical interval length (bigger →
    * fewer replicas per interval, more false candidates per bin).
    * Returns point rows + all interval columns. */
  def byBinning(points: DataFrame, p: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    // end is exclusive: a zero-length interval still occupies its
    // start bin; an interval ending exactly on a bin edge does not
    // spill into the next bin.
    val exploded = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)),
        bin(greatest(col(startCol), col(endCol) - 1)))))
    points.withColumn("__bin", bin(col(p)))
      .join(exploded, Seq("__bin"))
      .where(col(p) >= col(startCol) && col(p) < col(endCol))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join: pairs where
    * `aStart < bEnd && bStart < aEnd` (both ends exclusive — touching
    * intervals do NOT overlap). The binned shape generalizes
    * [[byBinning]]: BOTH sides explode into the bins they cover, the
    * equi-join runs on the bin, and the exact overlap predicate
    * post-filters. An overlapping pair meets in EVERY shared bin, so
    * emission is restricted to the one canonical bin — the bin of
    * `max(aStart, bStart)`, which both intervals provably cover
    * (overlap means max(start) < min(end), and each interval spans
    * [its start, its end) ⊇ [max(start), min(end)) there) — the same
    * first-agreeing-chunk arithmetic the LSH self-joins use instead of
    * a candidate-set `distinct()`. One hash exchange per side, plain
    * equi-join, AQE-rebalanceable: survives two large sides where the
    * naive inequality join plans a nested loop. */
  def overlapByBinning(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(Set(aStart, aEnd, bStart, bEnd).size == 4,
      "interval column names must be distinct across sides")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    def explodeBins(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bin", explode(sequence(bin(col(s)),
        bin(greatest(col(s), col(e) - 1)))))
    explodeBins(a, aStart, aEnd)
      .join(explodeBins(b, bStart, bEnd), Seq("__bin"))
      .where(col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("__bin") === bin(greatest(col(aStart), col(bStart))))
      .drop("__bin")
  }
}
