package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Space-Saving heavy hitters (Metwally et al., "Efficient computation
  * of frequent and top-k elements in data streams", ICDT 2005) as a
  * typed Spark `Aggregator` — the sketch path for "which items
  * dominate this column" when the column's cardinality makes an exact
  * groupBy shuffle unaffordable.
  *
  * Each partition maintains at most `capacity` counters; evicting the
  * minimum counter transfers its count as the newcomer's error bound.
  * What moves in the shuffle is ONE `capacity`-sized summary per
  * partition — not a row per distinct item — so cost is O(partitions ×
  * capacity) regardless of cardinality. Guarantees (per paper): every
  * item with true frequency > N/capacity is present; estimates
  * overcount by at most the tracked `max_err`; `est - max_err` is a
  * certain lower bound. When `capacity` ≥ the column's true
  * cardinality no eviction ever happens and the sketch is EXACT with
  * max_err 0 (the oracle-checkable regime q_heavy_hitters runs in).
  *
  * Merging sums matching counters, propagates both errors, and trims
  * back to capacity — the standard pairwise merge; bounds loosen by
  * the trimmed minimum, which the spec verifies empirically on zipf
  * data.
  */
object HeavyHitters {

  /** (count, err) per tracked item. Mutated in place within a
    * partition; kryo-serialized only at merge boundaries. */
  final class Sketch(val capacity: Int) extends Serializable {
    val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
    def add(item: String): Sketch = {
      counters.get(item) match {
        case Some((c, e)) => counters.update(item, (c + 1, e))
        case None if counters.size < capacity => counters.update(item, (1L, 0L))
        case None =>
          val (minItem, (minC, _)) = counters.minBy { case (k, (c, _)) => (c, k) }
          counters.remove(minItem)
          counters.update(item, (minC + 1, minC))
      }
      this
    }
    /** Mergeable-summaries rule (Agarwal et al., PODS 2012): an item
      * absent from one side gets that side's minimum counter added to
      * BOTH its estimate and its error — it may have occurred up to
      * that many times in the other stream before being evicted. This
      * keeps both invariants across merges: est ≥ true ≥ est − err. */
    def mergeWith(other: Sketch): Sketch = {
      def floorOf(s: Sketch): Long =
        if (s.counters.size < s.capacity) 0L
        else s.counters.valuesIterator.map(_._1).min
      val mSelf = floorOf(this)
      val mOther = floorOf(other)
      val merged = mutable.HashMap.empty[String, (Long, Long)]
      counters.foreach { case (k, (c, e)) =>
        other.counters.get(k) match {
          case Some((c2, e2)) => merged.update(k, (c + c2, e + e2))
          case None => merged.update(k, (c + mOther, e + mOther))
        }
      }
      other.counters.foreach { case (k, (c, e)) =>
        if (!counters.contains(k)) merged.update(k, (c + mSelf, e + mSelf))
      }
      counters.clear()
      if (merged.size > capacity) {
        // keep the top `capacity` by estimate (ties: item asc);
        // dropped items' guarantees are the survivors' floor
        counters ++= merged.toSeq
          .sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
      } else counters ++= merged
      this
    }
  }

  final case class Hitter(item: String, est_count: Long, max_err: Long)

  private def agg(capacity: Int): Aggregator[String, Sketch, Seq[Hitter]] =
    new Aggregator[String, Sketch, Seq[Hitter]] {
      def zero: Sketch = new Sketch(capacity)
      def reduce(b: Sketch, a: String): Sketch = b.add(a)
      def merge(b1: Sketch, b2: Sketch): Sketch = b1.mergeWith(b2)
      def finish(r: Sketch): Seq[Hitter] = r.counters.toSeq
        .sortBy { case (k, (c, _)) => (-c, k) }
        .map { case (k, (c, e)) => Hitter(k, c, e) }
      def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
      def outputEncoder: Encoder[Seq[Hitter]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hitter]]()
    }

  /** The sketch as an untyped aggregate column — usable in any
    * `groupBy().agg(...)`, batch OR Structured Streaming (the state
    * store then holds ONE capacity-bounded sketch per group). Result
    * type: array<struct<item, est_count, max_err>>, best first. */
  def sketch(itemCol: org.apache.spark.sql.Column, capacity: Int): org.apache.spark.sql.Column =
    udaf(agg(capacity), Encoders.STRING)(itemCol.cast("string"))

  /** Top `k` estimated heavy hitters of `itemCol` (count desc, item
    * asc). */
  def topK(df: DataFrame, itemCol: String, capacity: Int, k: Int): DataFrame =
    df.groupBy()
      .agg(sketch(col(itemCol), capacity).as("__hitters"))
      .select(explode(col("__hitters")).as("h"))
      .select(col("h.item"), col("h.est_count"), col("h.max_err"))
      .orderBy(desc("est_count"), asc("item"))
      .limit(k)

  /** Per-GROUP top-k heavy hitters: one Space-Saving sketch per group
    * in a single aggregate, then a rank over each group's retained
    * counters. The window here is safe at any scale — it partitions
    * over ≤ `capacity` candidate rows per group (the sketch bound),
    * never over input rows, so the usual low-cardinality-window skew
    * cannot occur. With capacity ≥ per-group distincts the counts are
    * exact (max_err 0) — the oracle-checkable regime. */
  def groupedTopK(df: DataFrame, groupCols: Seq[String], itemCol: String,
      capacity: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(desc("est_count"), asc("item"))
    df.groupBy(groupCols.map(col): _*)
      .agg(sketch(col(itemCol), capacity).as("__hitters"))
      .select(groupCols.map(col) :+ explode(col("__hitters")).as("h"): _*)
      .select(groupCols.map(col) ++ Seq(col("h.item"),
        col("h.est_count"), col("h.max_err")): _*)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
  }
}
