package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed grouped running totals — the skew-free replacement for
  * `sum(x).over(Window.partitionBy(lowCardKey).orderBy(...))`.
  *
  * A running-sum window over a LOW-cardinality partition key funnels
  * each key's entire extent through ONE task (the measured
  * 31-key-window failure shape): at 100 TB every language/class/region
  * becomes a single-reducer sort. This operator computes the identical
  * per-group inclusive running total with no per-group serialization:
  *
  *   1. ONE range exchange on (group, order) + local sorts — the same
  *      exact-and-parallel machinery as [[Shuffle.positionsBy]];
  *   2. per-(partition, group) subtotals — a tiny driver collect
  *      bounded by partitions × |groups touched per partition bound|
  *      (each group spans at most (its rows / partition size) + 1
  *      partitions, so the collect is ≤ partitions + |groups| rows);
  *   3. prefix offsets per group across partitions, rebroadcast, and a
  *      second pass over the SAME deterministic sort emitting
  *      offset + local running sum.
  *
  * Determinism: like positionsBy, the output depends only on the TOTAL
  * order of (groupCols ++ orderCols) — which must be strict (include a
  * unique tiebreaker) — never on the sampled range boundaries.
  */
object PrefixSum {

  /** Append `outCol` = inclusive running total of `valueCol` (LONG,
    * NON-NULL — a null fails fast with a clear message rather than an
    * anonymous NPE mid-job) within each `groupCols` group under
    * `orderCols` order. `groupCols ++ orderCols` must form a strict
    * total order. */
  def runningTotal(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], valueCol: String, outCol: String,
      partitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val keyCols = (groupCols ++ orderCols).map(col)
    val sorted = df
      .withColumn(valueCol, col(valueCol).cast("long"))
      .repartitionByRange(partitions, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
    val schema = sorted.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val vIdx = schema.fieldIndex(valueCol)
    val rdd = sorted.rdd

    // pass 1: per-(partition, group) subtotal — tiny (see scaladoc).
    val subtotals: Array[(Int, Seq[Any], Long)] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val acc = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
        it.foreach { r =>
          require(!r.isNullAt(vIdx),
            s"PrefixSum.runningTotal: null in value column '$valueCol' " +
              s"(group ${gIdx.map(r.get).mkString(",")}) — fill or filter nulls first")
          val g = gIdx.map(r.get)
          acc(g) = acc.getOrElse(g, 0L) + r.getLong(vIdx)
        }
        acc.iterator.map { case (g, s) => (pid, g, s) }
      }.collect()

    // driver: offset(pid, g) = Σ subtotals of g in partitions < pid.
    val offsets: Map[(Int, Seq[Any]), Long] = {
      val byGroup = subtotals.groupBy(_._2)
      byGroup.iterator.flatMap { case (g, rows) =>
        val ordered = rows.sortBy(_._1)
        val offs = ordered.map(_._3).scanLeft(0L)(_ + _).init
        ordered.map(_._1).zip(offs).map { case (pid, off) =>
          (pid, g) -> off
        }
      }.toMap
    }
    val offB = spark.sparkContext.broadcast(offsets)

    // pass 2: same deterministic sort, emit offset + local running sum.
    val outSchema = schema.add(outCol, LongType, nullable = false)
    val withRun = rdd.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
      it.map { r =>
        val g = gIdx.map(r.get)
        val run = local.getOrElse(g,
          offB.value.getOrElse((pid, g), 0L)) + r.getLong(vIdx)
        local(g) = run
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(withRun, outSchema)
  }
}
