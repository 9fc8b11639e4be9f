package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Capped proportional allocation (water-filling) — the mixture knob
  * when sources have FINITE supply: distribute a token/doc budget
  * across sources in proportion to target weights, but never above a
  * source's available supply; the excess that capped sources can't
  * absorb re-flows to the uncapped ones, preserving their relative
  * proportions. A plain proportional split either over-asks small
  * sources or silently under-uses the budget; water-filling is the
  * fixed point (same structure as max-min fair bandwidth sharing).
  *
  * All-integer and deterministic: each round allocates
  * floor(R·wᵢ/W) to active sources, caps out saturated ones, and the
  * final sub-W remainder goes to the active sources with the largest
  * Rwᵢ mod W (ties by name) — largest-remainder apportionment, so
  * the allocation sums EXACTLY to min(budget, total supply).
  *
  * Scale shape: the loop runs driver-side over the per-source frame
  * (≤ |sources| rows, already aggregated — the bounded-driver-loop
  * recipe); the corpus is never touched. The result feeds the
  * deterministic samplers ([[Sampling.groupedExactK]] /
  * [[BudgetSample]]) as per-source quotas.
  */
object WaterFill {

  /** Allocate `budget` over (name, supply, weight) rows. Weights and
    * supplies must be ≥ 0; zero-weight or zero-supply sources get 0. */
  def allocate(sources: Seq[(String, Long, Long)],
      budget: Long): Map[String, Long] = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(sources.forall(s => s._2 >= 0 && s._3 >= 0),
      "supplies and weights must be >= 0")
    val alloc = scala.collection.mutable.Map[String, Long]()
    var active = sources.filter(s => s._2 > 0 && s._3 > 0).sortBy(_._1)
    sources.foreach(s => alloc(s._1) = 0L)
    var remaining = math.min(budget, sources.map(_._2).sum)
    // each pass either saturates a source or is the last; ≤ |sources|
    // passes total
    var progress = true
    while (remaining > 0 && active.nonEmpty && progress) {
      val w = active.map(_._3).sum
      val shares = active.map { case (n, cap, wi) =>
        (n, cap, wi, math.min(cap - alloc(n), remaining * wi / w))
      }
      val saturated = shares.filter { case (n, cap, _, give) =>
        alloc(n) + give >= cap
      }
      if (saturated.nonEmpty) {
        // cap them out exactly and re-run the proportional split for
        // the rest of the budget among the survivors
        saturated.foreach { case (n, cap, _, _) =>
          remaining -= (cap - alloc(n)); alloc(n) = cap
        }
        val done = saturated.map(_._1).toSet
        active = active.filterNot(s => done(s._1))
      } else {
        // nobody saturates: hand out the floor shares plus a
        // largest-remainder distribution of the sub-W tail
        var handed = 0L
        shares.foreach { case (n, _, _, give) =>
          alloc(n) += give; handed += give
        }
        remaining -= handed
        if (remaining > 0) {
          // integer remainders of the PRE-handout budget split:
          // largest-remainder apportionment, ties by name
          val preR = remaining + handed
          val order = shares
            .map { case (n, cap, wi, _) => (n, cap, (preR * wi) % w) }
            .sortBy { case (n, _, rem) => (-rem, n) }
          var i = 0
          val it = Iterator.continually(order).flatten
          while (remaining > 0 && i < order.size * 2 && it.hasNext) {
            val (n, cap, _) = it.next()
            if (alloc(n) < cap) { alloc(n) += 1; remaining -= 1 }
            i += 1
          }
        }
        progress = false // floor shares + remainder = fixed point
      }
    }
    alloc.toMap
  }

  /** DataFrame form: aggregate `df` to per-`srcCol` supplies (row
    * counts), join the weight map, allocate, and return one row per
    * source (source, supply, weight, alloc). The aggregate is the
    * only distributed work. */
  def allocateByCount(df: DataFrame, srcCol: String,
      weights: Map[String, Long], budget: Long): DataFrame = {
    val spark = df.sparkSession
    val supply = df.groupBy(col(srcCol)).agg(count(lit(1)).as("supply"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = supply.map { case (n, s) =>
      (n, s, weights.getOrElse(n, 0L))
    }
    val out = allocate(rows.toSeq, budget)
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.toSeq.sortBy(_._1).map { case (n, s, w) =>
          Row(n, s, w, out(n))
        }, 1),
      StructType(Seq(
        StructField("source", StringType, nullable = false),
        StructField("supply", LongType, nullable = false),
        StructField("weight", LongType, nullable = false),
        StructField("alloc", LongType, nullable = false))))
  }
}
