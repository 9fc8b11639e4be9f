package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (monotone nondecreasing) calibration via the
  * pool-adjacent-violators algorithm (PAV; Ayer et al. 1955, the
  * standard calibration fit after Zadrozny & Elkan KDD 2002): given
  * per-bin (trials, positives) ordered by score bin, fit the best
  * nondecreasing rate sequence by pooling adjacent violating bins.
  *
  * Scale shape: the corpus-sized work is the ONE aggregate that
  * builds the bin table (map-side combined); PAV itself runs on the
  * driver over the BOUNDED bin table (the same driver-greedy-loop +
  * one-distributed-pass recipe as ivfCentroids/MMR/water-filling),
  * and the fitted rates ride back as a literal map — zero extra
  * shuffles, no iteration over distributed data. All arithmetic is
  * exact integer rationals (violation test by cross-multiplication;
  * fitted rate emitted as floor-div basis points), so the fit is
  * bit-reproducible at any parallelism.
  */
object Isotonic {

  /** Hard cap mirroring [[Skyline.MaxBands]]: bins ride to the driver
    * and back as a literal map; a high-cardinality miscall must fail
    * loudly, not OOM. */
  val MaxBins: Int = 100000

  /** Exact PAV over ordered bins. Input: (binKey, n, pos) sorted by
    * binKey ascending, n > 0. Output: binKey -> (pooledPos, pooledN),
    * the fitted rate as an exact rational (same value for every bin
    * in a pool). */
  def pav(bins: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] = {
    require(bins.forall(_._2 > 0), "every bin needs n > 0")
    // Stack of pools: (keys in pool, n, pos). A new bin is pushed,
    // then merged left while its rate is BELOW the previous pool's
    // (pos_prev * n_cur > pos_cur * n_prev — exact cross-multiply).
    val stack = scala.collection.mutable.ArrayBuffer[(List[Long], Long, Long)]()
    bins.sortBy(_._1).foreach { case (k, n, pos) =>
      var cur = (List(k), n, pos)
      while (stack.nonEmpty &&
          stack.last._3 * cur._2 > cur._3 * stack.last._2) {
        val prev = stack.remove(stack.length - 1)
        cur = (prev._1 ++ cur._1, prev._2 + cur._2, prev._3 + cur._3)
      }
      stack += cur
    }
    stack.flatMap { case (keys, n, pos) => keys.map(_ -> (pos, n)) }.toMap
  }

  /** Distributed entry: aggregate (binCol -> n, pos) is assumed done;
    * `binned` has columns (bin: long, n: long, pos: long), one row per
    * bin. Returns the frame with `fitted_bp` (floor-div basis points
    * of the pooled rate) added. */
  def fitBinned(binned: DataFrame): DataFrame = {
    val rows = binned.select(col("bin"), col("n"), col("pos"))
      .limit(MaxBins + 1).collect()
    require(rows.length <= MaxBins,
      s"Isotonic.fitBinned: more than $MaxBins bins — bin coarser first")
    val fit = pav(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    val bp = fit.map { case (k, (pos, n)) => k -> (pos * 10000L) / n }
    val bpCol = typedLit(bp)
    binned.withColumn("fitted_bp", element_at(bpCol, col("bin")))
  }
}
