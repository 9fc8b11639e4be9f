package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT inversion counting — the number of pairs that
  * one total order ranks one way and a second total order ranks the
  * other way. This is the O(n log n) core of Kendall's τ (Knight,
  * JASA 1966) lifted to the cluster: τ's discordant-pair count D is
  * exactly the number of inversions of the secondary order's ranks
  * read in primary-order sequence, PROVIDED both orders break ties
  * consistently (see [[count]]'s contract).
  *
  * Decomposition (every unordered pair lands in exactly one class):
  * with rows tagged by a primary-rank BLOCK `blk = px·P div n` and a
  * secondary-rank BUCKET `bkt = ry·B div n` (both perfectly balanced
  * because px/ry are strict 0..n−1 permutations):
  *
  *   - same bucket           → counted exactly per bucket: sort the
  *     ≤⌈n/B⌉ rows by px, mergesort-count the ry sequence;
  *   - different bucket, same block → counted exactly per block:
  *     sort the ≤⌈n/P⌉ rows by px, mergesort-count the BUCKET-LABEL
  *     sequence (strict descents only, so same-bucket pairs
  *     contribute nothing here);
  *   - different bucket, different block → pure histogram algebra:
  *     with H[p][b] = rows in (block p, bucket b), the count is
  *     Σ_{p<q} Σ_{b_i>b_j} H[p][b_i]·H[q][b_j], computed from the
  *     collected P×B matrix by one prefix/suffix sweep.
  *
  * Scale shape (100 TB): two range-sort rank passes (the skew-free
  * positionsBy machinery — no single-reducer window anywhere), two
  * grouped local counts whose group sizes are n/P and n/B (both
  * perfectly balanced by construction, a skewed key CANNOT produce a
  * big group), and the cross-class histogram sweep. P and B
  * AUTO-SCALE from the counted n: the `blocks`/`buckets` arguments
  * are floors, raised to ⌈n/targetGroupRows⌉ so no mergesort group
  * ever exceeds the task budget however big n grows. The sweep runs
  * driver-side while P·B fits `maxDriverCells`; past that it switches
  * to a fully distributed form — densify the grid, one grouped
  * running total over blocks within each bucket (cumulative mass
  * below the current block), one reversed running total over buckets
  * within each block (mass in strictly higher buckets), both on the
  * skew-free [[PrefixSum]] machinery, then ONE sum. The dense grid
  * has (n/targetGroupRows)² rows ≤ n itself for every n below
  * targetGroupRows² (1.7·10¹³ at the default) — never the biggest
  * frame in the job. Counts stay in int64 for n ≤ ~4.2·10⁹
  * (n²/2 < 2⁶³).
  */
object Inversions {

  /** Strict inversions (`a(i) > a(j)` for `i < j`; equal values are
    * NOT inversions) of a sequence, by bottom-up mergesort —
    * O(m log m), iterative, no allocation per level. */
  private[ops] def localInversions(a: Array[Long]): Long = {
    val n = a.length
    if (n < 2) return 0L
    var src = a.clone()
    var dst = new Array[Long](n)
    var inv = 0L
    var width = 1
    while (width < n) {
      var lo = 0
      while (lo < n) {
        val mid = math.min(lo + width, n)
        val hi = math.min(lo + 2 * width, n)
        var i = lo; var j = mid; var k = lo
        while (i < mid && j < hi) {
          if (src(j) < src(i)) { inv += (mid - i); dst(k) = src(j); j += 1 }
          else { dst(k) = src(i); i += 1 }
          k += 1
        }
        while (i < mid) { dst(k) = src(i); i += 1; k += 1 }
        while (j < hi) { dst(k) = src(j); j += 1; k += 1 }
        lo += 2 * width
      }
      val tmp = src; src = dst; dst = tmp
      width *= 2
    }
    inv
  }

  /** Exact count of pairs ordered oppositely by two strict total
    * orders over `df`.
    *
    * CONTRACT (what makes this Kendall's D): both column lists must
    * be STRICT total orders (include a unique id as the last
    * tiebreak), and they must AGREE on pairs tied in their leading
    * value — e.g. `primary = (x, y, id)`, `secondary = (y, x, id)`.
    * Then a pair tied in x contributes no inversion (primary and
    * secondary rank it the same way), a pair tied in y likewise, and
    * the returned count is exactly the number of value-space
    * DISCORDANT pairs (x_i<x_j ∧ y_i>y_j) — Knight's construction.
    *
    * The result is invariant to `blocks`/`buckets`/`targetGroupRows`/
    * `maxDriverCells` (asserted in InversionsSpec); they only trade
    * group size against cross-sweep cost. `blocks`/`buckets` are
    * FLOORS — at large n both rise to ⌈n/targetGroupRows⌉ so a
    * mergesort group can never outgrow a task, and once P·B exceeds
    * `maxDriverCells` the cross sweep runs distributed instead of
    * collecting the matrix. */
  def count(df: DataFrame, primary: Seq[String], secondary: Seq[String],
      blocks: Int = 32, buckets: Int = 1024,
      targetGroupRows: Long = 1L << 22,
      maxDriverCells: Long = 1L << 20): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    val p1 = Shuffle.positionsBy(df, primary, "__px", blocks)
    val p2 = Shuffle.positionsBy(p1, secondary, "__ry", blocks)
    val base = p2.select(col("__px"), col("__ry")).localCheckpoint(true)
    val n = base.count()
    if (n < 2) return 0L
    require(targetGroupRows >= 1, "targetGroupRows must be positive")
    // Auto-scale: raise the floors so group size n/P, n/B ≤ target.
    val needed = (n + targetGroupRows - 1) / targetGroupRows
    val p = math.min(math.max(blocks.toLong, needed), n)
    val b = math.min(math.max(buckets.toLong, needed), n)
    // Balanced tags: px, ry are strict 0..n−1 permutations, so block
    // and bucket sizes differ by at most one — no skew possible.
    val tagged = base.select(
        expr(s"__px * ${p}L div ${n}L").as("blk"), col("__px"),
        expr(s"__ry * ${b}L div ${n}L").as("bkt"), col("__ry"))
      .as[(Long, Long, Long, Long)]
      .localCheckpoint(true) // three consumers below
    // (1) same-bucket pairs: exact ry-sequence inversions per bucket.
    val sameBucket = tagged.groupByKey(_._3).mapGroups { (_, it) =>
      val rows = it.toArray.sortBy(_._2)
      localInversions(rows.map(_._4))
    }.reduce(_ + _)
    // (2) different-bucket pairs inside one block: exact bucket-LABEL
    // inversions per block (strict descents — same-bucket pairs,
    // already counted in (1), contribute nothing).
    val withinBlock = tagged.groupByKey(_._1).mapGroups { (_, it) =>
      val rows = it.toArray.sortBy(_._2)
      localInversions(rows.map(_._3))
    }.reduce(_ + _)
    // (3) different block AND bucket: histogram algebra — for each
    // later block q and bucket b_j, earlier-block mass in strictly
    // higher buckets times H[q][b_j].
    val histDf = tagged.toDF("blk", "px", "bkt", "ry")
      .groupBy(col("blk"), col("bkt"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("c"))
    val cross =
      if (p <= maxDriverCells / b) crossDriver(histDf, p.toInt, b.toInt)
      else crossDistributed(histDf, p, b)
    sameBucket + withinBlock + cross
  }

  /** Cross-class sweep, driver form: collect the P×B matrix and do
    * one prefix/suffix pass. Exact; bounded by maxDriverCells. */
  private def crossDriver(histDf: DataFrame, pP: Int, bB: Int): Long = {
    val hist = histDf.collect()
    val h = Array.ofDim[Long](pP, bB)
    hist.foreach(r => h(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getLong(2))
    val cum = new Array[Long](bB) // per-bucket mass over blocks < q
    var cross = 0L
    var q = 0
    while (q < pP) {
      var suffix = 0L // Σ cum(b) for b > current b_j
      var bj = bB - 1
      while (bj >= 0) {
        cross += h(q)(bj) * suffix
        suffix += cum(bj)
        bj -= 1
      }
      var x = 0
      while (x < bB) { cum(x) += h(q)(x); x += 1 }
      q += 1
    }
    cross
  }

  /** Cross-class sweep, distributed form (P·B past the driver cap):
    * the same algebra as two grouped running totals over the DENSE
    * grid. With C(q,b) = Σ_{p≤q} H(p,b) (running over blocks within a
    * bucket) and L = C − H (mass strictly BELOW block q), the weight
    * of cell (q,b_j) is Σ_{b_i>b_j} L(q,b_i) — a reversed running
    * total over buckets within the block, exclusive of the cell —
    * and cross = Σ H·W. Both totals run on the skew-free PrefixSum
    * machinery; the grid never collects. */
  private def crossDistributed(histDf: DataFrame, p: Long, b: Long): Long = {
    val spark = histDf.sparkSession
    val grid = spark.range(p).select(col("id").as("blk"))
      .crossJoin(spark.range(b).select(col("id").as("bkt")))
      .join(histDf, Seq("blk", "bkt"), "left")
      .na.fill(0L, Seq("c"))
    val cum = PrefixSum.runningTotal(grid, Seq("bkt"), Seq("blk"), "c", "cumc")
      .withColumn("l", col("cumc") - col("c"))
      // reversed bucket order via a flipped sort key (PrefixSum sorts
      // ascending); (blk, revb) is a strict total order on the grid
      .withColumn("revb", lit(b) - lit(1L) - col("bkt"))
    val w = PrefixSum.runningTotal(cum, Seq("blk"), Seq("revb"), "l", "wincl")
      .withColumn("w", col("wincl") - col("l"))
    w.agg(sum(col("c") * col("w"))).collect()(0).getLong(0)
  }
}
