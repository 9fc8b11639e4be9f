package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V-OPTIMAL histogram (Jagadish, Koudas, Muthukrishnan et al.,
  * "Optimal histograms with quality guarantees", VLDB 1998): the `b`
  * bucket boundaries minimizing total within-bucket sum of squared
  * error — the principled upgrade of equi-depth binning when buckets
  * feed selectivity estimates or stratified sampling strata.
  *
  * Spark shape (the driver-DP recipe, same split as GridKmeans /
  * Coreset): the corpus is touched by TWO bounded aggregate passes —
  * a min/max for the integer cell grid, then one hash aggregate of
  * (count, Σv, Σv²) per equi-width pre-cell (`m` cells; the published
  * "approximate v-optimal on a pre-binned domain" form). The O(m²·b)
  * DP runs driver-side over the m+1 prefix rows — microseconds — and
  * the boundaries come back as a b-row frame.
  *
  * Oracle-exact: values floor to integer units once; cell assignment
  * is truncating div on nonnegative values (Spark `DIV` ≡ DuckDB `//`
  * ≡ Scala `Long./`); per-candidate SSE is ONE identically-shaped IEEE
  * chain `Q − A·A/N` floored ONCE to an integer (the
  * divergence-aggregate rule), and the DP sums those integers with
  * ties broken toward the smaller split index (packed `cost·(m+1)+i`
  * argmin). DuckDB replays the DP as `b` unrolled layers plus a
  * backtrack chain.
  *
  * Bounds the caller owns: values must be nonnegative (div parity)
  * and `totalSSE · (m+1)` must fit in a signed 64-bit (the packed
  * argmin key); at larger scales move the packing to HUGEINT/DECIMAL.
  * Both bounds (plus `max(v)² · n` covering sum-of-squares wrap) are
  * ENFORCED by driver-side `require` on the collected stats — an
  * out-of-envelope input fails loudly instead of silently diverging
  * the engines.
  */
object VoptHist {

  /** @param valueCol nonnegative numeric column; floored to integer
    *                 units once.
    * @return (bucket, lo_edge, hi_edge, n_rows, sse_int), b rows;
    *         bucket i covers values in [lo_edge, hi_edge). */
  def plan(df: DataFrame, valueCol: Column, m: Int, b: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(m >= b && b >= 1, s"m=$m b=$b")
    val base = df.select(floor(valueCol).cast("long").as("v"))
    val r = base.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n"))
      .collect()(0)
    val lo = r.getLong(0)
    val hi = r.getLong(1)
    val nTotal = r.getLong(2)
    require(lo >= 0, s"negative values break div parity: min=$lo")
    // fail FAST on silent BIGINT wrap: Spark wraps sum(v*v) while a
    // DuckDB replay errors or differs — hi^2 * n bounds every partial
    // and total sum of squares, so inside Long means no wrap anywhere
    require(BigInt(hi) * BigInt(hi) * BigInt(nTotal) <= Long.MaxValue,
      s"sum(v*v) can exceed BIGINT (max=$hi, n=$nTotal): rescale values " +
        "or move the prefix stats to DECIMAL(38,0)")
    val w = (hi - lo) / m + 1
    val cells = base
      .selectExpr(s"(v - ${lo}L) DIV ${w}L AS cell", "v")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("a"),
        sum(col("v") * col("v")).as("q"))
      .collect()
    val pn = new Array[Long](m + 1)
    val pa = new Array[Long](m + 1)
    val pq = new Array[Long](m + 1)
    cells.foreach { row =>
      val c = row.getLong(0).toInt
      pn(c + 1) = row.getLong(1); pa(c + 1) = row.getLong(2)
      pq(c + 1) = row.getLong(3)
    }
    for (j <- 1 to m) {
      pn(j) += pn(j - 1); pa(j) += pa(j - 1); pq(j) += pq(j - 1)
    }
    // the SQL replay's argmin key packs cost*(m+1)+i; every DP cost is
    // <= the global SSE, so this bound keeps the packed key in BIGINT
    require(BigInt(cst(pn, pa, pq)(0, m)) * (m + 1) <= Long.MaxValue,
      s"totalSSE*(m+1) exceeds BIGINT: the packed argmin key would " +
        "wrap — reduce m or rescale values")
    val bounds = solve(pn, pa, pq, m, b)
    (1 to b).map { bb =>
      val i = bounds(bb - 1)
      val j = bounds(bb)
      (bb.toLong, lo + i * w, lo + j * w, pn(j) - pn(i),
        cst(pn, pa, pq)(i, j))
    }.toDF("bucket", "lo_edge", "hi_edge", "n_rows", "sse_int")
      .orderBy(asc("bucket"))
  }

  /** SSE of cells (i, j] from prefix stats — the ONE mirrored IEEE
    * chain, floored once (shared by the histogram and
    * [[Changepoint]]'s time segmentation). */
  private[ops] def cst(pn: Array[Long], pa: Array[Long],
      pq: Array[Long])(i: Int, j: Int): Long = {
    val n = pn(j) - pn(i)
    if (n == 0) 0L
    else {
      val a = (pa(j) - pa(i)).toDouble
      math.floor((pq(j) - pq(i)).toDouble - a * a / n.toDouble).toLong
    }
  }

  /** The boundary DP + backtrack over prefix stats: returns the b+1
    * boundary cell indices (bounds(0)=…=0, bounds(b)=m). Ties break
    * toward the smaller split index — the packed `cost·(m+1)+i` argmin
    * the SQL replay mirrors. */
  private[ops] def solve(pn: Array[Long], pa: Array[Long],
      pq: Array[Long], m: Int, b: Int): Array[Int] = {
    val c = cst(pn, pa, pq) _
    val cost = Array.ofDim[Long](b + 1, m + 1)
    val arg = Array.ofDim[Int](b + 1, m + 1)
    for (j <- 0 to m) { cost(1)(j) = c(0, j); arg(1)(j) = 0 }
    for (bb <- 2 to b; j <- 0 to m) {
      var bc = Long.MaxValue
      var bi = -1
      var i = 0
      while (i <= j) {
        val t = cost(bb - 1)(i) + c(i, j)
        if (t < bc) { bc = t; bi = i } // strict <: ties keep smaller i
        i += 1
      }
      cost(bb)(j) = bc
      arg(bb)(j) = bi
    }
    val bounds = new Array[Int](b + 1)
    bounds(b) = m
    for (bb <- b - 1 to 0 by -1) bounds(bb) = arg(bb + 1)(bounds(bb + 1))
    bounds
  }
}
