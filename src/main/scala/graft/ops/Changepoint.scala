package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multiple-changepoint detection as OPTIMAL k-segmentation (Bellman
  * 1961 dynamic-programming segmentation; the exact counterpart of
  * binary-segmentation heuristics): fit the time series of per-week
  * counts with `k` piecewise-constant segments minimizing total
  * within-segment SSE. The segmentation view of regime change — the
  * drift monitors (KS/JS families) compare adjacent windows; this op
  * finds the globally optimal split of the whole history, the
  * "when did ingestion volume actually change" answer.
  *
  * Machinery is [[VoptHist]]'s boundary DP applied to TIME cells
  * instead of value cells: one aggregate pass builds the week-indexed
  * count series (absent weeks are honest zero-count cells), prefix
  * stats go to the shared driver DP (floored-once IEEE SSE terms,
  * integer sums, smaller-split tie rule), and the DuckDB oracle
  * replays the same unrolled layers + backtrack. */
object Changepoint {

  /** @param dateCol name of a date/timestamp column; weeks =
    *                 epoch-days DIV 7 (nonneg here, so truncating DIV
    *                 ≡ DuckDB `//` — Column./ on longs would be double
    *                 division, the known trap).
    * @return (segment, lo_week, hi_week, n_weeks, total_rows, sse_int)
    *         — k rows; segment covers epoch-weeks [lo_week, hi_week). */
  def segments(df: DataFrame, dateCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k >= 1, s"k $k")
    val weeks = df
      .selectExpr("CAST(datediff(CAST(" + dateCol +
        " AS DATE), DATE '1970-01-01') AS BIGINT) DIV 7 AS w")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(weeks.nonEmpty, "empty series")
    val loW = weeks.keys.min
    val m = (weeks.keys.max - loW + 1).toInt
    // fail fast on BIGINT wrap (the VoptHist envelope): c*c and the
    // running Σc² must stay in Long, or engines silently diverge
    val cMax = weeks.values.max
    require(BigInt(cMax) * BigInt(cMax) * m <= Long.MaxValue,
      s"sum(c*c) can exceed BIGINT (max weekly count=$cMax, m=$m): " +
        "aggregate on a coarser grid or move prefix stats to DECIMAL")
    val pn = new Array[Long](m + 1)
    val pa = new Array[Long](m + 1)
    val pq = new Array[Long](m + 1)
    for (j <- 1 to m) {
      val c = weeks.getOrElse(loW + j - 1, 0L)
      pn(j) = pn(j - 1) + 1 // every week is one cell, present or not
      pa(j) = pa(j - 1) + c
      pq(j) = pq(j - 1) + c * c
    }
    // the SQL replay packs cost*(m+1)+i into one BIGINT argmin key
    require(BigInt(VoptHist.cst(pn, pa, pq)(0, m)) * (m + 1)
        <= Long.MaxValue,
      s"totalSSE*(m+1) exceeds BIGINT: packed argmin key would wrap")
    val bounds = VoptHist.solve(pn, pa, pq, m, k)
    (1 to k).map { s =>
      val i = bounds(s - 1)
      val j = bounds(s)
      (s.toLong, loW + i, loW + j, (j - i).toLong, pa(j) - pa(i),
        VoptHist.cst(pn, pa, pq)(i, j))
    }.toDF("segment", "lo_week", "hi_week", "n_weeks", "total_rows",
      "sse_int")
      .orderBy(asc("segment"))
  }
}
