package graft.ops

/** Integer-exact exponential smoothing — the driver-side half of
  * q_ewma_smooth (the distributed half is the daily pre-aggregate).
  *
  * Arithmetic contract: `s ← s + (x·1e6 − s) / alphaDen` in
  * truncating long division. The residual can be NEGATIVE, and
  * DuckDB's BIGINT `//` truncates toward zero exactly like JVM long
  * division (measured: (-5)//8 = 0) — so the recursive-CTE oracle
  * replays bit-for-bit. Math.floorDiv would diverge on negative
  * residuals (that was the original q_ewma_smooth defect).
  */
object Smoothing {

  /** `series`: (key, x) rows in any order; smoothed in ascending key
    * order with s_1 = x_1·1e6. Returns (key, x, ewmaMicro,
    * residMicro) ascending. */
  def ewma(series: Seq[(String, Long)], alphaDen: Long): Seq[(String, Long, Long, Long)] = {
    var s = 0L
    series.sortBy(_._1).zipWithIndex.map { case ((k, x), i) =>
      s = if (i == 0) x * 1000000L else s + (x * 1000000L - s) / alphaDen
      (k, x, s, x * 1000000L - s)
    }
  }
}
