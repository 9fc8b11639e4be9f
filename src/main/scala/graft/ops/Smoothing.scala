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

  /** Holt double-exponential (level + trend) smoothing with the same
    * integer contract: with f = l + b (the 1-step-ahead forecast),
    *   l' = f + (x·1e6 − f) / alphaDen   (≡ α·x + (1−α)·f)
    *   b' = b + ((l' − l) − b) / betaDen (≡ β·(l'−l) + (1−β)·b)
    * both in truncating long division (numerators signed — trunc ≡
    * DuckDB BIGINT `//`). Init l₁ = x₁·1e6, b₁ = 0, f₁ = l₁ (err 0).
    * Returns (key, x, levelMicro, trendMicro, forecastMicro,
    * errMicro) ascending; errMicro = x·1e6 − f is the 1-step-ahead
    * forecast error. */
  def holt(series: Seq[(String, Long)], alphaDen: Long,
      betaDen: Long): Seq[(String, Long, Long, Long, Long, Long)] = {
    var l = 0L
    var b = 0L
    series.sortBy(_._1).zipWithIndex.map { case ((k, x), i) =>
      val xm = x * 1000000L
      val f = if (i == 0) xm else l + b
      val lNew = if (i == 0) xm else f + (xm - f) / alphaDen
      val bNew = if (i == 0) 0L else b + ((lNew - l) - b) / betaDen
      l = lNew
      b = bNew
      (k, x, l, b, f, xm - f)
    }
  }

  /** Holt–Winters ADDITIVE seasonal smoothing (level + trend +
    * period-m seasonal array) — the seasonal upgrade of [[holt]],
    * same integer contract. With sOld = s[i mod m] (the slot last
    * updated m steps ago), lb = l + b and xm = x·1e6:
    *
    *   f  = lb + sOld                                (1-step forecast)
    *   l' = lb + ((xm − sOld) − lb) / alphaDen
    *   b' = b + ((l' − l) − b) / betaDen
    *   s' = sOld + ((xm − l') − sOld) / gammaDen     (slot i mod m)
    *
    * all in truncating long division (signed numerators — trunc ≡
    * DuckDB BIGINT `//`, the q_ewma_smooth rule; never Math.floorDiv).
    * Init: l₁ = x₁·1e6, b₁ = 0, s = 0⁷ — seasonality is LEARNED
    * through the gamma recursion rather than seeded from the first
    * period, which keeps the init replayable as one recursive-CTE
    * anchor row. Returns (key, x, levelMicro, trendMicro,
    * seasonMicro, forecastMicro, errMicro) ascending; seasonMicro is
    * the UPDATED seasonal for this step's slot. */
  def holtWinters(series: Seq[(String, Long)], m: Int, alphaDen: Long,
      betaDen: Long, gammaDen: Long)
      : Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    var l = 0L
    var b = 0L
    val s = Array.fill(m)(0L)
    series.sortBy(_._1).zipWithIndex.map { case ((k, x), i) =>
      val xm = x * 1000000L
      val pos = i % m
      val sOld = s(pos)
      val lb = l + b
      val f = if (i == 0) xm else lb + sOld
      val lNew = if (i == 0) xm else lb + ((xm - sOld) - lb) / alphaDen
      val bNew = if (i == 0) 0L else b + ((lNew - l) - b) / betaDen
      val sNew = if (i == 0) 0L else sOld + ((xm - lNew) - sOld) / gammaDen
      l = lNew
      b = bNew
      s(pos) = sNew
      (k, x, l, b, sNew, f, xm - f)
    }
  }

  /** Split-conformal radius (Vovk et al.; Lei et al. 2018): the
    * k-th smallest absolute residual among the calibration steps.
    * With k = ⌈(1−α)(n+1)⌉ over n calibration residuals, the interval
    * forecast ± radius covers a fresh exchangeable step with
    * probability ≥ 1−α — a DATA VALUE, so it compares exactly in any
    * engine (the ops/Winsorize rank-selection rule; an interpolated
    * quantile here would hit the round()-midpoint class). */
  def conformalRadius(absResiduals: Seq[Long], k: Int): Long = {
    require(k >= 1 && k <= absResiduals.size,
      s"rank $k outside 1..${absResiduals.size}")
    absResiduals.sorted.apply(k - 1)
  }
}
