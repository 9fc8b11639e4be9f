package graft.ops

/** Kaplan-Meier product-limit estimation on an exact integer micro
  * grid — the driver-side half of q_kaplan_meier (the distributed
  * half is one aggregate onto the calendar-bounded duration axis).
  *
  * Arithmetic contract: every step is
  * `S ← (S · (n_risk − d)) / n_risk` in truncating long division,
  * which is exactly DuckDB's BIGINT `//` (both truncate toward zero;
  * operands here are nonnegative, so truncation ≡ floor) — the
  * recursive-CTE oracle replays bit-for-bit. A step with d = 0
  * multiplies by n/n, an exact no-op, so the recursion runs uniformly
  * over every time point and censoring only shrinks later risk sets.
  *
  * Reference for the estimator shape: Kaplan & Meier 1958 (product-
  * limit estimation from incomplete observations).
  */
object Survival {

  /** `byT`: one row per distinct duration `(t, nEnding, d)` where
    * `nEnding` counts ALL subjects whose observation ends at `t`
    * (events + censored) and `d` counts observed events at `t`.
    * Returns `(t, nAtRisk, d, survMicro)` for event time points
    * (d > 0) in ascending `t`; survMicro starts from 1e6. */
  def productLimit(byT: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    val total = byT.map(_._2).sum
    var before = 0L
    var s = 1000000L
    byT.sortBy(_._1).flatMap { case (t, ne, d) =>
      val nRisk = total - before
      before += ne
      s = s * (nRisk - d) / nRisk
      if (d > 0) Some((t, nRisk, d, s)) else None
    }
  }
}
