package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private count release — the privacy-preserving
  * dataset-card primitive (Dwork et al. 2006 Laplace mechanism; the
  * central-DP release shape used for public corpus statistics).
  * Per-group counts have sensitivity 1 (one document moves one
  * group's count by 1), so `noise ~ Laplace(1/eps)` on each count
  * gives an eps-DP release.
  *
  * The noise is DETERMINISTIC: the uniform comes from a 52-bit md5
  * draw on the group key (the [[Sampling]] coin — exact in a double
  * on every engine), pushed through the Laplace inverse CDF
  * `-b * sign(u-1/2) * ln(1 - 2|u-1/2|)` in ONE mirrored double
  * chain and floored ONCE to integer micro-units. Determinism is a
  * feature for a release pipeline (re-running the release never
  * publishes a second noise sample for the same statistic, which
  * would halve the effective privacy budget) and it makes the whole
  * mechanism oracle-replayable.
  *
  * Caveat the caller owns: the draw is keyed by the group name, so
  * RENAMING a group re-keys its noise — a release that must stay
  * eps-DP across renames should key by a stable group id.
  *
  * Scale shape: one partial+final count aggregate; the noise is
  * scan-stage arithmetic on the tiny post-agg frame. Nothing here
  * can skew or funnel.
  */
object Privacy {

  private val Two52 = 4503599627370496.0 // 2^52

  /** Laplace(1/eps) noise in integer micro-units, deterministic in
    * `key`. `eps` must be exactly double-representable (1.0, 0.5,
    * 2.0, 0.25, …) so the oracle can spell the same literal. The
    * u=0 draw is clamped to 2^-52 (the esKey rule); u is then in
    * [2^-52, 1-2^-52], so `ln` never sees 0 and the noise is finite:
    * |noise| ≤ ln(2^51)/eps ≈ 35.4/eps. */
  def laplaceNoiseMicro(key: Column, eps: Double,
      sensitivity: Double = 1.0): Column = {
    val u = greatest(
      conv(substring(md5(concat(lit("dp|"), key.cast("string"))), 1, 13),
        16, 10).cast("double"),
      lit(1.0)) / lit(Two52)
    val c = u - lit(0.5)
    floor(lit(-sensitivity / eps) * signum(c) *
      log(lit(1.0) - lit(2.0) * abs(c)) * lit(1000000.0))
  }

  /** eps-DP noisy per-group counts with small-group suppression:
    * (group cols, noisy_micro, released). `noisy_micro` is the
    * released statistic (true count + Laplace noise, micro-units);
    * `released`=0 suppresses groups whose NOISY count falls below
    * `minRelease` — thresholding on the noisy value keeps the
    * decision itself private (a threshold on the true count would
    * leak it). The true count never leaves this function. */
  def noisyCounts(df: DataFrame, keyCols: Seq[String], eps: Double,
      minRelease: Long): DataFrame = {
    val keyStr = concat_ws("|", keyCols.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("noisy_micro",
        col("__n") * lit(1000000L) + laplaceNoiseMicro(keyStr, eps))
      .withColumn("released",
        when(col("noisy_micro") >= lit(minRelease * 1000000L), lit(1L))
          .otherwise(lit(0L)))
      .drop("__n")
  }

  /** eps-DP noisy per-group SUM with per-row contribution CLIPPING —
    * the second half of a private dataset card (total tokens per
    * language, total bytes per source). An unbounded per-row value
    * has unbounded sensitivity, so each row's contribution clamps to
    * [0, clip] FIRST; one row then moves a group sum by at most
    * `clip`, and Laplace(clip/eps) on the clipped sum is eps-DP.
    * `clip` must be exactly double-representable (a power of two
    * keeps clip/eps exact for the usual eps grid). The clipped sum —
    * like the true count — never leaves this function. */
  def noisySums(df: DataFrame, keyCols: Seq[String], valueCol: String,
      clip: Long, eps: Double): DataFrame = {
    // distinct noise domain from noisyCounts: a release publishing a
    // count AND a sum for the same group must not share one uniform
    // (correlated noise halves the effective protection)
    val keyStr = concat_ws("|",
      lit(s"sum:$valueCol") +: keyCols.map(col): _*)
    val clamped = least(greatest(col(valueCol).cast("long"), lit(0L)),
      lit(clip))
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(clamped).as("__s"))
      .withColumn("noisy_sum_micro",
        col("__s") * lit(1000000L) +
          laplaceNoiseMicro(keyStr, eps, sensitivity = clip.toDouble))
      .drop("__s")
  }

  /** eps-DP top-k selection via one-shot Gumbel noise (Durfee &
    * Rogers, "Practical differentially private top-k selection",
    * NeurIPS 2019): the k largest values of
    * `eps·count/2 + Gumbel(0,1)` are distributed exactly as k
    * sequential exponential-mechanism draws without replacement — one
    * pass, no iteration. The Gumbel comes from the deterministic
    * 52-bit md5 uniform in its own tagged domain
    * (`-ln(-ln u)`, u clamped to ≥ 2⁻⁵² so both logs stay finite),
    * and the whole score chain floors ONCE to micro-units.
    *
    * Privacy unit is one COUNTED OCCURRENCE (Δ=1: adding or removing
    * one occurrence moves one count by 1). Document-level privacy
    * needs Δ = max occurrences per document — divide eps accordingly.
    * Only (rank, key) is released; the noisy scores stay inside.
    *
    * Scale shape: one aggregate the caller provides, a scan-stage
    * score, and orderBy+limit → TakeOrderedAndProject (bounded heap
    * per partition, k-row driver merge — never a global sort). The
    * k-row rank window is bounded by k. */
  def gumbelTopK(counts: DataFrame, keyCol: String, countCol: String,
      eps: Double, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = greatest(
      conv(substring(md5(concat(lit("dp|topk|"),
        col(keyCol).cast("string"))), 1, 13), 16, 10).cast("double"),
      lit(1.0)) / lit(Two52)
    val sMicro = floor((col(countCol).cast("double") * lit(eps / 2.0) -
      log(-log(u))) * lit(1000000.0))
    counts.select(col(keyCol), sMicro.as("__s"))
      .orderBy(desc("__s"), asc(keyCol))
      .limit(k)
      .select(row_number().over(
          Window.orderBy(desc("__s"), asc(keyCol)))
        .cast("long").as("rk"), col(keyCol))
  }
}
