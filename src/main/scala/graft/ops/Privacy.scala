package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private count release — the privacy-preserving
  * dataset-card primitive (Dwork et al. 2006 Laplace mechanism; the
  * central-DP release shape used for public corpus statistics).
  * Per-group counts have sensitivity 1 (one document moves one
  * group's count by 1) and the noise is `Laplace(1/eps)` on each
  * count.
  *
  * The noise is DETERMINISTIC: the uniform comes from a 52-bit md5
  * draw on `salt|group-key` (the [[Sampling]] coin — exact in a
  * double on every engine), pushed through the Laplace inverse CDF
  * `-b * sign(u-1/2) * ln(1 - 2|u-1/2|)` in ONE mirrored double
  * chain and floored ONCE to integer micro-units. Determinism means
  * a re-run never publishes a second noise sample for the same
  * statistic (which would halve the effective privacy budget).
  *
  * '''The salt is the privacy.''' The eps-DP guarantee holds only
  * against an adversary who cannot evaluate the draw — i.e. when
  * `salt` is a SECRET held by the curator (then each uniform is
  * unpredictable, exactly one per statistic). With the default empty
  * salt the mechanism runs in REPLAYABLE TEST MODE: anyone who knows
  * the group name can recompute the noise and invert the release —
  * zero privacy, but bit-exact engine-replayable (how the oracle
  * verifies the mechanism end-to-end). Production releases must pass
  * a secret salt.
  *
  * Caveats the caller owns: the draw is keyed by the group NAME, so
  * renaming a group re-keys its noise (key by a stable group id if
  * renames happen); and multi-column keys join on an unescaped
  * `'|'`, so key components containing `'|'` can collide onto one
  * draw — avoid the separator in key values or pre-hash components.
  *
  * Scale shape: one partial+final count aggregate; the noise is
  * scan-stage arithmetic on the tiny post-agg frame. Nothing here
  * can skew or funnel.
  */
object Privacy {

  private val Two52 = 4503599627370496.0 // 2^52

  /** The tagged 52-bit md5 uniform behind every draw in this module
    * (one definition so the engine-parity-critical coin cannot drift
    * between mechanisms). Domain string = "dp|" or "dp|salt|". */
  private def mdUniform(domain: String, key: Column): Column =
    greatest(
      conv(substring(md5(concat(lit(domain), key.cast("string"))), 1, 13),
        16, 10).cast("double"),
      lit(1.0)) / lit(Two52)

  private def domainOf(salt: String): String =
    if (salt.isEmpty) "dp|" else s"dp|$salt|"

  /** Laplace(sensitivity/eps) noise in integer micro-units,
    * deterministic in (`salt`, `key`). `eps` and `sensitivity` must
    * be exactly double-representable (1.0, 0.5, 64.0, …) so the
    * oracle can spell the same literal. The u=0 draw is clamped to
    * 2^-52 (the esKey rule); u is then in [2^-52, 1-2^-52], so `ln`
    * never sees 0 and the noise is finite:
    * |noise| ≤ ln(2^51)·sensitivity/eps. */
  def laplaceNoiseMicro(key: Column, eps: Double,
      sensitivity: Double = 1.0, salt: String = ""): Column = {
    val u = mdUniform(domainOf(salt), key)
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
      minRelease: Long, salt: String = ""): DataFrame = {
    // coalesce each component: concat_ws SKIPS nulls while the oracle
    // '||' would propagate them — a null key column must key the same
    // draw in both engines
    val keyStr = concat_ws("|",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("noisy_micro",
        col("__n") * lit(1000000L) +
          laplaceNoiseMicro(keyStr, eps, salt = salt))
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
      clip: Long, eps: Double, salt: String = ""): DataFrame = {
    // distinct noise domain from noisyCounts: a release publishing a
    // count AND a sum for the same group must not share one uniform
    // (correlated noise halves the effective protection)
    val keyStr = concat_ws("|",
      lit(s"sum:$valueCol") +:
        keyCols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)
    val clamped = least(greatest(col(valueCol).cast("long"), lit(0L)),
      lit(clip))
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(clamped).as("__s"))
      .withColumn("noisy_sum_micro",
        col("__s") * lit(1000000L) +
          laplaceNoiseMicro(keyStr, eps, sensitivity = clip.toDouble,
            salt = salt))
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
    * Same salt contract as the module doc: the guarantee needs a
    * SECRET salt; the empty default is replayable test mode.
    *
    * Scale shape: one aggregate the caller provides, a scan-stage
    * score, and orderBy+limit → TakeOrderedAndProject (bounded heap
    * per partition, k-row driver merge — never a global sort). The
    * k-row rank window is bounded by k. */
  def gumbelTopK(counts: DataFrame, keyCol: String, countCol: String,
      eps: Double, k: Int, salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = mdUniform(
      if (salt.isEmpty) "dp|topk|" else s"dp|$salt|topk|", col(keyCol))
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
