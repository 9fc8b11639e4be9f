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
  * renames happen). Multi-column keys join on an unescaped `'|'`;
  * that contract is SELF-ENFORCED — a key component containing the
  * separator raises at execution (two distinct keys colliding onto
  * one draw would correlate their noise). Pre-hash components whose
  * values can contain `'|'`.
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

  /** One rendered key component: nulls normalize to `<null>`, and the
    * reserved `'|'` separator is rejected AT EXECUTION (a component
    * containing it would collide two distinct multi-column keys onto
    * one noise draw — correlated noise, weaker protection). The guard
    * runs on the tiny post-agg frame only. */
  private def keyComponent(c: Column): Column = {
    val s = coalesce(c.cast("string"), lit("<null>"))
    when(s.contains("|"),
      raise_error(concat(
        lit("DP key component contains the reserved '|' separator: "), s)))
      .otherwise(s)
  }

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

  /** Noisy per-group counts with small-group suppression:
    * (group cols, noisy_micro). `noisy_micro` is the released
    * statistic (true count + Laplace noise, micro-units); groups whose
    * NOISY count falls below `minRelease` are DROPPED ENTIRELY — key
    * and value. Thresholding on the noisy value keeps the decision
    * itself private (a threshold on the true count would leak it), and
    * dropping — rather than flagging — the suppressed groups is what
    * makes the release private over a DATA-DEPENDENT key domain: the
    * output key set is itself a function of the data, and emitting a
    * below-threshold group (even marked suppressed) would reveal
    * count ≥ 1 with certainty. The true count never leaves this
    * function.
    *
    * Privacy accounting (stability-based histogram, Korolova et al.
    * WWW'09 / Wilson et al. PETS'20): over a data-dependent domain
    * this is (eps, delta)-DP with
    * `delta = P[1 + Lap(1/eps) >= minRelease]
    *        = (1/2)·exp(-eps·(minRelease - 1))` for `minRelease >= 1`
    * — the chance a group supported by a single row survives the
    * noisy threshold. Pick `minRelease ~ 1 + ln(1/(2·delta))/eps` for
    * a target delta. Over a FIXED public key domain (release every
    * public key, no threshold) the mechanism is pure eps-DP. */
  def noisyCounts(df: DataFrame, keyCols: Seq[String], eps: Double,
      minRelease: Long, salt: String = ""): DataFrame = {
    // normalize each component: concat_ws SKIPS nulls while the oracle
    // '||' would propagate them — a null key column must key the same
    // draw in both engines
    val keyStr = concat_ws("|", keyCols.map(c => keyComponent(col(c))): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("noisy_micro",
        col("__n") * lit(1000000L) +
          laplaceNoiseMicro(keyStr, eps, salt = salt))
      .where(col("noisy_micro") >= lit(minRelease * 1000000L))
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
    require(!valueCol.contains("|"), s"reserved '|' in value col $valueCol")
    val keyStr = concat_ws("|",
      lit(s"sum:$valueCol") +: keyCols.map(c => keyComponent(col(c))): _*)
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
    * `eps_draw·count/2 + Gumbel(0,1)` are distributed exactly as k
    * sequential exponential-mechanism draws without replacement — one
    * pass, no iteration.
    *
    * '''`eps` is the TOTAL budget for the whole k-rank release.''' The
    * one-shot mechanism EQUALS k sequential exponential-mechanism
    * draws, so the cost composes over the draws (Durfee & Rogers
    * analyze the composition explicitly); this function spends
    * `eps_draw = eps/k` per draw (basic composition: k·(eps/k) = eps),
    * so releasing 20 ranks at eps=1.0 really is a 1.0-DP release —
    * the parameter means what a curator budgeting a release needs it
    * to mean. (The paper's refined bound is tighter than basic
    * composition; basic is the conservative choice.)
    *
    * The Gumbel comes from the deterministic
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
    // per-draw budget eps/k (total = eps under basic composition); the
    // oracle mirrors the same division in DOUBLE: (eps/2)::DOUBLE / k
    val sMicro = floor((col(countCol).cast("double") *
      lit(eps / 2.0 / k.toDouble) -
      log(-log(u))) * lit(1000000.0))
    counts.select(col(keyCol), sMicro.as("__s"))
      .orderBy(desc("__s"), asc(keyCol))
      .limit(k)
      .select(row_number().over(
          Window.orderBy(desc("__s"), asc(keyCol)))
        .cast("long").as("rk"), col(keyCol))
  }

  /** Composed private DATASET CARD — one release frame carrying the
    * three mechanisms of this module under an explicit budget split:
    *
    *   - per-group noisy counts at `epsCounts` (threshold-suppressed),
    *   - clipped per-group noisy sums of `valueCol` at `epsSums`,
    *   - a Gumbel top-`k` vocabulary over `tokenCounts` at `epsTopk`
    *     (total budget — the op spends epsTopk/k per draw).
    *
    * '''Accounting (basic sequential composition)''': each mechanism
    * is individually DP on the whole dataset, so the card is
    * `(epsCounts + epsSums + epsTopk, delta)`-DP, with `delta` coming
    * solely from the counts threshold over a data-dependent key domain
    * (see [[noisyCounts]]). The sums section is RESTRICTED (left-semi
    * join) to the keys that survived the counts threshold — publishing
    * a sum for a count-suppressed key would reveal count ≥ 1 with
    * certainty, voiding the stability accounting — so the card's key
    * set is decided once, by the counts mechanism, and the sums add no
    * extra delta.
    * Composition is valid precisely BECAUSE the three draws live in
    * pairwise-distinct tagged domains (`dp|…`, `dp|sum:col|…`,
    * `dp|topk|…`): no uniform is shared, so no mechanism's noise is a
    * function of another's — the spec asserts the pairwise
    * independence. Deterministic noise keeps re-publication free: a
    * re-run of the card releases the SAME sample, not a fresh one.
    *
    * Output: `(section, key, rk, value_micro)` — sections `count`,
    * `sum_<valueCol>` (rk 0, noisy value in micro-units) and
    * `top_<tokenCol>` (rank released, value_micro NULL: the noisy
    * score stays inside the mechanism). One ordered frame, suitable
    * for export as the public card. */
  def datasetCard(df: DataFrame, keyCols: Seq[String], valueCol: String,
      clip: Long, tokenCounts: DataFrame, tokenCol: String,
      countCol: String, epsCounts: Double, epsSums: Double,
      epsTopk: Double, minRelease: Long, k: Int,
      salt: String = ""): DataFrame = {
    val keyRender = concat_ws("|",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)
    val counts = noisyCounts(df, keyCols, epsCounts, minRelease, salt)
      .select(lit("count").as("section"), keyRender.as("key"),
        lit(0L).as("rk"), col("noisy_micro").as("value_micro"))
    // keys are decided ONCE, by the thresholded counts: a sum published
    // for a count-suppressed key would reveal count >= 1 with certainty
    // (the semi-join is on the RENDERED key so null keys still match)
    val sums = noisySums(df, keyCols, valueCol, clip, epsSums, salt)
      .select(keyRender.as("key"), col("noisy_sum_micro"))
      .join(broadcast(counts.select(col("key"))), Seq("key"), "left_semi")
      .select(lit(s"sum_$valueCol").as("section"), col("key"),
        lit(0L).as("rk"), col("noisy_sum_micro").as("value_micro"))
    val top = gumbelTopK(tokenCounts, tokenCol, countCol, epsTopk, k, salt)
      .select(lit(s"top_$tokenCol").as("section"),
        col(tokenCol).cast("string").as("key"), col("rk"),
        lit(null).cast("long").as("value_micro"))
    counts.unionByName(sums).unionByName(top)
      .orderBy(asc("section"), asc("rk"), asc("key"))
  }
}
