package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling" — public method): estimate how target-like each raw
  * document is under two hashed n-gram bag models and resample the
  * raw corpus toward the target distribution.
  *
  *   - Features: word unigrams + bigrams hashed into B buckets
  *     (xxhash64 mod B) — the fixed-dimension trick that makes the
  *     model size INDEPENDENT of corpus size.
  *   - Model: bucket counts over the target set and over the raw
  *     corpus; per-bucket importance weight
  *     λ[f] = ln p̂_target[f] − ln p̂_raw[f] (add-1 smoothed).
  *   - Score: Σ_f∈doc λ[f] — the log importance ratio of the doc's
  *     feature bag.
  *   - Selection: Gumbel top-k over score + g_i, which draws k docs
  *     WITHOUT replacement with probability ∝ exp(score) — the
  *     "sample, don't threshold" half of DSIR that keeps diversity.
  *
  * Scale shape: the model is a CONSTANT-size (B ≈ 4k) vector — the
  * two training passes are partial+final count aggregates whose
  * shuffle carries ≤ B rows per side; the weight table is computed
  * once driver-side (B-bounded) and rides the scoring plan as a
  * literal array (build notes: literal lookup tables are fine to
  * ~MBs and element_at on a literal is O(1) per probe); scoring is
  * scan-stage arithmetic with NO shuffle; selection is one
  * TakeOrdered (per-partition heap, driver merges k rows). Nothing
  * grows with corpus size except the single scoring scan.
  *
  * Determinism: scores are INTEGER micro-nats — the per-bucket log
  * ratio is rounded to the 10⁻⁶ grid exactly once, driver-side, so a
  * doc's score is a sum of integers (order-independent, bit-identical
  * on every run/partitioning); the Gumbel noise derives from md5(id)
  * like every other sampling coin in [[graft.ops.Sampling]].
  */
object Dsir {

  /** Hashed feature-bucket array (unigrams then bigrams) of `text`.
    * The token array materializes once; the lambdas route elements
    * (same shape as [[LangModel.bigramOccurrences]]). The bucket hash
    * is the 52-bit md5 prefix mod B — at production scale you'd use
    * xxhash64 (cheaper per token), the md5 prefix is the substitution
    * that lets the DuckDB oracle replay every bucket bit-for-bit
    * (('0x'||substring(md5(t),1,13))::BIGINT % B), the same trade
    * SpanDedup's gram keys make. */
  def features(text: Column, buckets: Int): Column = {
    val w = TextAnalysis.tokens(text)
    def h(t: Column): Column =
      pmod(conv(substring(md5(t), 1, 13), 16, 10).cast("long"),
        lit(buckets.toLong))
    val uni = transform(w, h(_))
    val bi = zip_with(
      slice(w, lit(1), size(w) - 1),
      slice(w, lit(2), size(w) - 1),
      (a, b) => h(concat_ws(" ", a, b)))
    when(size(w) >= 2, concat(uni, bi)).otherwise(uni)
  }

  /** Bucket-count vector of a corpus: ONE explode + count, shuffle
    * bounded by B, collected as a dense B-length array (bounded by
    * construction — this is the whole point of hashing). */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int): Array[Long] = {
    val counts = df.select(explode(features(col(textCol), buckets)).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    Array.tabulate(buckets)(i => counts.getOrElse(i, 0L))
  }

  /** Per-bucket importance weights in integer micro-nats:
    * round(1e6 · (ln p̂_t[f] − ln p̂_r[f])), add-(1/B) smoothing — ONE
    * unit of smoothing mass across the whole table, not B. Add-1
    * would put B pseudo-counts against a target set whose REAL count
    * mass is often far smaller (a 25-doc target holds ~10³ n-grams
    * against B = 4096 pseudo-counts), crushing p̂_t for every feature
    * by the ratio of the two masses and dragging every score negative
    * regardless of content — measured exactly that on the short-doc
    * corpus before the fix. With 1/B, shared vocabulary cancels
    * (λ ≈ 0), target-only features score strongly positive, and
    * target-absent features strongly negative. Computed once; the
    * only floating-point step in the whole operator. Rounding is
    * floor(x·10⁶ + 0.5) — the one shape a SQL oracle can recompute
    * verbatim (rint's banker's rounding has no SQL twin); every
    * intermediate (count + 1/B with B a power of two, the +1.0
    * denominators, the divisions) is IEEE-exact or correctly rounded
    * identically in both engines, so only ln's final ulp is shared
    * risk — the same exposure the hash-exact q_vocab_drift carries. */
  def weightsMicroNats(target: Array[Long], raw: Array[Long]): Array[Long] = {
    require(target.length == raw.length,
      s"bucket count mismatch: ${target.length} vs ${raw.length}")
    val b = target.length
    val alpha = 1.0 / b
    val nt = target.sum + 1.0
    val nr = raw.sum + 1.0
    Array.tabulate(b) { f =>
      val lt = math.log((target(f) + alpha) / nt)
      val lr = math.log((raw(f) + alpha) / nr)
      math.floor((lt - lr) * 1e6 + 0.5).toLong
    }
  }

  /** Per-doc importance score: (doc_id, n_feats, score_micronats).
    * Zero-shuffle scan-stage arithmetic; the weight table rides the
    * plan as a literal and element_at probes it O(1) per feature. */
  def score(df: DataFrame, textCol: String, idCol: String,
      weights: Array[Long], buckets: Int): DataFrame = {
    require(weights.length == buckets, "weights/buckets mismatch")
    val w = typedLit(weights.toSeq)
    val f = features(col(textCol), buckets)
    df.select(col(idCol).as("doc_id"), f.as("f"))
      .select(col("doc_id"), size(col("f")).as("n_feats"),
        aggregate(col("f"), lit(0L),
          (acc, b) => acc + element_at(w, b.cast("int") + 1))
          .as("score_micronats"))
  }

  /** Gumbel top-k selection: keep k docs without replacement with
    * P(doc) ∝ exp(score). The Gumbel draw is −ln(−ln(u)) with u a
    * 52-bit md5 uniform keyed by (seed, id) — deterministic across
    * runs and engines, same coin family as ops.Sampling. Bounded
    * output: TakeOrdered by the perturbed key. */
  def resample(df: DataFrame, textCol: String, idCol: String,
      weights: Array[Long], buckets: Int, k: Int,
      seed: String = "dsir"): DataFrame = {
    val scored = score(df, textCol, idCol, weights, buckets)
    val u = (conv(substring(md5(concat(lit(seed), lit(":"),
      col("doc_id").cast("string"))), 1, 13), 16, 10).cast("double") +
      lit(0.5)) / lit(4503599627370496.0) // (x+0.5)/2^52 ∈ (0,1)
    val gumbel = -log(-log(u))
    scored
      .withColumn("sel_key",
        col("score_micronats").cast("double") / lit(1e6) + gumbel)
      .orderBy(desc("sel_key"))
      .limit(k)
  }
}
