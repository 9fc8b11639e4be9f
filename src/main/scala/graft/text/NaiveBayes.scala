package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier over hashed unigram
  * buckets — the fastText-shaped linear classifier every corpus
  * pipeline ends up needing (quality gates, language routing, domain
  * tagging: GPT-3/CCNet-style filtering is exactly "train a cheap
  * linear model on seed sets, score everything"). Public method;
  * the hashing trick makes the model CONSTANT-size regardless of
  * corpus or vocabulary size.
  *
  * Scale shape:
  *   - train: one explode → partial+final count aggregate whose
  *     shuffle carries ≤ classes×B rows (B = bucket count), plus a
  *     per-class doc count — both bounded collects (the model, not
  *     the data, comes to the driver);
  *   - score: scan-stage only — the per-class weight tables ride the
  *     plan as literal arrays (fine to ~MBs per the build notes) and
  *     each document's score is a sum of integer micro-nats over its
  *     feature array; NO shuffle until the tiny confusion-matrix
  *     aggregate (≤ classes² rows).
  *
  * Determinism / oracle parity (the [[Dsir]] micro-nat trick, plus
  * cross-engine hashing): features hash through md5 — not xxhash64 —
  * because the oracle engine computes the identical digest, so bucket
  * assignment is bit-reproducible across engines; every log is taken
  * driver-side on a handful of doubles and rounded half-up to the
  * 10⁻⁶ grid, so document scores are order-independent integer sums
  * and argmax ties break on the fixed class order identically in both
  * engines.
  */
object NaiveBayes {

  /** Hashed unigram bucket array: md5(token) → 52-bit int → mod B.
    * Mirrors the oracle's ('0x'||substr(md5(w),1,13))::BIGINT % B. */
  def hashedFeatures(text: Column, buckets: Int): Column =
    transform(TextAnalysis.tokens(text),
      t => pmod(conv(substring(md5(t), 1, 13), 16, 10).cast("long"),
        lit(buckets.toLong)))

  /** classes in FIXED argmax-tiebreak order; priorsMu(i) = µ-nat log
    * prior of classes(i); weightsMu(i) = dense B-length µ-nat
    * log-likelihood table (add-1/B smoothed). */
  case class Model(classes: Seq[String], buckets: Int,
      priorsMu: Seq[Long], weightsMu: Seq[Seq[Long]])

  /** One-pass distributed train: per-(class, bucket) token counts and
    * per-class doc counts; only the bounded model is collected. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      classes: Seq[String], buckets: Int): Model = {
    require(classes.nonEmpty && classes == classes.sorted,
      "classes must be in sorted (tiebreak) order")
    val cnt = docs
      .select(col(labelCol).as("y"),
        explode(hashedFeatures(col(textCol), buckets)).as("f"))
      .groupBy(col("y"), col("f")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1).toInt) -> r.getLong(2))
      .toMap
    val nDocs = docs.groupBy(col(labelCol).as("y"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Loud failure beats silent oracle divergence: every declared
    // class must have training mass (ln(0) priors are meaningless and
    // the SQL twin would drop the class instead).
    require(classes.forall(c => nDocs.getOrElse(c, 0L) > 0L),
      s"classes without training docs: ${classes.filter(c => !nDocs.contains(c))}")
    val ndTotal = nDocs.values.sum.toDouble
    val alpha = 1.0 / buckets
    def mu(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val priors = classes.map(c =>
      mu(math.log(nDocs.getOrElse(c, 0L) / ndTotal)))
    val weights = classes.map { c =>
      // add-1/B smoothing (ONE unit of smoothing mass total — see
      // Dsir.weightsMicroNats for why add-1 craters short corpora);
      // denominator arithmetic ordered exactly as the oracle's
      // (c + 1.0/B) / (tot + 1).
      val tot = (0 until buckets).map(f => cnt.getOrElse((c, f), 0L)).sum
      (0 until buckets).map { f =>
        mu(math.log((cnt.getOrElse((c, f), 0L) + alpha) / (tot + 1.0)))
      }
    }
    Model(classes, buckets, priors, weights)
  }

  /** Score + argmax-classify `docs`, appending one µ-nat score column
    * per class and `pred` — all scan-stage. */
  def predict(docs: DataFrame, textCol: String, model: Model): DataFrame = {
    val withF = docs.withColumn("__f",
      hashedFeatures(col(textCol), model.buckets))
    val scoreCols = model.classes.zipWithIndex.map { case (c, i) =>
      val w = typedLit(model.weightsMu(i))
      (aggregate(col("__f"), lit(model.priorsMu(i)),
        (acc, f) => acc + element_at(w, f.cast("int") + 1)))
        .as(s"s_$c")
    }
    val scored = withF.select((docs.columns.map(col).toSeq ++ scoreCols): _*)
    require(model.classes.size >= 2, "need at least two classes")
    val m = greatest(model.classes.map(c => col(s"s_$c")): _*)
    // First class matching the max wins — the same WHEN order as the
    // oracle's CASE, so integer-score ties resolve identically.
    val cases = model.classes.init
    val pred = cases.tail.foldLeft(
      when(col(s"s_${cases.head}") === m, cases.head)) {
      case (acc, c) => acc.when(col(s"s_$c") === m, c)
    }.otherwise(model.classes.last)
    scored.withColumn("pred", pred)
  }
}
