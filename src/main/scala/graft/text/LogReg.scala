package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary logistic regression over hashed unigram term frequencies —
  * the other half of the cheap-linear-classifier toolbox next to
  * [[NaiveBayes]] (CCNet/GPT-3-style quality filters are trained
  * exactly like this: a seed set a few hundred strong, a linear
  * model, then score everything).
  *
  * Scale shape (the k-means/coreset recipe from the build notes —
  * driver loop on a bounded deterministic sample, corpus touched in
  * ONE distributed pass):
  *   - featurize+sample: the SAMPLE's feature arrays are computed by
  *     the same Spark expression the scorer uses (no driver
  *     re-implementation of tokenize/hash to drift), selected by the
  *     deterministic (xxhash64(id), id) order, and collected bounded
  *     (`sampleN` rows — the training set, not the corpus);
  *   - train: full-batch gradient descent driver-side over fixed
  *     iteration order — bit-reproducible weights, no cross-partition
  *     double-sum nondeterminism;
  *   - score: scan-stage only — frozen weights ride the plan as one
  *     literal array, each doc's margin is an `aggregate` over its
  *     bucket array; NO shuffle before the tiny confusion aggregate.
  */
object LogReg {

  final case class Model(buckets: Int, bias: Double, weights: Seq[Double],
      lossHistory: Seq[Double])

  /** Normalized-tf feature vector: bucket counts scaled by
    * buckets/tokenCount, so features average ~1 regardless of doc
    * length or bucket count — fixed-step GD then behaves the same on
    * 10-token fixtures and 500-token corpus docs (unscaled mean-tf
    * is O(1/B) and the gradient stalls at the bias). */
  private def countsOf(fs: Seq[Long], buckets: Int): Array[Double] = {
    val v = new Array[Double](buckets)
    fs.foreach(b => v(b.toInt) += 1.0)
    if (fs.nonEmpty) {
      val s = buckets.toDouble / fs.length
      var i = 0; while (i < buckets) { v(i) *= s; i += 1 }
    }
    v
  }

  /** Deterministic bounded-sample trainer. `labelCol` is a boolean
    * Column (the positive class); `idCol` orders the sample. */
  def train(docs: DataFrame, textCol: String, idCol: String,
      labelCol: Column, buckets: Int, sampleN: Int = 512,
      iters: Int = 500, lr: Double = 1.0): Model = {
    val sample = docs
      .select(labelCol.cast("double").as("y"),
        NaiveBayes.hashedFeatures(col(textCol), buckets).as("f"),
        xxhash64(col(idCol)).as("h"), col(idCol).as("id"))
      .orderBy(col("h"), col("id")).limit(sampleN) // TakeOrdered, bounded
      .collect()
    val ys = sample.map(_.getDouble(0))
    val xs = sample.map(r => countsOf(r.getSeq[Long](1), buckets))
    val n = xs.length
    require(n > 0, "empty training sample")
    val w = new Array[Double](buckets)
    var b = 0.0
    val losses = Seq.newBuilder[Double]
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](buckets)
      var gb = 0.0
      var loss = 0.0
      var i = 0
      while (i < n) { // fixed order: bit-reproducible
        var m = b
        val x = xs(i)
        var j = 0
        while (j < buckets) { m += w(j) * x(j); j += 1 }
        val p = 1.0 / (1.0 + math.exp(-m))
        val err = p - ys(i)
        j = 0
        while (j < buckets) { gw(j) += err * x(j); j += 1 }
        gb += err
        loss -= (if (ys(i) > 0.5) math.log(math.max(p, 1e-12))
                 else math.log(math.max(1.0 - p, 1e-12)))
        i += 1
      }
      var j = 0
      while (j < buckets) { w(j) -= lr * gw(j) / n; j += 1 }
      b -= lr * gb / n
      losses += loss / n
      it += 1
    }
    Model(buckets, b, w.toSeq, losses.result())
  }

  /** Scan-stage margin column for `textCol` under a frozen model:
    * bias + (sum over token buckets of w(bucket)) * B / tokenCount —
    * the same normalized-tf dot product the trainer optimizes. */
  def margin(textCol: Column, model: Model): Column = {
    val w = typedLit(model.weights)
    val f = NaiveBayes.hashedFeatures(textCol, model.buckets)
    val s = aggregate(f, lit(0.0),
      (acc, b) => acc + element_at(w, b.cast("int") + 1))
    lit(model.bias) +
      when(size(f) > 0,
        s * lit(model.buckets.toDouble) / size(f).cast("double"))
        .otherwise(lit(0.0))
  }

  /** Confusion matrix of `labelCol` (actual) vs margin>0 (pred) —
    * one scan + a ≤4-row aggregate. */
  def confusion(docs: DataFrame, textCol: String, labelCol: Column,
      model: Model): DataFrame =
    docs.select(labelCol.cast("long").as("actual"),
        (margin(col(textCol), model) > 0).cast("long").as("pred"))
      .groupBy(col("actual"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("actual"), col("pred"))
}
