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

  // ------------------------------------------------------------------
  // ORACLE-EXACT integer-grid twin (the gridLeadingAxis recipe applied
  // to GD): everything below runs on a 10⁶ fixed-point grid with
  // TRUNCATING division only — Scala Long./ ≡ DuckDB BIGINT/HUGEINT
  // `//` (all truncate toward zero, measured) — so the whole recursion
  // replays as unrolled CTE layers. The only float ops are the
  // established floor-once chains: the NB log-odds INIT (ln, floored
  // once per statistic — the KN-perplexity rule) and the per-doc
  // sigmoid error (one identically-shaped exp chain on a CLAMPED
  // integer margin, floored once to micro).
  //
  // Why init + few steps, not GD from zero: the float tier runs 500
  // full-batch iterations; an unrollable oracle affords ~10 layers,
  // and measured from-zero GD at that depth barely moves (balacc
  // ≈ 0.56). The closed-form smoothed log-odds init IS a one-pass
  // aggregate (exactly the NaiveBayes discriminant direction), and
  // 8 polish steps at the 1/t-decayed unit rate measured balacc
  // 0.86–0.88 across SFs, stable in the step count — the brittle
  // fixed-rate variants (0.5–0.95 swinging with ±4 iters) were
  // rejected.
  // ------------------------------------------------------------------

  /** Grid model: micro-unit bias + per-bucket micro weights. */
  final case class GridModel(buckets: Int, biasMicro: Long,
      weightsMicro: Seq[Long])

  private val G = 1000000L
  private val MClamp = 30L * G // exp(±30) saturates p within a double

  /** Floor-once sigmoid error in micro units on a clamped integer
    * margin — ONE double chain, mirrored verbatim in the oracle. */
  private[text] def sigmoidErrMicro(m: Long, y: Long): Long = {
    val mc = math.max(-MClamp, math.min(MClamp, m)).toDouble
    math.floor((1.0 / (1.0 + math.exp(-(mc / 1000000.0))) - y) *
      1000000.0).toLong
  }

  /** Deterministic grid trainer on the md5-rank-smallest `sampleN`
    * docs (the GridKmeans sample rule — replayable, unlike xxhash64):
    * smoothed log-odds init
    *   w0_j = floor(ln((c1_j+1)/(t1+B))·10⁶) − floor(ln((c0_j+1)/(t0+B))·10⁶)
    *   b0   = floor(ln(n1/n0)·10⁶)
    * (c/t = per-class bucket/total token counts over the sample),
    * then `iters` full-batch polish steps with the 1/t-decayed unit
    * rate; features quantize ONCE: xq_j = cnt_j·B·10⁶ trunc-div len.
    * Per step t (1-based):
    *   m_i = b + trunc(Σ_j w_j·xq_ij / 10⁶)
    *   err_i = floor((σ(clamp(m_i)) − y_i)·10⁶)
    *   w_j ← w_j − trunc(Σ_i err_i·xq_ij / (n·10⁶·t))
    *   b   ← b − trunc(Σ_i err_i / (n·t))
    * — exact integers throughout (products ≲ 10¹⁷, enforced). The
    * corpus is touched once (the bounded TakeOrdered sample); the
    * loop is driver-side microseconds. */
  def gridTrain(docs: DataFrame, textCol: String, idCol: String,
      labelCol: Column, buckets: Int, sampleN: Int = 256,
      iters: Int = 8): GridModel = {
    val sample = docs
      .select(labelCol.cast("long").as("y"),
        NaiveBayes.hashedFeatures(col(textCol), buckets).as("f"),
        substring(md5(col(idCol).cast("string")), 1, 13).as("h"),
        col(idCol).as("id"))
      .orderBy(col("h"), col("id")).limit(sampleN) // TakeOrdered, bounded
      .collect()
    val n = sample.length
    require(n > 0, "empty training sample")
    val ys = sample.map(_.getLong(0))
    val n1 = ys.sum
    val n0 = n - n1
    require(n1 > 0 && n0 > 0,
      s"grid logreg needs both classes in the sample (pos=$n1 of $n)")
    // raw bucket counts (for the init) and quantized features (for
    // the GD steps) — both from the ONE collected sample
    val cnts: Array[Array[(Int, Long)]] = sample.map { r =>
      r.getSeq[Long](1).groupBy(identity).toArray
        .map { case (b, occ) => b.toInt -> occ.length.toLong }
        .sortBy(_._1)
    }
    val lens = cnts.map(_.map(_._2).sum)
    val xqs: Array[Array[(Int, Long)]] = cnts.zip(lens).map {
      case (cs, len) =>
        if (len == 0) Array.empty[(Int, Long)]
        else cs.map { case (j, c) => j -> c * buckets * G / len }
    }
    val c1 = new Array[Long](buckets)
    val c0 = new Array[Long](buckets)
    var t1 = 0L
    var t0 = 0L
    var i = 0
    while (i < n) {
      cnts(i).foreach { case (j, c) =>
        if (ys(i) == 1L) c1(j) += c else c0(j) += c }
      if (ys(i) == 1L) t1 += lens(i) else t0 += lens(i)
      i += 1
    }
    // floor-once per statistic: each class's log-likelihood floors
    // separately (two statistics, one floor each), then differences
    val w = Array.tabulate(buckets) { j =>
      math.floor(math.log((c1(j) + 1.0) / (t1 + buckets)) * 1000000.0)
        .toLong -
        math.floor(math.log((c0(j) + 1.0) / (t0 + buckets)) * 1000000.0)
          .toLong
    }
    var b = math.floor(math.log(n1.toDouble / n0) * 1000000.0).toLong
    var it = 0
    while (it < iters) {
      val gw = new Array[Long](buckets)
      var gb = 0L
      i = 0
      while (i < n) {
        var dot = 0L
        xqs(i).foreach { case (j, xq) => dot += w(j) * xq }
        val err = sigmoidErrMicro(b + dot / G, ys(i))
        xqs(i).foreach { case (j, xq) => gw(j) += err * xq }
        gb += err
        i += 1
      }
      val t = it + 1L // 1/t decay: the measured stable schedule
      var j = 0
      while (j < buckets) { w(j) -= gw(j) / (n * G * t); j += 1 }
      b -= gb / (n * t)
      // fail-fast BIGINT envelope (the VoptHist rule): |w|·Σxq ≤ B·G·G
      // per doc, so cap |w| where the dot product stays well in Long
      require(math.abs(b) <= 100L * G &&
        w.forall(x => math.abs(x) <= 100L * G),
        s"grid weights left the ±100-unit envelope at iter $it")
      it += 1
    }
    GridModel(buckets, b, w.toSeq)
  }

  /** Integer margin column under a frozen grid model — the SAME
    * quantize-once chain the trainer uses, as scan-stage Spark
    * expressions: per doc, xq_j from the (bucket, cnt, len) aggregate,
    * m = bias + (Σ w_j·xq_j) div 10⁶. Returns the ≤4-row confusion of
    * `labelCol` vs m > 0. Docs with zero tokens score bias alone. */
  def gridConfusion(docs: DataFrame, textCol: String, idCol: String,
      labelCol: Column, model: GridModel): DataFrame = {
    val w = typedLit(model.weightsMicro)
    val base = docs.select(col(idCol).as("did"),
      labelCol.cast("long").as("actual"),
      NaiveBayes.hashedFeatures(col(textCol), model.buckets).as("f"))
    val cnt = base
      .select(col("did"), explode(col("f")).as("j"))
      .groupBy(col("did"), col("j")).agg(count(lit(1)).as("cnt"))
    val len = cnt.groupBy(col("did")).agg(sum(col("cnt")).as("len"))
    val m = cnt.join(len, Seq("did"))
      .withColumn("xq",
        expr(s"cnt * ${model.buckets}L * 1000000L div len"))
      .withColumn("wx", element_at(w, col("j").cast("int") + 1) * col("xq"))
      .groupBy(col("did"))
      .agg((lit(model.biasMicro) +
        expr("sum(wx) div 1000000L")).as("m"))
    base.select(col("did"), col("actual"))
      .join(m, Seq("did"), "left")
      .select(col("actual"),
        (coalesce(col("m"), lit(model.biasMicro)) > 0)
          .cast("long").as("pred"))
      .groupBy(col("actual"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("actual"), col("pred"))
  }
}
