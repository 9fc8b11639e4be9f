package graft.similarity

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization — the embedding-COMPRESSION scale path for
  * similarity search (the faiss IVF-PQ recipe's PQ half). Each vector
  * splits into `m` subvectors; each subvector quantizes to one of
  * `ksub` learned centroids; a vector becomes `m` small codes
  * (m bytes at ksub ≤ 256). At 10⁹ × dim-64 float32 vectors that is
  * 256 GB → 8 GB: the probe side of an ANN system fits in RAM where
  * the raw embeddings could not.
  *
  * Shapes, mirroring [[Similarity.ivfCentroids]]'s at-scale recipe:
  *
  *   - TRAIN: bounded deterministic sample → driver-side Lloyd
  *     iterations per subspace (m independent small k-means problems;
  *     megabytes, corpus-size independent).
  *   - ENCODE: ONE distributed pass; the per-row argmin runs in the
  *     native codegen'd kernel ([[graft.functions.PqKernels]]), the
  *     codebook rides along as a literal array (m·ksub·subDim doubles
  *     ≈ 8 KB — plan-shipped like a broadcast).
  *   - SEARCH (ADC): the query builds an m×ksub lookup table of
  *     subspace distances ONCE (driver-side, microseconds); every
  *     encoded vector scores with m table lookups — no per-pair
  *     floating-point dot products at all — and top-k compiles to
  *     TakeOrderedAndProject.
  *
  * All vectors are L2-normalized inside the kernels, so ADC's squared
  * L2 is a monotone transform of cosine (‖a−b‖² = 2 − 2cos on the unit
  * sphere): rankings are comparable to the exact-cosine baseline, and
  * the spec asserts recall against it.
  */
object Pq {

  /** Flattened codebooks: centroid (s, c) occupies
    * [(s·ksub + c)·subDim, …+subDim). */
  final case class PqModel(m: Int, subDim: Int, ksub: Int,
      codebooks: Array[Double]) {
    def dim: Int = m * subDim

    /** ADC lookup table for one query: lut[s·ksub + c] = ‖q_s/‖q‖ −
      * centroid_{s,c}‖². */
    def lutFor(q: Array[Double]): Array[Double] = {
      require(q.length == dim, s"query dim ${q.length} != $dim")
      val nrm = math.sqrt(q.map(x => x * x).sum)
      val inv = if (nrm == 0.0) 1.0 else 1.0 / nrm
      val lut = new Array[Double](m * ksub)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < ksub) {
          val off = (s * ksub + c) * subDim
          var d = 0.0
          var j = 0
          while (j < subDim) {
            val diff = q(s * subDim + j) * inv - codebooks(off + j)
            d += diff * diff
            j += 1
          }
          lut(s * ksub + c) = d
          c += 1
        }
        s += 1
      }
      lut
    }
  }

  /** Train per-subspace codebooks on a bounded deterministic sample
    * (hash-ordered TakeOrderedAndProject, like ivfCentroids). Lloyd
    * with L2 over NORMALIZED subvectors; seeding = the first ksub
    * sample subvectors by id; empty clusters keep their previous
    * centroid; assignment ties take the lower code (matching the
    * encode kernel). */
  def train(corpus: DataFrame, vecCol: String, idCol: String,
      m: Int = 8, ksub: Int = 16, iters: Int = 10,
      maxTrain: Int = 1 << 16): PqModel = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[(Long, Array[Double])] = corpus
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(maxTrain)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    require(sample.nonEmpty, "empty PQ training sample")
    val dim = sample(0)._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val train: Array[Array[Double]] = sample.map { case (_, v) =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      if (nrm == 0.0) v else v.map(_ / nrm)
    }
    val seedOrder = sample.map(_._1).zipWithIndex.sortBy(_._1).map(_._2)
    val codebooks = new Array[Double](m * ksub * subDim)
    var s = 0
    while (s < m) {
      // seed: first ksub subvectors in id order
      var cents: Array[Array[Double]] = Array.tabulate(ksub) { c =>
        val row = train(seedOrder(c % train.length))
        java.util.Arrays.copyOfRange(row, s * subDim, (s + 1) * subDim)
      }
      for (_ <- 1 to iters) {
        val sums = Array.fill(ksub)(new Array[Double](subDim))
        val counts = new Array[Long](ksub)
        var r = 0
        while (r < train.length) {
          val v = train(r)
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            var d = 0.0
            var j = 0
            while (j < subDim) {
              val diff = v(s * subDim + j) - cents(c)(j)
              d += diff * diff
              j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          val acc = sums(best)
          var j = 0
          while (j < subDim) { acc(j) += v(s * subDim + j); j += 1 }
          counts(best) += 1
          r += 1
        }
        cents = cents.zipWithIndex.map { case (prev, c) =>
          if (counts(c) == 0) prev else sums(c).map(_ / counts(c))
        }
      }
      var c = 0
      while (c < ksub) {
        System.arraycopy(cents(c), 0, codebooks,
          (s * ksub + c) * subDim, subDim)
        c += 1
      }
      s += 1
    }
    PqModel(m, subDim, ksub, codebooks)
  }

  /** ONE distributed encode pass: (id, codes ARRAY<INT> length m). */
  def encode(corpus: DataFrame, vecCol: String, idCol: String,
      model: PqModel): DataFrame =
    corpus.select(col(idCol),
      graft.functions.PqExprs.pqEncode(corpus.sparkSession, col(vecCol),
        typedLit(model.codebooks.toSeq), model.m, model.ksub).as("codes"))

  /** ADC top-k for one query vector over the encoded corpus:
    * (id, approx_cos, rk). approx_cos = 1 − d²/2 (unit sphere). */
  def adcTopK(encoded: DataFrame, idCol: String, model: PqModel,
      query: Array[Double], k: Int): DataFrame = {
    val lut = model.lutFor(query)
    val spark = encoded.sparkSession
    encoded.select(col(idCol),
      round(lit(1.0) - graft.functions.PqExprs.pqAdc(spark, col("codes"),
        typedLit(lut.toSeq), model.ksub) / 2.0, 4).as("approx_cos"))
      .orderBy(desc("approx_cos"), asc(idCol))
      .limit(k)
  }

  /** The production shape (faiss "refine"): ADC overfetches
    * k·overfetch candidates from the compressed codes, then ONLY those
    * candidates re-score exactly against their original vectors. The
    * corpus-wide scan touches codes (m ints/row); full-precision
    * embeddings are read for k·overfetch rows — a broadcast-join-sized
    * set — so quantization error only costs recall when the true
    * neighbor falls outside the overfetched pool. Default overfetch 8:
    * on near-uniform synthetic data (pair cosines ~0.5-0.6, the worst
    * case for ADC margins) k·4 measurably leaks top-k entries (recall
    * 0.70 on one data draw), k·8 restores headroom, and the refine
    * cost stays a k·overfetch-row broadcast join either way. */
  def adcTopKRefined(encoded: DataFrame, corpus: DataFrame, vecCol: String,
      idCol: String, model: PqModel, query: Array[Double], k: Int,
      overfetch: Int = 8): DataFrame = {
    val cand = adcTopK(encoded, idCol, model, query, k * overfetch)
      .select(col(idCol))
    corpus.join(broadcast(cand), Seq(idCol))
      .withColumn("score", round(graft.functions.CosineSimExpr.cosineSim(
        corpus.sparkSession, col(vecCol), typedLit(query.toSeq)), 4))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), asc(idCol))
      .limit(k)
  }
}
