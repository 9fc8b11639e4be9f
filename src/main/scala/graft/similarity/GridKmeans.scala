package graft.similarity

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Integer-grid k-means — the ORACLE-EXACT twin of
  * [[Similarity.ivfCentroids]]'s float k-means.
  *
  * Float k-means is honestly non-oracle-izable: per-dimension double
  * means diverge across engines on aggregation order alone. This twin
  * moves every step onto an exact integer grid, where BOTH the driver
  * loop and a DuckDB SQL unroll replay bit-for-bit:
  *
  *   - vectors quantize ONCE: `qv_i = floor(x_i · 10⁶)` (the float
  *     widens to double exactly; 10⁶ and the product round identically
  *     in any IEEE engine — the q_dsir/q_mmr_rerank class of
  *     identically-shaped float chains, used once, then integers);
  *   - assignment is argmin of the integer squared Euclidean distance,
  *     ties to the LOWER centroid id — packed as `dist·c + cid` so one
  *     `least`/`arg_min` carries both keys (the q_negative_sample
  *     packing rule);
  *   - the training sample is the md5-rank-smallest `maxTrain` rows
  *     (13-hex prefix: string order == numeric order, ties by id) —
  *     deterministic AND replayable, unlike xxhash64 which the oracle
  *     engine lacks;
  *   - centroid updates are truncating integer means
  *     (`sum div count`): Scala `Long./`, Spark `div` and DuckDB
  *     BIGINT `//` all truncate toward zero, so negative sums agree;
  *     an emptied cluster keeps its previous centroid.
  *
  * Scale shape: identical to ivfCentroids — the loop runs driver-side
  * on a BOUNDED TakeOrdered sample (c·iters·maxTrain·dim integer ops),
  * and the corpus is touched by ONE distributed assignment pass with
  * the centroids riding the plan as literals. The float path stays the
  * production default; this twin is the correctness-auditable tier.
  */
object GridKmeans {

  /** `floor(x·10⁶)` quantization of a float/double vector column. */
  def quantize(vecCol: Column): Column =
    transform(vecCol.cast("array<double>"),
      x => floor(x * lit(1000000.0)).cast("long"))

  /** The md5-rank-bounded quantized training sample — shared by the
    * whole-vector k-means and the per-subspace PQ codebooks
    * ([[GridPq]]), which slice it driver-side instead of re-running
    * the sampling job per subspace. */
  def collectSample(corpus: DataFrame, vecCol: String, idCol: String,
      maxTrain: Int): Array[(Long, Array[Long])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = corpus
      .orderBy(substring(md5(col(idCol).cast("string")), 1, 13),
        col(idCol))
      .limit(maxTrain)
      .select(col(idCol).cast("long"), quantize(col(vecCol)))
      .as[(Long, Array[Long])].collect()
    require(sample.nonEmpty, "empty training sample")
    sample
  }

  /** Train on the md5-rank-bounded sample; returns `c` centroids on
    * the integer grid (index = centroid id). */
  def centroids(corpus: DataFrame, vecCol: String, idCol: String,
      c: Int, iters: Int, maxTrain: Int): Array[Array[Long]] =
    kmeansOnGrid(collectSample(corpus, vecCol, idCol, maxTrain), c, iters)

  /** The driver-side integer k-means core over a pre-collected
    * sample (c·iters·|sample|·dim integer ops). */
  def kmeansOnGrid(sample: Array[(Long, Array[Long])], c: Int,
      iters: Int): Array[Array[Long]] = {
    val train = sample.map(_._2)
    val dim = train(0).length
    // seeds: the c id-smallest sample vectors, centroid id = seed rank
    var cents: Array[Array[Long]] =
      sample.sortBy(_._1).take(c).map(_._2.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(cents.length)(new Array[Long](dim))
      val counts = new Array[Long](cents.length)
      var r = 0
      while (r < train.length) {
        val v = train(r)
        var best = 0L; var bestKey = Long.MaxValue; var ci = 0
        while (ci < cents.length) {
          val cv = cents(ci); var d = 0L; var i = 0
          while (i < dim) { val t = v(i) - cv(i); d += t * t; i += 1 }
          val key = d * cents.length + ci // argmin (dist, cid)
          if (key < bestKey) { bestKey = key; best = ci }
          ci += 1
        }
        val s = sums(best.toInt); var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(best.toInt) += 1
        r += 1
      }
      cents = cents.zipWithIndex.map { case (prev, ci) =>
        if (counts(ci) == 0) prev
        // Long./ truncates toward zero == Spark div == DuckDB BIGINT //
        else sums(ci).map(_ / counts(ci))
      }
    }
    cents
  }

  /** Driver-side quantization of one vector (the query side of a
    * probe — same floor-once grid as [[quantize]]). */
  def quantizeVec(v: Array[Double]): Array[Long] =
    v.map(x => math.floor(x * 1000000.0).toLong)

  /** The `nprobe` nearest centroids to a quantized query — integer
    * squared distance, ties to the lower cell id. Pure driver
    * arithmetic over the bounded centroid array. */
  def probeCells(qv: Array[Long], cents: Array[Array[Long]],
      nprobe: Int): Seq[Long] =
    cents.zipWithIndex.map { case (cv, ci) =>
      var d = 0L; var i = 0
      while (i < qv.length) { val t = qv(i) - cv(i); d += t * t; i += 1 }
      (d, ci.toLong)
    }.sortBy(identity).take(nprobe).map(_._2).toSeq

  /** One distributed pass: nearest grid centroid per corpus row.
    * Centroids ride the plan as literals; the packed `dist·c + cid`
    * argmin makes the tie rule part of the expression. */
  def assign(corpus: DataFrame, vecCol: String, idCol: String,
      cents: Array[Array[Long]]): DataFrame = {
    val qv = quantize(col(vecCol)).as("__qv")
    val k = cents.length
    val packed: Seq[Column] = cents.zipWithIndex.toSeq.map { case (cv, ci) =>
      aggregate(
        zip_with(col("__qv"), typedLit(cv.toSeq),
          (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x) * lit(k.toLong) + lit(ci.toLong)
    }
    corpus.withColumn("__qv", qv)
      .withColumn("centroid_id",
        pmod(least(packed: _*), lit(k.toLong)))
      .drop("__qv")
  }
}
