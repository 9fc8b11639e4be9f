package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diversity-aware coreset selection — k-center greedy (Gonzalez's
  * 2-approximation for the k-center objective): pick the point
  * farthest from the chosen set, repeat. Dedup removes REDUNDANCY;
  * this curates COVERAGE — the k exemplars that span the embedding
  * space, the standard recipe for "pick a diverse 1M-doc subset of
  * this 10B-doc corpus" and for seeding labeling/eval sets.
  *
  * Spark shape (the ivfCentroids recipe): the greedy loop is
  * inherently sequential, so it runs DRIVER-SIDE over a BOUNDED
  * deterministic sample (TakeOrdered by (xxhash64(id), id) — megabytes
  * regardless of corpus size; Gonzalez on a uniform sample is the
  * published scalable form), and the corpus is touched by exactly ONE
  * distributed pass that assigns every row to its nearest center
  * (broadcast centers, native cosine kernel, argmax over a literal
  * array — zero shuffles before the tiny per-center rollup).
  */
object Coreset {

  /** Greedy k-center selection over cosine distance (1 − cos).
    * Returns the selected (id, vector) pairs in selection order —
    * deterministic: fixed sample, fixed first seed (smallest sampled
    * id), ties on distance broken by smaller id. */
  def selectKCenters(df: DataFrame, vecCol: String, idCol: String, k: Int,
      maxSample: Int = 1 << 14): Array[(Long, Array[Double])] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k >= 1, s"k $k")
    val sample: Array[(Long, Array[Double])] = df
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(maxSample)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    require(sample.nonEmpty, "empty sample")
    val norms = sample.map { case (_, v) => math.sqrt(v.map(x => x * x).sum) }
    def cosDist(i: Int, c: Array[Double], cn: Double): Double = {
      val v = sample(i)._2
      var d = 0.0
      var j = 0
      while (j < v.length) { d += v(j) * c(j); j += 1 }
      if (norms(i) == 0 || cn == 0) 1.0 else 1.0 - d / (norms(i) * cn)
    }
    // seed: the smallest sampled id (not sample order — stable even if
    // the sample's internal order changed)
    val seedIdx = sample.indices.minBy(sample(_)._1)
    val chosen = scala.collection.mutable.ArrayBuffer(seedIdx)
    val minDist = Array.tabulate(sample.length)(
      cosDist(_, sample(seedIdx)._2, norms(seedIdx)))
    while (chosen.length < math.min(k, sample.length)) {
      var best = -1
      var bestD = Double.NegativeInfinity
      var i = 0
      while (i < sample.length) {
        val d = minDist(i)
        if (d > bestD || (d == bestD && best >= 0 &&
            sample(i)._1 < sample(best)._1)) { bestD = d; best = i }
        i += 1
      }
      chosen += best
      val (_, cv) = sample(best)
      val cn = norms(best)
      i = 0
      while (i < sample.length) {
        val d = cosDist(i, cv, cn)
        if (d < minDist(i)) minDist(i) = d
        i += 1
      }
    }
    chosen.map(sample(_)).toArray
  }

  /** ONE distributed pass: assign every corpus row to its nearest
    * selected center (cosine), returning the corpus + (`center_id`,
    * `center_sim`). Centers ride the plan as a literal struct array
    * (k × dim doubles — the literal-lookup-table rule); scoring goes
    * through the native cosine kernel, the argmax is an array_max
    * over structs. No shuffle at all. */
  def assign(df: DataFrame, vecCol: String, idCol: String,
      centers: Array[(Long, Array[Double])]): DataFrame = {
    val lit_ = typedLit(centers.map { case (id, v) => (id, v.toSeq) }.toSeq)
    val spark = df.sparkSession
    df.withColumn("__cents", lit_)
      .withColumn("__scored", transform(col("__cents"), c =>
        struct(Similarity.ncos(df, col(vecCol), c.getField("_2")).as("s"),
          c.getField("_1").as("cid"))))
      .withColumn("center_sim",
        round(array_max(col("__scored")).getField("s"), 4))
      .withColumn("center_id", array_max(col("__scored")).getField("cid"))
      .drop("__cents", "__scored")
  }

  /** Coreset summary: per center, how much of the corpus it covers
    * and the coverage radius (worst within-cell similarity, basis
    * points — integers, stable to compare). */
  def summary(df: DataFrame, vecCol: String, idCol: String,
      k: Int): DataFrame = {
    val centers = selectKCenters(df, vecCol, idCol, k)
    assign(df, vecCol, idCol, centers)
      .groupBy(col("center_id"))
      .agg(count(lit(1)).as("n_assigned"),
        (min(col("center_sim")) * 10000).cast("long").as("min_sim_bp"))
      .orderBy(asc("center_id"))
  }

  /** ORACLE tier: Gonzalez k-center greedy on the INTEGER GRID — the
    * [[GridKmeans]] recipe applied to the coreset. Float cosine
    * k-center ([[selectKCenters]]) is honestly non-oracle-izable
    * (per-step float min/argmax chains diverge on evaluation shape);
    * this twin moves every comparison onto exact integers:
    *
    *   - vectors quantize once to `floor(x·10⁶)`
    *     ([[GridKmeans.quantize]]);
    *   - distance is the integer SQUARED EUCLIDEAN (no norms — the
    *     whole selection is integer arithmetic; ≤ 64·(2·10⁶)² ≈ 2.6e14
    *     per pair, far inside BIGINT);
    *   - sample = the md5-rank-smallest `maxTrain` rows (replayable,
    *     unlike xxhash64), seed = smallest sampled id, argmax ties to
    *     the smaller id — all mirrored by the unrolled SQL layers.
    *
    * Returns the centers in selection order with the distance that
    * selected them (the seed's is 0). The float path stays the
    * production default; this tier is the correctness-auditable one. */
  def selectKCentersGrid(df: DataFrame, vecCol: String, idCol: String,
      k: Int, maxTrain: Int = 64): Array[(Long, Array[Long], Long)] = {
    require(k >= 1, s"k $k")
    val sample = GridKmeans.collectSample(df, vecCol, idCol, maxTrain)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var d = 0L
      var i = 0
      while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
      d
    }
    val seedIdx = sample.indices.minBy(sample(_)._1)
    val isChosen = new Array[Boolean](sample.length)
    isChosen(seedIdx) = true
    val chosen = scala.collection.mutable.ArrayBuffer((seedIdx, 0L))
    val minDist = Array.tabulate(sample.length)(
      i => d2(sample(i)._2, sample(seedIdx)._2))
    while (chosen.length < math.min(k, sample.length)) {
      var best = -1
      var i = 0
      while (i < sample.length) {
        if (!isChosen(i) && (best < 0 || minDist(i) > minDist(best) ||
            (minDist(i) == minDist(best) &&
              sample(i)._1 < sample(best)._1))) best = i
        i += 1
      }
      chosen += ((best, minDist(best)))
      isChosen(best) = true
      val cv = sample(best)._2
      i = 0
      while (i < sample.length) {
        val d = d2(sample(i)._2, cv)
        if (d < minDist(i)) minDist(i) = d
        i += 1
      }
    }
    chosen.map { case (i, d) => (sample(i)._1, sample(i)._2, d) }.toArray
  }

  /** Grid-coreset report — selection + ONE distributed pass: every
    * corpus row assigns to its nearest selected center (integer
    * squared distance, ties to the EARLIER selection rank, packed as
    * `dist·k + rank` so one `least` carries both keys), then per
    * center: population and the k-center coverage radius `max_dist` —
    * every output cell an exact integer. Centers ride the plan as
    * literals (k·dim longs); no shuffle before the k-row rollup.
    * Output: (rk, vec_id, sel_dist, n_assigned, max_dist). */
  def gridReport(df: DataFrame, vecCol: String, idCol: String, k: Int,
      maxTrain: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val centers = selectKCentersGrid(df, vecCol, idCol, k, maxTrain)
    val kk = centers.length
    val packed: Seq[Column] = centers.zipWithIndex.toSeq.map {
      case ((_, cv, _), r) =>
        aggregate(
          zip_with(col("__qv"), typedLit(cv.toSeq),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x) * lit(kk.toLong) + lit(r.toLong)
    }
    val assigned = df
      .withColumn("__qv", GridKmeans.quantize(col(vecCol)))
      .withColumn("__p", least(packed: _*))
      .select((pmod(col("__p"), lit(kk.toLong)) + lit(1L)).as("rk"),
        expr(s"__p DIV ${kk}L").as("dist"))
    val perCenter = assigned.groupBy(col("rk"))
      .agg(count(lit(1)).as("n_assigned"), max(col("dist")).as("max_dist"))
    val sel = centers.zipWithIndex.map { case ((id, _, d), r) =>
      (r + 1L, id, d)
    }.toSeq.toDF("rk", "vec_id", "sel_dist")
    sel.join(perCenter, Seq("rk"), "left")
      .select(col("rk"), col("vec_id"), col("sel_dist"),
        coalesce(col("n_assigned"), lit(0L)).as("n_assigned"),
        col("max_dist"))
      .orderBy(asc("rk"))
  }
}
