package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA / whitening for embedding columns — the preprocessing step
  * production ANN stacks run before quantization (faiss's OPQ/PCAR
  * transforms): center, rotate onto the principal axes, optionally
  * scale each axis to unit variance. Whitened embeddings give PQ
  * codebooks balanced sub-spaces and make cosine/L2 thresholds
  * comparable across dimensions.
  *
  * Execution shape at 100 TB (the same split as IVF training,
  * similarity/Similarity.scala — distribute the one pass that touches
  * the corpus, keep the O(d²)/O(d³) linear algebra on the driver where
  * it is microscopic):
  *
  *   - mean: ONE posexplode aggregate (d rows cross the wire per
  *     partition), components rounded to 6 decimals so both engines
  *     parse identical doubles (the meanVector parity trick);
  *   - covariance: ONE `treeAggregate` over the corpus — each task
  *     accumulates the upper triangle of Σ(x−μ)(x−μ)ᵀ into a local
  *     d(d+1)/2 buffer (zero allocation per row), merged pairwise in
  *     a tree; the driver receives depth·√partitions buffers of
  *     ~d²/2 doubles (16 KB at d=64), never rows. This is the public
  *     RowMatrix recipe, not a shuffle: no row leaves its partition.
  *   - eigendecomposition: cyclic Jacobi on the d×d symmetric matrix,
  *     driver-side, O(d³) ≈ microseconds at d=64 — distributing it
  *     would be pure overhead;
  *   - projection: one distributed pass through the native
  *     [[graft.functions.PcaProjectExpr]] kernel (codegen'd k·d FMAs
  *     per row, model embedded as a plan reference object).
  */
object Pca {

  /** `components` is k×d, rows orthonormal, ordered by descending
    * eigenvalue; `eigenvalues` are the matching variances. */
  final case class Model(n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]]) {

    /** Row-major projection matrix; whitening folds 1/√λ into each
      * row so the kernel stays a single mat-vec. */
    def matrix(whiten: Boolean): Array[Double] = {
      val d = mean.length
      val out = new Array[Double](components.length * d)
      var r = 0
      while (r < components.length) {
        val s = if (whiten) 1.0 / math.sqrt(math.max(eigenvalues(r), 1e-12)) else 1.0
        var i = 0
        while (i < d) { out(r * d + i) = components(r)(i) * s; i += 1 }
        r += 1
      }
      out
    }
  }

  /** Column mean of `vecCol`, each component rounded to 6 decimals
    * (cross-engine parity; see Similarity.meanVector). One aggregate;
    * the collect is d rows. */
  def meanOf(df: DataFrame, vecCol: String): Array[Double] =
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(round(avg(col("x")), 6).as("m"))
      .orderBy(col("pos")).collect().map(_.getDouble(1))

  /** Population covariance (Σ(x−μ)(x−μ)ᵀ / n) in one treeAggregate
    * pass; only the upper triangle is accumulated and shipped. */
  def covariance(df: DataFrame, vecCol: String,
      mean: Array[Double]): (Long, Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = mean.length
    val tri = d * (d + 1) / 2
    val bcMean = spark.sparkContext.broadcast(mean)
    val rows = df.select(col(vecCol).cast("array<double>")).as[Array[Double]].rdd
    val (cnt, acc) = rows.treeAggregate((0L, new Array[Double](tri)))(
      seqOp = { case ((n, a), x) =>
        val m = bcMean.value
        // centered upper-triangle outer product, row-major packed
        var idx = 0
        var i = 0
        while (i < d) {
          val xi = x(i) - m(i)
          var j = i
          while (j < d) {
            a(idx) += xi * (x(j) - m(j))
            idx += 1
            j += 1
          }
          i += 1
        }
        (n + 1, a)
      },
      combOp = { case ((n1, a1), (n2, a2)) =>
        var i = 0
        while (i < tri) { a1(i) += a2(i); i += 1 }
        (n1 + n2, a1)
      },
      depth = 2)
    val cov = Array.ofDim[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = acc(idx) / math.max(cnt, 1L)
        cov(i)(j) = v
        cov(j)(i) = v
        idx += 1
        j += 1
      }
      i += 1
    }
    (cnt, cov)
  }

  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    val mean = meanOf(df, vecCol)
    val (n, cov) = covariance(df, vecCol, mean)
    val (vals, vecs) = eigSym(cov)
    val order = vals.indices.sortBy(i => -vals(i)).take(k)
    Model(n, mean,
      order.map(vals(_)).toArray,
      order.map(r => vecs(r)).toArray)
  }

  /** Projected (optionally whitened) embedding as a Column — the
    * distributed pass, via the native kernel. */
  def projectCol(df: DataFrame, vecCol: String, model: Model,
      whiten: Boolean): Column =
    graft.functions.PcaProjectExpr.pcaProject(df.sparkSession, col(vecCol),
      model.mean.toSeq, model.matrix(whiten).toSeq)

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors) with eigenvector r (a row of the
    * returned matrix) matching eigenvalue r — unordered; callers sort.
    * Textbook method (Golub & Van Loan §8.5): rotate away the largest
    * off-diagonal entries sweep by sweep; quadratic convergence, and
    * at d ≤ a few hundred the O(d³) total is driver-trivial. */
  private[similarity] def eigSym(
      a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = Array.tabulate(d, d)((i, j) => a(i)(j))
    // v starts as identity; accumulates the rotations COLUMN-wise
    // (column c of v = eigenvector c); transposed on return.
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(m)
    while (sweep < 64 && off > 1e-11) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (math.abs(apq) > 1e-14) {
            val tau = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t =
              if (tau >= 0) 1.0 / (tau + math.sqrt(1.0 + tau * tau))
              else 1.0 / (tau - math.sqrt(1.0 + tau * tau))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var i = 0
            while (i < d) {
              val mip = m(i)(p); val miq = m(i)(q)
              m(i)(p) = c * mip - s * miq
              m(i)(q) = s * mip + c * miq
              i += 1
            }
            i = 0
            while (i < d) {
              val mpi = m(p)(i); val mqi = m(q)(i)
              m(p)(i) = c * mpi - s * mqi
              m(q)(i) = s * mpi + c * mqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(m)
      sweep += 1
    }
    val vals = Array.tabulate(d)(i => m(i)(i))
    val vecs = Array.tabulate(d, d)((r, i) => v(i)(r)) // row r = eigvec r
    (vals, vecs)
  }

  private def offDiag(m: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < m.length) {
      var j = i + 1
      while (j < m.length) { s += m(i)(j) * m(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** ORACLE tier of the eigen step: the LEADING PRINCIPAL AXIS by
    * power iteration on the INTEGER GRID. The Jacobi float eigensolver
    * ([[eigSym]]) is honestly non-oracle-izable (rotation order and
    * float accumulation have no SQL replay); this twin moves the whole
    * chain onto exact integers, where a DuckDB unroll replays it
    * bit-for-bit:
    *
    *   - the leading `dBlock` dims quantize once to `floor(x·10⁶)`
    *     (the GridKmeans floor-once rule);
    *   - the mean is the truncating integer mean `sum div n` (Scala
    *     `Long./` ≡ Spark `div` ≡ DuckDB BIGINT `//`, all toward 0);
    *   - the centered covariance S is ONE distributed
    *     explode-i × explode-j aggregate of exact integer products
    *     (|S_ij| ≤ n·(2·10⁶)² — far inside BIGINT at any n this
    *     oracle tier runs at; the float treeAggregate path is the
    *     production covariance);
    *   - `iters` power steps run driver-side in BigInt (the
    *     d×d mat-vec exceeds 63 bits → HUGEINT/BigInt on both
    *     engines): `w = S·v`, renormalized to the 10⁶ fixed-point grid
    *     by `v' = (w·10⁶) div max|w|` (BigInt `/` truncates toward
    *     zero ≡ HUGEINT `//`, measured); v₀ = all-ones·10⁶ fixes the
    *     sign deterministically (S is PSD, so no sign oscillation);
    *   - the eigenvalue estimate is the integer Rayleigh quotient
    *     `(vᵀSv) div (vᵀv)`.
    *
    * Scale shape: two bounded aggregates touch the corpus (mean,
    * covariance); the iteration is O(iters·d²) driver arithmetic on a
    * d×d matrix. Output: (dim, v_fixed, lambda_fixed), d rows. */
  def gridLeadingAxis(df: DataFrame, vecCol: String, dBlock: Int = 16,
      iters: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qv = transform(
      slice(col(vecCol).cast("array<double>"), 1, dBlock),
      x => floor(x * lit(1000000.0)).cast("long"))
    val base = df.select(qv.as("qv"))
    val r0 = base.agg(count(lit(1)).as("n"),
      (0 until dBlock).map(i =>
        sum(element_at(col("qv"), i + 1)).as(s"s$i")): _*).collect()(0)
    val n = r0.getLong(0)
    require(n >= 1, "empty corpus")
    val mu = Array.tabulate(dBlock)(i => r0.getLong(i + 1) / n)
    val cent = base.select(
      zip_with(col("qv"), typedLit(mu.toSeq), (a, b) => a - b).as("cv"))
    val s = Array.ofDim[Long](dBlock, dBlock)
    cent
      .select(posexplode(col("cv")).as(Seq("i0", "ci")), col("cv"))
      .select(col("i0"), col("ci"),
        posexplode(col("cv")).as(Seq("j0", "cj")))
      .groupBy(col("i0"), col("j0"))
      .agg(sum(col("ci") * col("cj")).as("s"))
      .collect()
      .foreach(r => s(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    var v = Array.fill(dBlock)(BigInt(1000000))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dBlock)(i =>
        (0 until dBlock).map(j => BigInt(s(i)(j)) * v(j)).sum)
      val m = w.map(_.abs).max
      v = if (m == 0) w.map(_ => BigInt(0))
          else w.map(x => (x * 1000000) / m)
    }
    val vv = v.map(x => x * x).sum
    val vSv = (for (i <- 0 until dBlock; j <- 0 until dBlock)
      yield v(i) * BigInt(s(i)(j)) * v(j)).sum
    val lam = if (vv == 0) BigInt(0) else vSv / vv
    (0 until dBlock).map(i => (i + 1L, v(i).toLong, lam.toLong))
      .toDF("dim", "v_fixed", "lambda_fixed")
      .orderBy(asc("dim"))
  }
}
