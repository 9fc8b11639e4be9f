package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {

  private val d = 16
  private val n = 300

  /** Deterministic corpus with strong low-rank structure: 3 latent
    * factors mixed into d dims plus small noise — the spectrum should
    * show 3 dominant eigenvalues. */
  private lazy val vecs = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val factors = Array.fill(3, d)(rnd.nextGaussian())
    (0 until n).map { i =>
      val w = Array.fill(3)(rnd.nextGaussian() * 3.0)
      val noise = Array.fill(d)(rnd.nextGaussian() * 0.1)
      val v = Array.tabulate(d)(j =>
        (0 until 3).map(f => w(f) * factors(f)(j)).sum + noise(j) + 0.5)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("eigSym reconstructs the matrix; eigenvectors orthonormal") {
    val mean = Pca.meanOf(vecs, "embedding")
    val (_, cov) = Pca.covariance(vecs, "embedding", mean)
    val (vals, vs) = Pca.eigSym(cov)
    // A = Σ λ_r v_r v_rᵀ
    for (i <- 0 until d; j <- 0 until d) {
      val rec = (0 until d).map(r => vals(r) * vs(r)(i) * vs(r)(j)).sum
      assert(math.abs(rec - cov(i)(j)) < 1e-8, s"($i,$j): $rec vs ${cov(i)(j)}")
    }
    for (r <- 0 until d; s2 <- r until d) {
      val dot = (0 until d).map(i => vs(r)(i) * vs(s2)(i)).sum
      val want = if (r == s2) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"vec $r · vec $s2 = $dot")
    }
  }

  test("spectrum: 3 dominant components; projection variances match eigenvalues") {
    val model = Pca.fit(vecs, "embedding", k = 5)
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // factors dominate noise by construction
    assert(model.eigenvalues(2) > 10 * model.eigenvalues(3),
      model.eigenvalues.take(5).mkString(","))
    // variance of the r-th UNwhitened projected coordinate = λ_r
    val proj = vecs.select(
        Pca.projectCol(vecs, "embedding", model, whiten = false).as("y"))
      .collect().map(_.getSeq[Double](0).toArray)
    for (r <- 0 until 5) {
      val ys = proj.map(_(r))
      val mu = ys.sum / ys.length
      val v = ys.map(y => (y - mu) * (y - mu)).sum / ys.length
      assert(math.abs(v - model.eigenvalues(r)) < 1e-4 * math.max(1.0, model.eigenvalues(r)),
        s"component $r: var $v vs λ ${model.eigenvalues(r)}")
    }
    // whitened: every coordinate has ~unit variance
    val white = vecs.select(
        Pca.projectCol(vecs, "embedding", model, whiten = true).as("y"))
      .collect().map(_.getSeq[Double](0).toArray)
    for (r <- 0 until 5) {
      val ys = white.map(_(r))
      val mu = ys.sum / ys.length
      val v = ys.map(y => (y - mu) * (y - mu)).sum / ys.length
      assert(math.abs(v - 1.0) < 1e-6, s"whitened component $r var $v")
    }
  }

  test("native kernel is bit-identical to the declarative mat-vec") {
    val model = Pca.fit(vecs, "embedding", k = 4)
    val meanLit = typedLit(model.mean.toSeq)
    val matLit = typedLit(model.matrix(whiten = true).toSeq)
    val dd = model.mean.length
    // same sequential accumulation order as the kernel: for output r,
    // fold i = 0..d-1 of (x_i − μ_i)·M[r·d+i]
    val declarative = transform(sequence(lit(0), lit(3)), r =>
      aggregate(sequence(lit(0), lit(dd - 1)), lit(0.0), (acc, i) =>
        acc + (element_at(col("embedding").cast("array<double>"), (i + 1).cast("int")) -
          element_at(meanLit, (i + 1).cast("int"))) *
          element_at(matLit, (r * dd + i + 1).cast("int"))))
    val both = vecs.select(
        Pca.projectCol(vecs, "embedding", model, whiten = true).as("kernel"),
        declarative.as("decl"))
      .collect()
    both.foreach { row =>
      val k = row.getSeq[Double](0)
      val de = row.getSeq[Double](1)
      assert(k == de, s"kernel $k vs declarative $de")
    }
  }

  test("grid power iteration recovers the Jacobi leading axis") {
    // 24 iterations for the MATH check: the fixture's lambda2/lambda1
    // gap converges as (lambda2/lambda1)^iters (the declared query's 8
    // iterations are oracle-exact by replay regardless of convergence)
    val axis = Pca.gridLeadingAxis(vecs, "embedding", dBlock = d,
      iters = 24).collect()
    assert(axis.map(_.getLong(0)).toSeq == (1L to d.toLong))
    val v = axis.map(_.getLong(1).toDouble)
    // against the float eigensolver: |cos(grid axis, top eigenvector)|
    // must be ~1 on a strongly low-rank spectrum (sign is fixed by the
    // grid tier's all-ones start, so compare up to sign)
    val model = Pca.fit(vecs, "embedding", k = 3)
    val top = model.components(0)
    val dot = v.zip(top).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(v.map(x => x * x).sum) *
        math.sqrt(top.map(x => x * x).sum))
    assert(cos > 0.999, s"cos(grid, jacobi) = $cos")
    // the Rayleigh eigenvalue matches the Jacobi one on the grid
    // scale: lambda_grid ~ n * lambda_float * 1e12 / (n-1 factor
    // depending on normalization) — compare as a ratio
    val lamGrid = axis.head.getLong(2).toDouble
    val lamFloat = model.eigenvalues(0)
    val ratio = lamGrid / (lamFloat * 1e12)
    assert(ratio > 0.5 && ratio < 2.0 * n,
      s"eigenvalue scales disagree: $ratio")
    // deterministic: a re-run returns identical integers
    val again = Pca.gridLeadingAxis(vecs, "embedding", dBlock = d,
      iters = 24).collect()
    assert(axis.map(_.getLong(1)).sameElements(again.map(_.getLong(1))))
  }
}
