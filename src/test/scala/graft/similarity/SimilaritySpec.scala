package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  /** 3 well-separated clusters of 20 vectors each in R^8. */
  private lazy val corpus = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Seq(
      Array(10f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 0f, 0f))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 20
    } yield ((ci * 20 + i).toLong,
      c.map(v => v + rnd.nextFloat() - 0.5f), ci)
    rows.toDF("vec_id", "embedding", "cluster")
  }

  test("brute-force topK returns same-cluster neighbors, ordered") {
    val q = corpus.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val top = Similarity.topK(corpus.where(col("vec_id") =!= 0),
      "embedding", "vec_id", q, 5).collect()
    assert(top.length == 5)
    assert(top.forall(_.getLong(0) < 20), "neighbors must be cluster 0")
    val scores = top.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("knnJoin ranks per query") {
    val qs = corpus.where(col("vec_id").isin(0L, 20L, 40L))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val res = Similarity.knnJoin(corpus, "embedding", "vec_id", qs, "qe", "qid", 3)
    // Scale guard: ranking must go through the bounded-heap aggregate,
    // never a per-query window (|queries| reducer partitions = skew).
    val windows = res.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, s"knnJoin plan must not contain a Window: $windows")
    val byQuery = res.collect().groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 20L, 40L))
    byQuery.foreach { case (qid, rows) =>
      assert(rows.length == 3)
      val cluster = qid / 20
      assert(rows.forall(_.getLong(1) / 20 == cluster),
        s"query $qid got cross-cluster neighbor")
    }
  }

  test("ivfKnnJoin: nprobe=all equals exact knnJoin; partial probe keeps recall") {
    val qs = corpus.where(col("vec_id").isin(0L, 20L, 40L))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cents = Similarity.ivfCentroids(corpus, "embedding", "vec_id", 6)
    val assigned = Similarity.ivfAssign(corpus, "embedding", "vec_id", cents)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    // probing every cell is exhaustive: must match the exact join
    val exact = rows(Similarity.knnJoin(corpus, "embedding", "vec_id", qs, "qe", "qid", 3))
    val all = rows(Similarity.ivfKnnJoin(assigned, "embedding", "vec_id",
      qs, "qe", "qid", cents, k = 3, nprobe = 6))
    assert(all == exact, s"nprobe=all diverged: $all vs $exact")

    // partial probe on clustered vectors: with 6 cells over 3
    // clusters a cluster spans ~2 cells, so nprobe=3 covers the
    // query's own cluster and recall stays near-total (nprobe=2
    // measured 7/9 — one cluster straddles a cell boundary)
    val part = rows(Similarity.ivfKnnJoin(assigned, "embedding", "vec_id",
      qs, "qe", "qid", cents, k = 3, nprobe = 3))
    assert(part.map(t => (t._1, t._2)).intersect(exact.map(t => (t._1, t._2))).size >= 8,
      s"nprobe=3 recall too low: $part vs $exact")

    // scale guards: no window ranking, and no shuffle of the assigned
    // corpus (both TopK heaps shuffle only per-query candidate heads;
    // the candidate join must be broadcast)
    val plan = Similarity.ivfKnnJoin(assigned, "embedding", "vec_id",
      qs, "qe", "qid", cents, k = 3, nprobe = 2)
    val windows = plan.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, "ivfKnnJoin must not rank via a window")
  }

  test("RP-LSH near-dups: full recall in its operating envelope (cos ≥ ~0.99)") {
    // RP-LSH + pigeonhole targets NEAR-IDENTICAL vectors: at cosine c
    // each bit flips with prob arccos(c)/π, so hamming ≤ 3 of 64 needs
    // c ≈ 0.99+. Plant such pairs: 15 bases, each with a tiny-noise
    // twin; unrelated bases are well separated.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val bases = (0 until 15).map(_ => Array.fill(16)(rnd.nextFloat() - 0.5f))
    val rows = bases.zipWithIndex.flatMap { case (b, i) =>
      Seq((i.toLong, b),
        (100L + i, b.map(v => v + (rnd.nextFloat() - 0.5f) * 0.01f)))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDups(corpus, "embedding", "vec_id", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 15, s"fixture should plant 15 pairs, got $exact")
    val approx = Similarity.rpLshNearDups(corpus, "embedding", "vec_id", 0.99,
      maxBitDiff = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.subsetOf(exact), "verification must kill false positives")
    assert(approx == exact, s"missed: ${exact -- approx}")
  }

  test("int8 quantization: bounded element error, near-perfect cosine") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(32)(rnd.nextFloat() * 6 - 3))).toDF("id", "v")
    val qz = Similarity.quantizeInt8(col("v"))
    val rows = vecs.select(col("id"), col("v"), qz.as("qz"),
      Similarity.dequantize(qz).as("dv")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val scale = r.getStruct(2).getDouble(0)
      val qs = r.getStruct(2).getSeq[Int](1)
      val dv = r.getSeq[Double](3)
      assert(qs.forall(q => q >= -127 && q <= 127), s"q out of range: $qs")
      v.zip(dv).foreach { case (x, d) =>
        assert(math.abs(x - d) <= scale / 2 + 1e-9,
          s"elem error ${math.abs(x - d)} > scale/2 ${scale / 2}")
      }
    }
    // recon cosine stays ≈ 1 (this is why int8 is safe for cosine work)
    val cos = vecs.select(
      graft.functions.CosineSimExpr.cosineSim(spark, col("v"),
        Similarity.dequantize(qz))).collect().map(_.getDouble(0))
    assert(cos.forall(_ > 0.9995), s"min recon cos ${cos.min}")
  }

  test("native RP-LSH signature is bit-identical to the declarative form") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.fill(16 + i % 5)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("vec_id", "embedding")
    val both = df.select(col("vec_id"),
      Similarity.rpLshSignature(col("embedding")).as("decl"),
      graft.functions.RpLshSigExpr.rpLshSig(spark, col("embedding")).as("native"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"vec ${r.getLong(0)}: decl=${r.getLong(1).toBinaryString} " +
          s"native=${r.getLong(2).toBinaryString}")
    }
  }

  test("IVF with enough probes matches brute force; fewer probes scan less") {
    val cents = Similarity.ivfCentroids(corpus, "embedding", "vec_id", 6)
    val assigned = Similarity.ivfAssign(corpus, "embedding", "vec_id", cents)
    assert(assigned.count() == 60)
    val q = corpus.where(col("vec_id") === 5).select(col("embedding").as("qvec"))
    val brute = Similarity.topK(corpus, "embedding", "vec_id", q, 5)
      .collect().map(_.getLong(0)).toSeq
    val ivfAll = Similarity.ivfTopK(assigned, "embedding", "vec_id", q, 5, cents,
      nprobe = 6).collect().map(_.getLong(0)).toSeq
    assert(ivfAll == brute, "nprobe=all must equal brute force")

    // k-means centroids + a PARTIAL probe: recall stays high because
    // the Lloyd iterations pull cells onto the true clusters, so the
    // query's top cells cover its whole cluster.
    val ivf2 = Similarity.ivfTopK(assigned, "embedding", "vec_id", q, 5, cents,
      nprobe = 2).collect().map(_.getLong(0)).toSet
    assert(brute.toSet.intersect(ivf2).size >= 4,
      s"nprobe=2 recall too low: $ivf2 vs $brute")

    // Sampled training (the at-scale quantizer recipe): centroids from
    // a 50% hash sample still index the full corpus — nprobe=all stays
    // exact because probing everything is brute force regardless of
    // centroid quality.
    val centsS = Similarity.ivfCentroids(corpus, "embedding", "vec_id", 6,
      trainPct = 50)
    val assignedS = Similarity.ivfAssign(corpus, "embedding", "vec_id", centsS)
    assert(assignedS.count() == 60)
    val ivfS = Similarity.ivfTopK(assignedS, "embedding", "vec_id", q, 5,
      centsS, nprobe = 6).collect().map(_.getLong(0)).toSeq
    assert(ivfS == brute, "sampled-training nprobe=all must equal brute force")

    // With one representative centroid per cluster, probing the single
    // nearest cell recovers the exact answer (brute's top-5 are all
    // cluster-0): the recall/nprobe tradeoff working as designed.
    val goodCents = corpus.where(col("vec_id").isin(0L, 20L, 40L))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val goodAssigned = Similarity.ivfAssign(corpus, "embedding", "vec_id", goodCents)
    val ivf1 = Similarity.ivfTopK(goodAssigned, "embedding", "vec_id", q, 5,
      goodCents, nprobe = 1).collect().map(_.getLong(0)).toSeq
    assert(ivf1 == brute, "nprobe=1 with per-cluster centroids must match")
    // and the probed fraction really is one cell, not the corpus
    assert(goodAssigned.where(col("centroid_id") === 0L).count() == 20)
  }

  test("meanVector is the exact elementwise mean, rounded to 6") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 3.0f)),
      (2L, Seq(3.0f, 1.0f, 0.0f)),
      (3L, Seq(2.0f, 2.0f, 0.3f))).toDF("vec_id", "embedding")
    val mean = Similarity.meanVector(df, "embedding")
      .collect()(0).getSeq[Double](0)
    assert(mean == Seq(2.0, 1.0, 1.1))
  }

  test("outliers rank the vector farthest from the corpus mean first") {
    val s = spark
    import s.implicits._
    // 20 vectors clustered around (1, 1, 0); one pointing the other way
    val base = (1L to 20L).map { i =>
      (i, Seq(1.0f + (i % 3) * 0.01f, 1.0f - (i % 5) * 0.01f, 0.0f))
    }
    val df = (base :+ ((99L, Seq(-1.0f, -1.0f, 0.5f)))).toDF("vec_id", "embedding")
    val got = Similarity.outliers(df, "embedding", "vec_id", 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 == 99L, s"expected 99 first, got ${got.toSeq}")
    assert(got.head._2 < 0, "opposite vector must score negative")
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
  }

  test("truncation recall: full width is exactly 10000 bp") {
    val qs = corpus.where(col("vec_id").isin(0L, 20L, 40L))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val out = Similarity.truncationRecall(corpus, "embedding", "vec_id",
      qs, "qe", "qid", k = 5, dims = Seq(8))
      .collect().head
    assert(out.getAs[Long]("recall_bp") === 10000L)
  }

  test("truncation recall: signal-prefix vectors lose nothing; noise-prefix loses a lot") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    // all discriminative signal in dims 1-4; dims 5-8 are pure noise
    val rows = (0 until 60).map { i =>
      val sig = Array.tabulate(4)(d =>
        if (d == i % 3) 10f + rnd.nextFloat() else rnd.nextFloat())
      val noise = Array.fill(4)(rnd.nextFloat() * 0.01f)
      (i.toLong, sig ++ noise)
    }
    val df = rows.toDF("vec_id", "embedding")
    val qs = df.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val r = Similarity.truncationRecall(df, "embedding", "vec_id",
      qs, "qe", "qid", k = 5, dims = Seq(4))
      .collect().head.getAs[Long]("recall_bp")
    // near-zero noise in the dropped dims barely perturbs the scores,
    // but round(·, 4) ties can reorder the tail: allow one swap
    assert(r >= 8000L, s"signal-prefix recall $r")
    // inverted layout: signal lives in the LAST 4 dims; truncating to
    // the first 4 keeps only noise → recall must collapse
    val inv = rows.map { case (id, v) => (id, v.drop(4) ++ v.take(4)) }
      .toDF("vec_id", "embedding")
    val qInv = inv.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val rInv = Similarity.truncationRecall(inv, "embedding", "vec_id",
      qInv, "qe", "qid", k = 5, dims = Seq(4))
      .collect().head.getAs[Long]("recall_bp")
    assert(rInv < r, s"noise-prefix recall $rInv should trail $r")
  }

  test("ivfRecallSweep: monotone nondecreasing; exhaustive probe = 10000 bp") {
    val cents = Similarity.ivfCentroids(corpus, "embedding", "vec_id", 6)
    val assigned = Similarity.ivfAssign(corpus, "embedding", "vec_id", cents)
    val qs = corpus.where(col("vec_id").isin(0L, 20L, 40L))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val sweep = Similarity.ivfRecallSweep(assigned, "embedding", "vec_id",
        qs, "qe", "qid", cents, k = 5, nprobes = Seq(1, 2, 6))
      .collect().map(r => r.getAs[Long]("nprobe") -> r.getAs[Long]("recall_bp"))
    assert(sweep.map(_._1).toSeq === Seq(1L, 2L, 6L))
    val rec = sweep.map(_._2)
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in nprobe: ${rec.toSeq}")
    assert(rec.last === 10000L, "probing every cell is exhaustive")
  }

  test("ivfRecallSweep single-scan widths equal per-width ivfKnnJoin runs") {
    // The sweep scores the index ONCE at the widest probe and derives
    // each width from cell ranks; that is only sound because every
    // width is a prefix of the same strictly-ordered cell list — pin
    // the per-width recall against independent ivfKnnJoin runs.
    val cents = Similarity.ivfCentroids(corpus, "embedding", "vec_id", 6)
    val assigned = Similarity.ivfAssign(corpus, "embedding", "vec_id", cents)
    val qs = corpus.where(col("vec_id").isin(1L, 21L, 41L))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val sweep = Similarity.ivfRecallSweep(assigned, "embedding", "vec_id",
        qs, "qe", "qid", cents, k = 5, nprobes = Seq(1, 2, 3, 6))
      .collect().map(r => r.getAs[Long]("nprobe") -> r.getAs[Long]("recall_bp"))
      .toMap
    val exact = Similarity.knnJoin(assigned, "embedding", "vec_id",
        qs, "qe", "qid", 5)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(1, 2, 3, 6).foreach { np =>
      val approx = Similarity.ivfKnnJoin(assigned, "embedding", "vec_id",
          qs, "qe", "qid", cents, 5, np)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hits = exact.count(approx.contains)
      val want = hits.toLong * 10000L / exact.size
      assert(sweep(np.toLong) === want,
        s"nprobe=$np sweep=${sweep(np.toLong)} independent=$want")
    }
  }
}
