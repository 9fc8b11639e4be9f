package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization: determinism, kernel-vs-driver arithmetic
  * agreement, and recall against the exact cosine ranking on clustered
  * synthetic vectors (the regime PQ is built for). */
class PqSpec extends SparkSpec {

  private val dim = 64
  private val nClusters = 10
  private val perCluster = 30

  /** Deterministic clustered corpus: cluster centers are unit-ish
    * gaussian draws; members add small noise. */
  private lazy val data: Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    (0 until nClusters * perCluster).map { i =>
      val c = centers(i % nClusters)
      i.toLong -> c.map(_ + 0.15 * rnd.nextGaussian())
    }
  }

  private lazy val vecs = {
    val s = spark
    import s.implicits._
    data.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("encode: deterministic, m codes per row, codes within ksub") {
    val model = Pq.train(vecs, "embedding", "vec_id", m = 8, ksub = 16)
    val a = Pq.encode(vecs, "embedding", "vec_id", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Pq.encode(vecs, "embedding", "vec_id", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
    assert(a.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("ADC kernel output equals driver-side lookup arithmetic") {
    val model = Pq.train(vecs, "embedding", "vec_id", m = 8, ksub = 16)
    val q = data.head._2
    val lut = model.lutFor(q)
    val enc = Pq.encode(vecs, "embedding", "vec_id", model)
    val viaKernel = Pq.adcTopK(enc, "vec_id", model, q, 300)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val codes = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codes.foreach { case (id, cs) =>
      val d = cs.zipWithIndex.map { case (c, s) => lut(s * model.ksub + c) }.sum
      val expected = BigDecimal(1.0 - d / 2.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(viaKernel(id) - expected) < 1e-9, s"id $id")
    }
  }

  test("recall@10 vs exact cosine on clustered vectors") {
    val model = Pq.train(vecs, "embedding", "vec_id", m = 8, ksub = 16)
    val q = data.head._2
    val exactTop = data.drop(1)
      .map { case (id, v) => id -> cos(q, v) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val rest = vecs.where(col("vec_id") =!= 0)
    val enc = Pq.encode(rest, "embedding", "vec_id", model)
    // raw ADC: coarse codes still put most true neighbors up top
    val pqTop = Pq.adcTopK(enc, "vec_id", model, q, 10)
      .collect().map(_.getLong(0)).toSet
    val adcRecall = (exactTop & pqTop).size.toDouble / 10.0
    assert(adcRecall >= 0.5, s"ADC recall@10 $adcRecall below 0.5 (pq=$pqTop)")
    // refined: overfetch 8k candidates from codes, exact-rescore those
    val refined = Pq.adcTopKRefined(enc, rest, "embedding", "vec_id",
      model, q, 10).collect().map(_.getLong(0)).toSet
    val refRecall = (exactTop & refined).size.toDouble / 10.0
    assert(refRecall >= 0.9,
      s"refined recall@10 $refRecall below 0.9 (refined=$refined exact=$exactTop)")
  }
}
