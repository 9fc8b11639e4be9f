package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF-PQ composition: probing all cells must recover the refined-PQ
  * answer exactly (pruning is the only approximation IVF adds), and a
  * small-nprobe probe keeps high recall on clustered data. */
class IvfPqSpec extends SparkSpec {

  private val dim = 64

  private lazy val data: Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(31)
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 3))
    (0 until 240).map { i =>
      val c = centers(i % 8)
      i.toLong -> c.map(_ + 0.2 * rnd.nextGaussian())
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

  test("nprobe = all cells equals the refined-PQ answer over the corpus") {
    val rest = vecs.where(col("vec_id") =!= 0)
    val index = IvfPq.build(rest, "embedding", "vec_id", c = 8, m = 8, ksub = 16)
    val q = data.head._2
    val full = {
      val enc = Pq.encode(rest, "embedding", "vec_id", index.model)
      Pq.adcTopKRefined(enc, rest, "embedding", "vec_id", index.model, q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    val probedAll = IvfPq.topK(index, rest, "embedding", "vec_id", q,
      k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probedAll == full)
  }

  test("small nprobe keeps high recall vs exact cosine on clustered data") {
    val rest = vecs.where(col("vec_id") =!= 0)
    val index = IvfPq.build(rest, "embedding", "vec_id", c = 8, m = 8, ksub = 16)
    val q = data.head._2
    val exactTop = data.drop(1)
      .map { case (id, v) => id -> cos(q, v) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val got = IvfPq.topK(index, rest, "embedding", "vec_id", q,
      k = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    val recall = (exactTop & got).size.toDouble / 10.0
    assert(recall >= 0.9, s"recall@10 $recall (got=$got exact=$exactTop)")
  }
}
