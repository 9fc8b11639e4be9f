package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // Three tight clusters at increasing distance from the query
  // direction; within-cluster vectors are near-copies.
  private def planted = {
    val rnd = new scala.util.Random(11)
    val centers = Seq(
      Array(1.0, 0.05, 0.0, 0.0), // closest to query e1
      Array(0.6, 0.8, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.2))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 8
    } yield (ci * 100L + j,
      c.map(x => (x + rnd.nextGaussian() * 0.01).toFloat).toSeq)
    rows.toDF("vec_id", "embedding")
  }

  private def query = Seq(Tuple1(Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("qvec")

  /** Brute-force reference MMR on driver-collected vectors. */
  private def refMmr(vecs: Map[Long, Array[Double]], q: Array[Double],
      k: Int, lambda: Double): Seq[Long] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val rel = vecs.map { case (id, v) => id -> cos(v, q) }
    var sel = Vector.empty[Long]
    while (sel.size < k) {
      val cand = vecs.keys.filterNot(sel.contains)
      val best = cand.minBy { id =>
        val pen = if (sel.isEmpty) 0.0
          else sel.map(s => cos(vecs(id), vecs(s))).max
        (-(lambda * rel(id) - (1 - lambda) * pen), id)
      }
      sel :+= best
    }
    sel
  }

  test("matches the brute-force reference selection order") {
    val df = planted
    val out = Mmr.rerank(df, "embedding", "vec_id", query, k = 6,
      lambda = 0.5, poolSize = 24)
      .orderBy("mmr_rank").collect().map(_.getLong(0)).toSeq
    val vecs = df.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val ref = refMmr(vecs, Array(1.0, 0.0, 0.0, 0.0), 6, 0.5)
    assert(out === ref)
  }

  test("pure relevance floods from one cluster; MMR spreads") {
    val df = planted
    val relOnly = Mmr.rerank(df, "embedding", "vec_id", query, k = 3,
      lambda = 1.0, poolSize = 24)
      .collect().map(_.getLong(0) / 100).distinct
    val diverse = Mmr.rerank(df, "embedding", "vec_id", query, k = 3,
      lambda = 0.3, poolSize = 24)
      .collect().map(_.getLong(0) / 100).distinct
    assert(relOnly.length === 1) // all picks from the nearest cluster
    assert(diverse.length === 3) // one per cluster
  }

  test("rank 1 is always the pure-relevance argmax; deterministic") {
    val df = planted
    val a = Mmr.rerank(df, "embedding", "vec_id", query, 5, 0.7, 24)
      .orderBy("mmr_rank").collect()
    val b = Mmr.rerank(df.repartition(7), "embedding", "vec_id", query,
      5, 0.7, 24).orderBy("mmr_rank").collect()
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
    val topRel = df.crossJoin(broadcast(query))
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), col("qvec")).as("r"))
      .orderBy(desc("r"), asc("vec_id")).limit(1)
      .collect().head.getLong(0)
    assert(a.head.getLong(0) === topRel)
  }

  test("pool bound caps output size") {
    val out = Mmr.rerank(planted, "embedding", "vec_id", query, 10, 0.7,
      poolSize = 10)
    assert(out.count() === 10L)
    intercept[IllegalArgumentException] {
      Mmr.rerank(planted, "embedding", "vec_id", query, 20, 0.7, 10)
    }
  }
}
