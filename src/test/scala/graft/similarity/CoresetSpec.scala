package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  // 4 planted directions in 8-d space, 25 near-copies each (tiny
  // jitter), ids interleaved across clusters.
  private lazy val planted = {
    val dirs = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0.0, 1, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 0, 0),
      Array(0.0, 0, 0, 1, 0, 0, 0, 0))
    (0 until 100).map { i =>
      val c = i % 4
      val v = dirs(c).clone()
      v((c + 4) % 8) = 0.05 * ((i % 7) + 1) // deterministic jitter
      (i.toLong, v.toSeq, c)
    }.toDF("vec_id", "embedding", "cluster")
  }

  test("k-center greedy covers every planted cluster") {
    val centers = Coreset.selectKCenters(planted, "embedding", "vec_id", k = 4)
    assert(centers.length == 4)
    val byId = planted.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 4 centers, 4 well-separated clusters -> one center per cluster
    assert(centers.map(c => byId(c._1)).toSet == Set(0, 1, 2, 3))
  }

  test("assignment recovers the planted clustering; selection is deterministic") {
    val centers = Coreset.selectKCenters(planted, "embedding", "vec_id", k = 4)
    val centerCluster = planted.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val wrong = Coreset.assign(planted, "embedding", "vec_id", centers)
      .select(col("cluster"), col("center_id")).collect()
      .count(r => r.getInt(0) != centerCluster(r.getLong(1)))
    assert(wrong == 0, s"$wrong rows assigned across planted clusters")
    val again = Coreset.selectKCenters(planted, "embedding", "vec_id", k = 4)
    assert(centers.map(_._1).toSeq == again.map(_._1).toSeq)
  }

  test("coverage radius shrinks (min_sim rises) as k grows") {
    def worst(k: Int): Long =
      Coreset.summary(planted, "embedding", "vec_id", k)
        .agg(min(col("min_sim_bp"))).collect().head.getLong(0)
    // 1 center cannot cover 4 orthogonal directions; 4 can
    assert(worst(1) < 2000, "one center should cover poorly")
    assert(worst(4) > 9000, "four centers should cover tightly")
  }

  test("grid tier: selection matches a brute-force integer replay; report is consistent") {
    // brute-force Gonzalez on the quantized sample, straight from the
    // spec'd rules (md5-rank sample, smallest-id seed, argmax ties by
    // id) — an independent implementation, not the production loop
    def md5rank(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)
    val all = planted.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Double](1).map(x => math.floor(x * 1e6).toLong).toArray))
    val samp = all.sortBy { case (id, _) => (md5rank(id), id) }.take(32)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var chosen = Vector(samp.minBy(_._1))
    var selDists = Vector(0L)
    while (chosen.length < 4) {
      val cand = samp.filterNot(s => chosen.exists(_._1 == s._1))
        .map(s => (s, chosen.map(c => d2(s._2, c._2)).min))
      val best = cand.minBy { case ((id, _), d) => (-d, id) }
      chosen :+= best._1
      selDists :+= best._2
    }
    val got = Coreset.selectKCentersGrid(planted, "embedding", "vec_id",
      k = 4, maxTrain = 32)
    assert(got.map(_._1).toSeq == chosen.map(_._1))
    assert(got.map(_._3).toSeq == selDists)
    // report: ranks 1..4, populations cover the whole corpus, every
    // center's own vector is at distance 0 in its cell
    val rep = Coreset.gridReport(planted, "embedding", "vec_id", k = 4,
      maxTrain = 32).collect()
    assert(rep.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rep.map(_.getLong(3)).sum == 100L)
    assert(rep.forall(r => r.getLong(4) >= 0L))
  }
}
