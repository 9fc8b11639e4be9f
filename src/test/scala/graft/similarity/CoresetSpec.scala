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
}
