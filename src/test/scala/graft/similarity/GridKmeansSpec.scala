package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GridKmeansSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("distributed assignment equals the driver-side integer argmin") {
    val emb = graft.Tables.embeddings(spark, dir)
    val cents = GridKmeans.centroids(emb, "embedding", "vec_id",
      c = 4, iters = 2, maxTrain = 128)
    val got = GridKmeans.assign(emb, "embedding", "vec_id", cents)
      .select(col("vec_id").cast("long"), col("centroid_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    val qv = emb.select(col("vec_id").cast("long"),
        GridKmeans.quantize(col("embedding")))
      .as[(Long, Array[Long])].collect()
    assert(qv.length == got.size)
    qv.foreach { case (id, v) =>
      val best = cents.zipWithIndex.map { case (cv, ci) =>
        var d = 0L; var i = 0
        while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
        (d * cents.length + ci, ci)
      }.min._2
      assert(got(id) == best.toLong, s"vec $id")
    }
  }

  test("training is deterministic run to run") {
    val emb = graft.Tables.embeddings(spark, dir)
    val a = GridKmeans.centroids(emb, "embedding", "vec_id", 8, 3, 256)
    val b = GridKmeans.centroids(emb, "embedding", "vec_id", 8, 3, 256)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("an emptied cluster keeps its previous centroid; means truncate") {
    // two far groups, four seeds (the id-smallest four): seeds 1 and 3
    // duplicate 0 and 2's positions, so the packed (dist, cid) tie
    // rule sends every point to the lower id — the duplicates win
    // nothing and must keep their previous centroids verbatim.
    val df = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.0, 0.0)),
      (2L, Seq(9.0, 9.0)), (3L, Seq(9.0, 9.0)),
      (4L, Seq(9.1, 9.1)), (5L, Seq(0.1, 0.1))).toDF("vec_id", "embedding")
    val cents = GridKmeans.centroids(df, "embedding", "vec_id",
      c = 4, iters = 1, maxTrain = 100)
    // empty clusters: previous (= seed) centroids survive
    assert(cents(1).toSeq == Seq(0L, 0L))
    assert(cents(3).toSeq == Seq(9000000L, 9000000L))
    // live clusters: truncating integer means on the floor-once grid —
    // 0.1 quantizes to 100000 (0.1·1e6 rounds up in double), 9.1 to
    // 9099999 (9.1·1e6 rounds DOWN), and (2·9e6 + 9099999)/3 truncates
    assert(cents(0).toSeq == Seq(33333L, 33333L)) // (0+0+100000)/3
    assert(cents(2).toSeq == Seq(9033333L, 9033333L)) // 27099999/3
  }

  test("cluster-balanced sample: exact-k per cluster, ids from that cluster") {
    // the q_cluster_sample composition: GridKmeans assignment +
    // per-cluster deterministic md5 exact-k (ops/Sampling)
    val emb = graft.Tables.embeddings(spark, dir)
    val cents = GridKmeans.centroids(emb, "embedding", "vec_id",
      c = 4, iters = 2, maxTrain = 128)
    val assigned = GridKmeans.assign(emb, "embedding", "vec_id", cents)
    val sizes = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val byCluster = assigned.select(col("centroid_id").cast("long"),
        col("vec_id").cast("long"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val k = 5
    val got = graft.ops.Sampling.groupedExactK(assigned, "centroid_id",
        "vec_id", k)
      .select(col("centroid_id").cast("long"), col("vec_id").cast("long"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == sizes.keySet.filter(sizes(_) > 0))
    got.foreach { case (cid, ids) =>
      assert(ids.size == math.min(k.toLong, sizes(cid)), s"cluster $cid")
      assert(ids.subsetOf(byCluster(cid)), s"cluster $cid sample leaks")
    }
  }
}
