package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(ids: Seq[Long]) =
    ids.toDF("v").select(xxhash64(col("v")).as("h"))

  test("merge is partitioning-invariant: same bottom-k any way the data splits") {
    val ids = (0L until 20000L)
    def sketchOf(parts: Int): Seq[Long] =
      hashed(ids).repartition(parts)
        .agg(Kmv.sketch(col("h"), 256).as("s"))
        .collect()(0).getSeq[Long](0)
    val s1 = sketchOf(1)
    assert(s1 == sketchOf(7) && s1 == sketchOf(32))
    assert(s1.length == 256 && s1 == s1.sorted)
  }

  test("sub-k sketch is the exact distinct set; estimate is exact") {
    val ids = Seq(1L, 2L, 3L, 2L, 1L, 9L)
    val s = hashed(ids).agg(Kmv.sketch(col("h"), 64).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(s.length == 4)
    assert(Kmv.estimateDistinct(s.toArray, 64) == 4.0)
  }

  test("distinct estimate within 10% at k=1024 over 50k values") {
    val s = hashed(0L until 50000L)
      .agg(Kmv.sketch(col("h"), 1024).as("s"))
      .collect()(0).getSeq[Long](0)
    val est = Kmv.estimateDistinct(s.toArray, 1024)
    assert(math.abs(est - 50000.0) / 50000.0 < 0.10, s"est=$est")
  }

  test("overlap estimate: planted 10k-of-30k intersection within 25% at k=2048") {
    val a = (0L until 30000L)            // 0..29999
    val b = (20000L until 50000L)        // 20000..49999, overlap 10k
    val k = 2048
    def sk(ids: Seq[Long]) = hashed(ids)
      .agg(Kmv.sketch(col("h"), k).as("s")).collect()(0).getSeq[Long](0).toArray
    val (j, inter) = Kmv.estimateOverlap(sk(a), sk(b), k)
    val trueJ = 10000.0 / 50000.0
    assert(math.abs(j - trueJ) / trueJ < 0.25, s"j=$j")
    assert(math.abs(inter - 10000.0) / 10000.0 < 0.25, s"inter=$inter")
  }

  test("exact-regime overlap returns exact integers") {
    val a = Seq(1L, 2L, 3L, 4L)
    val b = Seq(3L, 4L, 5L)
    def sk(ids: Seq[Long]) = hashed(ids)
      .agg(Kmv.sketch(col("h"), 64).as("s")).collect()(0).getSeq[Long](0).toArray
    val (j, inter) = Kmv.estimateOverlap(sk(a), sk(b), 64)
    assert(inter == 2.0)
    assert(j == 2.0 / 5.0)
  }
}
