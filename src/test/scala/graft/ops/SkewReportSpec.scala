package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: Seq[(String, Int)]) = {
    val df = rows.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
    SkewReport.of(df, "k").collect().head
  }

  test("uniform keys score gini_bp = 0 exactly") {
    val r = report((1 to 10).map(i => s"k$i" -> 7))
    assert(r.getAs[Long]("gini_bp") === 0L)
    assert(r.getAs[Long]("n_keys") === 10L)
    assert(r.getAs[Long]("n_rows") === 70L)
    assert(r.getAs[Long]("p50_cnt") === 7L)
    assert(r.getAs[Long]("top1_bp") === 1000L) // 7/70
  }

  test("hand-computed Gini on a small skewed distribution") {
    // counts 1, 2, 3, 4 ascending: G = Σ(2i-n-1)x / (n Σx)
    //   = ((-3)·1 + (-1)·2 + 1·3 + 3·4) / (4 · 10) = 10/40 = 0.25
    val r = report(Seq("a" -> 1, "b" -> 2, "c" -> 3, "d" -> 4))
    assert(r.getAs[Long]("gini_bp") === 2500L)
    assert(r.getAs[Long]("p50_cnt") === 2L) // ⌈4/2⌉-th smallest
    assert(r.getAs[Long]("max_cnt") === 4L)
    assert(r.getAs[Long]("top1_bp") === 4000L)
  }

  test("one dominant key pushes gini and top-share toward the ceiling") {
    val r = report(Seq("whale" -> 960) ++ (1 to 40).map(i => s"m$i" -> 1))
    assert(r.getAs[Long]("gini_bp") > 9000L, r.toString)
    assert(r.getAs[Long]("top1_bp") === 9600L)
    assert(r.getAs[Long]("p50_cnt") === 1L)
  }

  test("odd key count selects the true middle; ties don't disturb it") {
    val r = report(Seq("a" -> 5, "b" -> 5, "c" -> 9))
    assert(r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[Long]("p50_cnt") === 5L) // rank 2 of (5, 5, 9)
  }

  test("deterministic across partitionings") {
    val rows = (1 to 200).map(i => s"k$i" -> (i % 13 + 1))
    val df = rows.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
    val a = SkewReport.of(df, "k").collect().head.toSeq
    val b = SkewReport.of(df.repartition(17), "k").collect().head.toSeq
    assert(a === b)
  }
}
