package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  test("binned range join equals the inequality join, no duplicates") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 500).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "p")
    // interval lengths straddle the bin width (some span 3+ bins)
    val intervals = (1 to 40).map { i =>
      val start = rnd.nextInt(9000).toLong
      (i.toLong, start, start + 100L + rnd.nextInt(3000))
    }.toDF("iid", "lo", "hi")

    val got = RangeJoin.byBinning(points, "p", intervals, "lo", "hi", 1000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == expected.toSet)
  }

  test("edge cases: end-exclusive, bin-edge boundaries, empty interval") {
    val s = spark
    import s.implicits._
    val points = Seq(0L, 9L, 10L, 19L, 20L, 25L).map(p => (p, p))
      .toDF("pid", "p")
    val intervals = Seq(
      (1L, 10L, 20L), // exactly one bin at width 10: [10, 20)
      (2L, 5L, 5L),   // empty interval matches nothing
      (3L, 0L, 30L))  // spans three bins
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.byBinning(points, "p", intervals, "lo", "hi", 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (10L, 1L), (19L, 1L),
      (0L, 3L), (9L, 3L), (10L, 3L), (19L, 3L), (20L, 3L), (25L, 3L)))
  }

  test("plan is an equi-join on the bin, not a nested loop") {
    val s = spark
    import s.implicits._
    // both sides big enough that Spark would NOT broadcast-nested-loop
    // a bare inequality join cheaply; assert our plan never does
    val points = (1 to 100).map(i => (i.toLong, i.toLong * 13 % 5000)).toDF("pid", "p")
    val intervals = (1 to 50).map(i => (i.toLong, i * 90L, i * 90L + 200L))
      .toDF("iid", "lo", "hi")
    val plan = RangeJoin.byBinning(points, "p", intervals, "lo", "hi", 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
