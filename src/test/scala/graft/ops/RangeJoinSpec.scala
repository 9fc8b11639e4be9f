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

  test("overlap join equals the inequality join, each pair emitted once") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    def mk(n: Int, pfx: String) = (1 to n).map { i =>
      val start = rnd.nextInt(9000).toLong
      (i.toLong, start, start + 50L + rnd.nextInt(2500))
    }.toDF(s"${pfx}id", s"${pfx}lo", s"${pfx}hi")
    val a = mk(120, "a")
    val b = mk(80, "b")
    val got = RangeJoin.overlapByBinning(a, "alo", "ahi", b, "blo", "bhi", 1000L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = a.join(b,
      col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == expected.toSet)
  }

  test("overlap edges: touching intervals excluded, containment included") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 0L, 10L), (2L, 35L, 45L)).toDF("aid", "alo", "ahi")
    val b = Seq(
      (1L, 10L, 20L), // touches a1 at 10 → NOT overlapping (exclusive)
      (2L, 9L, 11L),  // crosses a1's end
      (3L, 2L, 5L),   // contained in a1
      (4L, 0L, 100L)) // contains both a's, spans many bins
      .toDF("bid", "blo", "bhi")
    val got = RangeJoin.overlapByBinning(a, "alo", "ahi", b, "blo", "bhi", 10L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L)))
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
    val a = intervals.toDF("aid", "alo", "ahi")
    val oPlan = RangeJoin.overlapByBinning(a, "alo", "ahi",
      intervals.toDF("bid", "blo", "bhi"), "blo", "bhi", 500L)
      .queryExecution.executedPlan.toString
    assert(!oPlan.contains("NestedLoop"), oPlan)
    assert(!oPlan.contains("CartesianProduct"), oPlan)
  }
}
