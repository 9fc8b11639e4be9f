package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asof join: latest right at-or-before each left, per key") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts(100), "a"), // after r@50 and r@100 → matches r@100 (inclusive)
      (1L, ts(99), "b"),  // only r@50 precedes
      (1L, ts(10), "c"),  // before every right row → no match
      (2L, ts(500), "d"), // key with no right rows at all
      (3L, ts(70), "e"))  // matches key 3's only row at 60
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(50), 5.0),
      (1L, ts(100), 7.0),
      (1L, ts(200), 9.0), // later than every left row — never matches
      (3L, ts(60), 1.5))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asof(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime / 1000),
          Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue)))
      .toMap
    assert(out == Map(
      "a" -> (Some(100L), Some(7.0)),
      "b" -> (Some(50L), Some(5.0)),
      "c" -> (None, None),
      "d" -> (None, None),
      "e" -> (Some(60L), Some(1.5))))
  }

  test("null right values stay attached to their own row") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts(100), "x")).toDF("k", "t", "tag")
    // the LATEST right row carries a NULL value; a per-column carry
    // would wrongly surface 5.0 from the earlier row
    val right = Seq((1L, ts(50), Some(5.0)), (1L, ts(80), None))
      .toDF("k", "t", "v")
    val r = AsOfJoin.asof(left, right, "k", "t", Seq("v")).collect()(0)
    assert(r.getAs[Timestamp]("asof_ts").getTime == 80000L)
    assert(r.getAs[java.lang.Double]("asof_v") == null)
  }

  test("matches the naive per-row maximum on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(1000).toLong), i.toLong))
    val right = (1 to 200).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(1000).toLong), i.toDouble))
      // unique per (key, ts): keep the max value like the operator doc says
      .groupBy(e => (e._1, e._2)).map(_._2.maxBy(_._3)).toSeq
    val expected = left.map { case (k, t, id) =>
      val c = right.filter(r => r._1 == k && !r._2.after(t))
      id -> (if (c.isEmpty) None
             else Some(c.maxBy(_._2.getTime)._3))
    }.toMap
    val out = AsOfJoin.asof(left.toDF("k", "t", "id"),
      right.toDF("k", "t", "v"), "k", "t", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue)).toMap
    assert(out == expected)
  }

  test("plan is a single shuffle on the key — no nested-loop join") {
    val s = spark
    import s.implicits._
    val left = (1 to 50).map(i => (i.toLong % 5, ts(i.toLong), i.toLong))
      .toDF("k", "t", "id")
    val right = (1 to 50).map(i => (i.toLong % 5, ts(i.toLong * 2), i.toDouble))
      .toDF("k", "t", "v")
    val plan = AsOfJoin.asof(left, right, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
