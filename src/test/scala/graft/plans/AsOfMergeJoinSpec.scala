package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AsOfMergeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def hasMergeExec(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => hasMergeExec(a.executedPlan)
    case _: AsOfMergeJoinExec => true
    case other => other.children.exists(hasMergeExec) ||
      other.subqueries.exists(hasMergeExec)
  }

  test("handcrafted semantics: inclusive ts, latest wins, left outer") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"),
      (3L, 7L, "d")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 6L, 60.0))
      .toDF("k", "t", "v")
    val got = AsOfMergeJoin.asof(left, right, "k", "t", Seq("v"))
      .orderBy("k", "t")
      .select("k", "t", "tag", "asof_ts", "asof_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 10L, "a", 10L, 100.0), // inclusive: right at exactly left.t
      (1L, 20L, "b", 15L, 150.0), // latest preceding wins
      (2L, 5L, "c", -1L, -1.0),   // right row is later -> no match
      (3L, 7L, "d", -1L, -1.0)))  // key absent on the right
  }

  test("plans through AsOfMergeJoinExec and equals the union-sweep") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("click_value"))
    val merge = AsOfMergeJoin.asof(purchases, clicks, "user_id", "ts",
      Seq("click_value"))
    assert(hasMergeExec(merge.queryExecution.executedPlan),
      merge.queryExecution.executedPlan.toString)
    val sweep = graft.ops.AsOfJoin.asof(purchases, clicks, "user_id", "ts",
      Seq("click_value"))
    val cols = Seq("user_id", "ts", "value", "asof_ts", "asof_click_value")
    val m = merge.select(cols.map(col): _*).collect()
      .map(_.toSeq).sortBy(_.toString)
    val s = sweep.select(cols.map(col): _*).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(m.length == s.length && m.sameElements(s))
  }

  test("pre-partitioned inputs are re-clustered, results unchanged") {
    // Scatter both sides into mismatched partitionings first: the
    // exec's ClusteredDistribution requirements must re-shuffle both
    // onto the key with the SAME partition count or the positional
    // zipPartitions pairing silently corrupts results.
    var s = 99L
    def nxt(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); math.abs(s % 1000) }
    val left = (0 until 400).map(_ => (nxt() % 50, nxt(), nxt().toDouble))
      .toDF("k", "t", "lv").repartition(7, col("lv"))
    val right = (0 until 300).map(_ => (nxt() % 50, nxt(), nxt().toDouble))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (k, t)
      .toDF("k", "t", "v").repartition(3)
    val got = AsOfMergeJoin.asof(left, right, "k", "t", Seq("v"))
      .select("k", "t", "lv", "asof_ts", "asof_v")
      .collect().map(_.toSeq).sortBy(_.toString)
    val want = graft.ops.AsOfJoin.asof(left, right, "k", "t", Seq("v"))
      .select("k", "t", "lv", "asof_ts", "asof_v")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.length == want.length && got.sameElements(want))
    assert(got.exists(r => r(3) != null)) // some matches exist
    assert(got.exists(r => r(3) == null)) // and some non-matches
  }

  test("string keys (general comparator path) equal the union-sweep") {
    var s = 7L
    def nxt(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); math.abs(s % 1000) }
    // path-shaped keys, deliberately prefix-nested (binary UTF8 order
    // must agree between the required sort and the merge comparator)
    def key(): String = s"/data/d${nxt() % 7}/f${nxt() % 5}"
    val left = (0 until 400).map(_ => (key(), nxt(), nxt().toDouble))
      .toDF("k", "t", "lv").repartition(5)
    val right = (0 until 300).map(_ => (key(), nxt(), nxt().toDouble))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (k, t)
      .toDF("k", "t", "v").repartition(3)
    val merge = AsOfMergeJoin.asof(left, right, "k", "t", Seq("v"))
    assert(hasMergeExec(merge.queryExecution.executedPlan))
    val got = merge.select("k", "t", "lv", "asof_ts", "asof_v")
      .collect().map(_.toSeq).sortBy(_.toString)
    val want = graft.ops.AsOfJoin.asof(left, right, "k", "t", Seq("v"))
      .select("k", "t", "lv", "asof_ts", "asof_v")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.length == want.length && got.sameElements(want))
    assert(got.exists(r => r(3) != null) && got.exists(r => r(3) == null))
  }

  test("composite (string, long) keys match a brute-force replay") {
    var s = 13L
    def nxt(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); math.abs(s % 1000) }
    val lRows = (0 until 300).map(_ => (s"s${nxt() % 5}", nxt() % 4, nxt()))
    val rRows = (0 until 250).map(_ => (s"s${nxt() % 5}", nxt() % 4, nxt(), nxt().toDouble))
      .groupBy(r => (r._1, r._2, r._3)).map(_._2.head).toSeq // unique (k1,k2,t)
    val left = lRows.toDF("k1", "k2", "t").repartition(6)
    val right = rRows.toDF("k1", "k2", "t", "v").repartition(2)
    val merge = AsOfMergeJoin.asofKeys(left, right, Seq("k1", "k2"), "t",
      Seq("v"))
    assert(hasMergeExec(merge.queryExecution.executedPlan))
    val got = merge.select("k1", "k2", "t", "asof_ts", "asof_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .sortBy(_.toString)
    val want = lRows.map { case (k1, k2, t) =>
      val m = rRows.filter(r => r._1 == k1 && r._2 == k2 && r._3 <= t)
      if (m.isEmpty) (k1, k2, t, None, None)
      else {
        val best = m.maxBy(_._3)
        (k1, k2, t, Some(best._3), Some(best._4))
      }
    }.sortBy(_.toString)
    assert(got.toSeq == want)
    assert(got.exists(_._4.isDefined) && got.exists(_._4.isEmpty))
  }
}
