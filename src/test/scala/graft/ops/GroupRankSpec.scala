package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GroupRankSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups, duplicate-heavy order values — ties are the hard part
  private def data = {
    val rnd = new scala.util.Random(17)
    (1 to 3000).map(i =>
      (i.toLong, s"g${i % 3}", rnd.nextInt(40).toLong))
      .toDF("id", "g", "v")
  }

  test("equals row_number over the group window, ties and all") {
    val df = data
    val got = GroupRank.ranks(df, "g", Seq("v"), "id")
      .select("id", "rank", "n_in_group")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val expected = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n_in_group",
        count(lit(1)).over(Window.partitionBy("g")))
      .select("id", "rank", "n_in_group")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === expected)
  }

  test("ranks are a permutation 1..n per group") {
    val out = GroupRank.ranks(data, "g", Seq("v"), "id")
      .select("g", "rank").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    out.foreach { case (g, ranks) =>
      assert(ranks.toSeq === (1L to ranks.length).toSeq, s"group $g")
    }
  }

  test("deterministic across partitionings; no Window in the plan") {
    val df = data
    val a = GroupRank.ranks(df, "g", Seq("v"), "id")
      .select("id", "rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GroupRank.ranks(df.repartition(13), "g", Seq("v"), "id")
      .select("id", "rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    val plan = GroupRank.ranks(df, "g", Seq("v"), "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "group ranks must not plan a window")
  }
}
