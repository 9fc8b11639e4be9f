package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  private lazy val df = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // duplicate scores force the tiebreak path
    (1 to 2000).map(i =>
      (s"g${i % 7}", i.toLong, rnd.nextInt(50).toDouble)).toDF("g", "id", "v")
  }

  test("bounded-heap top-k equals the row_number window form") {
    val w = Window.partitionBy("g").orderBy(desc("v"), asc("id"))
    val expected = df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select("g", "v", "id", "rk")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .toSet
    val got = TopK.byScore(df, Seq("g"), "v", "id", 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got == expected)
  }

  test("k larger than every group returns whole groups, ranked") {
    val got = TopK.byScore(df.limit(10), Seq("g"), "v", "id", 1000)
    assert(got.count() == 10)
    // ranks are 1..size within each group
    val byG = got.collect().groupBy(_.getString(0))
    byG.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
    }
  }

  test("plans as a two-phase aggregate, not a window sort") {
    val plan = TopK.byScore(df, Seq("g"), "v", "id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
