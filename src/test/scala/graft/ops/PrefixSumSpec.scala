package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrefixSumSpec extends SparkSpec {

  private def data(n: Int, groups: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    (0 until n).map(i =>
        (i.toLong, s"g${rnd.nextInt(groups)}", rnd.nextInt(100).toLong))
      .toDF("id", "grp", "v")
      .repartition(7) // scatter rows so range partitions really merge
  }

  test("grouped running total equals the window form, across partitions") {
    val df = data(5000, 3)
    val got = PrefixSum.runningTotal(df, Seq("grp"), Seq("id"), "v", "run",
        partitions = 8)
      .select("id", "run").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = Window.partitionBy("grp").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("run", sum(col("v")).over(w))
      .select("id", "run").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === 5000)
    assert(got === exp)
  }

  test("global (no-group) running total equals the window form") {
    val df = data(2000, 1)
    val got = PrefixSum.runningTotal(df, Nil, Seq("id"), "v", "run",
        partitions = 8)
      .select("id", "run").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("run", sum(col("v")).over(w))
      .select("id", "run").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === exp)
  }

  test("output is deterministic run-to-run (total-order property)") {
    val df = data(3000, 5)
    def once() = PrefixSum.runningTotal(df, Seq("grp"),
        Seq("v", "id"), "v", "run", partitions = 5)
      .select("id", "run").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(once() === once())
  }

  test("a group spanning many range partitions carries offsets through") {
    val s = spark
    import s.implicits._
    // one giant group + one tiny group; the giant group spans all
    // partitions, so its per-partition offsets must chain correctly.
    val df = (0 until 4000).map(i =>
        (i.toLong, if (i % 997 == 0) "tiny" else "big", 1L))
      .toDF("id", "grp", "v").repartition(6)
    val out = PrefixSum.runningTotal(df, Seq("grp"), Seq("id"), "v", "run",
      partitions = 8)
    // constant v=1 means run == per-group 1-based rank in id order
    val big = out.where(col("grp") === "big").orderBy("id")
      .select("run").collect().map(_.getLong(0)).toSeq
    assert(big === (1L to big.length.toLong))
    val tiny = out.where(col("grp") === "tiny").orderBy("id")
      .select("run").collect().map(_.getLong(0)).toSeq
    assert(tiny === (1L to tiny.length.toLong))
  }
}
