package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {

  import spark.implicits._

  private val rows = {
    var s = 7L
    def nxt(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s }
    (0L until 300L).map(i => (i, nxt() % 10, nxt() % 1000 - 500))
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))

  test("maintain(state, delta) equals recompute, at every split point") {
    val df = rows.toDF("id", "k", "v")
    val full = IncrementalAgg.initial(df.drop("id"), Seq("k"), Seq("v"))
      .collect().map(key).toSet
    Seq(0L, 1L, 150L, 299L, 300L).foreach { cut =>
      val state = IncrementalAgg.initial(
        df.where(col("id") < cut).drop("id"), Seq("k"), Seq("v"))
      val merged = IncrementalAgg.maintain(state,
        df.where(col("id") >= cut).drop("id"), Seq("k"), Seq("v"))
      assert(merged.collect().map(key).toSet == full, s"cut=$cut diverged")
    }
  }

  test("keys only in delta and keys only in state both survive") {
    val state = IncrementalAgg.initial(
      Seq((1L, 10L), (1L, 20L)).toDF("k", "v"), Seq("k"), Seq("v"))
    val got = IncrementalAgg.maintain(state,
      Seq((2L, 5L)).toDF("k", "v"), Seq("k"), Seq("v"))
      .collect().map(key).map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((2L, 30L, 10L, 20L)), s"state-only key mangled: $got")
    assert(got(2L) == ((1L, 5L, 5L, 5L)), s"delta-only key mangled: $got")
  }

  test("empty delta is a no-op") {
    val df = rows.toDF("id", "k", "v").drop("id")
    val state = IncrementalAgg.initial(df, Seq("k"), Seq("v"))
    val merged = IncrementalAgg.maintain(state,
      df.where(lit(false)), Seq("k"), Seq("v"))
    assert(merged.collect().map(key).toSet ==
      state.collect().map(key).toSet)
  }

  test("equals Structured Streaming aggregation state across microbatches") {
    // The maintain() merge IS what the streaming state store does per
    // microbatch — prove it: two files, one per trigger, streamed
    // through the same aggregate in Complete mode must equal
    // initial(file1) maintained with file2.
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft-incr")
    val scratch = java.nio.file.Files.createTempDirectory("graft-incr-w")
    val df = rows.toDF("id", "k", "v")
    Seq(0, 1).foreach { half =>
      val out = scratch.resolve(s"p$half")
      df.where(col("id") % 2 === half).drop("id").coalesce(1)
        .write.parquet(out.toString)
      val part = java.nio.file.Files.list(out).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, dir.resolve(s"f$half.parquet"))
    }
    val stream = spark.readStream.schema("k LONG, v LONG")
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    val q = stream.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("incr_state")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark
      .sql("SELECT k, cnt, sum_v, min_v, max_v FROM incr_state")
      .collect().map(key).toSet
    val batchMaintained = IncrementalAgg.maintain(
        IncrementalAgg.initial(df.where(col("id") % 2 === 0).drop("id"),
          Seq("k"), Seq("v")),
        df.where(col("id") % 2 === 1).drop("id"), Seq("k"), Seq("v"))
      .collect().map(key).toSet
    assert(streamed.nonEmpty && streamed == batchMaintained)
  }
}
