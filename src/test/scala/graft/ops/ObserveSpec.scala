package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ObserveSpec extends SparkSpec {

  import spark.implicits._

  test("observed metrics equal recomputed aggregates, zero extra scans") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val (instr, obs) = Observe.quality(docs, "docs_q",
      Seq("doc_id", "lang"), length(col("text")) < 10)
    // ONE action materializes the flow; metrics ride it.
    val n = instr.where(col("n_chars") > 0).count()
    val m = obs.get
    val expectRows = docs.count()
    val expectViol = docs.where(length(col("text")) < 10).count()
    assert(m("rows") == expectRows)
    assert(m("null_keys") == 0L)
    assert(m("violations") == expectViol)
    assert(n <= expectRows)
  }

  test("null keys and violations are counted pre-filter, per the flow") {
    val df = Seq((Some(1L), "ok", 5L), (None, "ok", 50L),
      (Some(3L), null.asInstanceOf[String], 5L), (Some(4L), "ok", 500L))
      .toDF("id", "tag", "v")
    val (instr, obs) = Observe.quality(df, "t2", Seq("id", "tag"),
      col("v") >= 100L)
    // the downstream filter does NOT hide rows from the observation
    // point placed above it
    assert(instr.where(col("v") < 100).count() == 3L)
    val m = obs.get
    assert(m("rows") == 4L)
    assert(m("null_keys") == 2L)
    assert(m("violations") == 1L)
  }

  test("streaming: per-micro-batch metrics arrive in query progress") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-obs")
    Tables.events(spark, "/root/testdata/sf0.001").coalesce(1)
      .write.mode("overwrite").parquet(streamDir.toString)
    val obsName = "stream_q"
    val reader = spark.readStream
      .schema(spark.read.parquet(streamDir.toString).schema)
      .parquet(streamDir.toString)
    // streaming uses the NAME variant (the Observation handle is
    // batch-only); metrics arrive per micro-batch on progress events
    val q = reader
      .observe(obsName, count(lit(1)).as("rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_keys"))
      .groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("obs_sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // observed metrics surface on the progress events
      val metrics = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get(obsName)))
      assert(metrics.nonEmpty, "no observed metrics in progress events")
      val rows = metrics.map(_.getAs[Long]("rows")).sum
      assert(rows == Tables.events(spark, "/root/testdata/sf0.001").count())
      assert(metrics.forall(_.getAs[Long]("null_keys") == 0L))
    } finally q.stop()
  }
}
