package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class EventStreamSpec extends SparkSpec {

  test("streaming hourly totals equal the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    // the streaming file source requires a directory of files
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.runToMemory(spark, streamDir.toString,
      "hourly_totals", EventStream.hourlyTotals)
    q.awaitTermination(120000)
    val streamed = spark.sql(
      "SELECT * FROM hourly_totals ORDER BY hour_epoch, event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    val batch = Tables.events(spark, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(asc("hour_epoch"), asc("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
  }

  test("streaming sliding-window totals equal the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sliding")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.runToMemory(spark, streamDir.toString,
      "sliding_totals", EventStream.slidingTotals)
    q.awaitTermination(120000)
    val streamed = spark.sql(
      "SELECT * FROM sliding_totals ORDER BY win_epoch, event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("win_epoch"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(asc("win_epoch"), asc("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
  }

  test("streaming dedup keeps one row per key, equal to batch distinct") {
    val dir = "/root/testdata/sf0.001"
    // Duplicate the whole source file: every event arrives twice.
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events_a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events_b.parquet"))
    val q = EventStream.runToMemory(spark, streamDir.toString, "deduped",
      df => EventStream.dedupByKey(df, Seq("event_id"), "1 hour")
        .select(col("event_id")),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Append())
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT event_id FROM deduped")
      .collect().map(_.getLong(0))
    val batchIds = graft.Tables.events(spark, dir)
      .select("event_id").collect().map(_.getLong(0))
    assert(streamed.length == batchIds.length,
      s"streamed ${streamed.length} vs batch distinct ${batchIds.length}")
    assert(streamed.toSet == batchIds.toSet)
  }

  test("streaming heavy hitters equal batch exact counts (no-eviction regime)") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-hh")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.runToMemory(spark, streamDir.toString,
      "hot_types", EventStream.topItems(_, "event_type", capacity = 16))
    q.awaitTermination(120000)
    val streamed = spark.sql(
      "SELECT * FROM hot_types ORDER BY est_count DESC, item")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val batch = graft.Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), 0L))
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
  }
}
