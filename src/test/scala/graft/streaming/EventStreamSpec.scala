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

  private def funnelExpected(
      evs: Seq[(Long, Long, String)]): Map[Long, (Option[Long], Option[Long], Option[Long])] =
    evs.groupBy(_._1).map { case (u, rows) =>
      val t1 = rows.collect { case (_, t, "view") => t }.minOption
      val t2 = t1.flatMap(v =>
        rows.collect { case (_, t, "click") if t > v => t }.minOption)
      val t3 = t2.flatMap(c =>
        rows.collect { case (_, t, "purchase") if t > c => t }.minOption)
      u -> (t1, t2, t3)
    }

  private def lastPerUser(table: String): Map[Long, (Option[Long], Option[Long], Option[Long])] =
    spark.sql(s"SELECT * FROM $table").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val last = rows.maxBy(_.getLong(1))
        def opt(i: Int): Option[Long] =
          if (last.isNullAt(i)) None else Some(last.getLong(i))
        u -> (opt(2), opt(3), opt(4))
      }

  test("streaming funnel equals the batch step times on real events") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-funnel")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.runToMemory(spark, streamDir.toString, "funnel_t",
      EventStream.funnel(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update())
    q.awaitTermination(120000)
    val streamed = lastPerUser("funnel_t")
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val expected = funnelExpected(evs)
    assert(streamed.nonEmpty)
    assert(streamed == expected)
  }

  test("streaming funnel: a late earlier view re-opens discarded-looking clicks") {
    val s = spark
    import s.implicits._
    def n(min: Int, sec: Int = 0) = (min * 60L + sec) * 1000000000L +
      1704067200L * 1000000000L
    val streamDir = java.nio.file.Files.createTempDirectory("graft-funnel2")
    // batch 1: the user's click@5 and purchase@6, and a view@10 — the
    // click precedes the only KNOWN view, so the funnel stalls at view.
    Seq((1L, n(5), 1L, "click", 1.0, "{}"),
      (2L, n(6), 1L, "purchase", 1.0, "{}"),
      (3L, n(10), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(streamDir.resolve("a").toString)
    // batch 2 (arrives later): an EARLIER view@1 — now click@5 and
    // purchase@6 complete the funnel. A min-only click state would have
    // discarded them as ineligible at batch-1 time.
    Seq((4L, n(1), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(streamDir.resolve("b").toString)
    // order the two file sets for maxFilesPerTrigger=1 processing
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(streamDir.resolve(sub).toString)
      d.listFiles().foreach(_.setLastModified(t))
      d.setLastModified(t)
    }
    stamp("a", 1000000L)
    stamp("b", 2000000L)
    val q = EventStream.runToMemory(spark, s"$streamDir/*", "funnel_late",
      EventStream.funnel(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update(),
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val streamed = lastPerUser("funnel_late")
    val expected = Map(1L ->
      (Some(n(1) / 1000L), Some(n(5) / 1000L), Some(n(6) / 1000L)))
    assert(streamed == expected, s"got $streamed")
  }

  test("checkpointed stream killed mid-input resumes and matches batch") {
    // the streaming analogue of ResumableWalk: a stateful aggregation
    // stopped after its first micro-batch must, on restart from the
    // SAME checkpoint, process only the remaining input and converge
    // to the batch answer — state recovery, not reprocessing
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-state")
    val ev = Tables.events(spark, dir)
    def start() = spark.readStream
      .schema(ev.schema)
      .parquet(s"$streamDir/*")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("ckpt_totals")
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // first run sees ONLY file a, drains it, and terminates — its
    // offsets and aggregation state are committed to the checkpoint
    ev.where(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$streamDir/a")
    start().awaitTermination(120000)
    // file b arrives "after the crash"; the restarted query must
    // recover state from the checkpoint and process ONLY b
    ev.where(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$streamDir/b")
    val q2 = start()
    q2.awaitTermination(120000)
    val streamed = spark.sql(
      "SELECT event_type, n_events, total_value FROM ckpt_totals ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(asc("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch),
      s"resumed state diverged: ${streamed.toSeq} vs ${batch.toSeq}")
  }

  test("streaming EWMA re-derives on late-arriving earlier days, equals batch") {
    // EWMA is order-sensitive: micro-batch 1 sees ONLY the later half
    // of the calendar, micro-batch 2 delivers the earlier days "late"
    // (mtime-ordered files, maxFilesPerTrigger=1; the memory sink
    // cannot recover an Update-mode query across restarts, so late
    // data arrives within ONE query) — the state must re-derive the
    // whole curve, converging to the batch ops.Smoothing.ewma.
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ewma")
    val ev = Tables.events(spark, dir)
    val cut = "2024-01-15"
    ev.where(to_date(col("ts")).cast("string") >= cut).coalesce(1)
      .write.parquet(streamDir.resolve("late").toString)
    ev.where(to_date(col("ts")).cast("string") < cut).coalesce(1)
      .write.parquet(streamDir.resolve("early").toString)
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(streamDir.resolve(sub).toString)
      d.listFiles().foreach(_.setLastModified(t))
      d.setLastModified(t)
    }
    stamp("late", 1000000L)
    stamp("early", 2000000L)
    val q = EventStream.runToMemory(spark, s"$streamDir/*", "ewma_daily",
      EventStream.ewmaDaily(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update(),
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)

    val all = spark.sql("SELECT * FROM ewma_daily").collect()
    val byType = all.groupBy(_.getString(0))
    val streamed = byType.map { case (t, rs) =>
      val mx = rs.map(_.getLong(1)).max
      t -> rs.filter(_.getLong(1) == mx)
        .map(r => (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(_._1).toSeq
    }
    // seen (total observations in state) is monotone per key, so rows
    // below the key's max seen are batch-1 emits: they must cover ONLY
    // the later half — proof the early days really arrived late
    val firstBatchDays = byType.toSeq.flatMap { case (t, rs) =>
      val mx = rs.map(_.getLong(1)).max
      rs.filter(_.getLong(1) < mx).map(r => (t, r.getString(2)))
    }
    assert(firstBatchDays.nonEmpty, "everything arrived in one batch")
    assert(firstBatchDays.forall(_._2 >= cut),
      s"batch 1 leaked early days: $firstBatchDays")

    val batch = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .agg(count(lit(1)).as("cnt"))
      .collect().groupBy(_.getString(0)).map { case (t, rs) =>
        t -> graft.ops.Smoothing.ewma(
          rs.map(r => (r.getString(1), r.getLong(2))).toSeq, 8L)
          .map { case (d, c, s, r) => (d, c, s, r) }
      }

    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (t, exp) =>
      assert(streamed(t) == exp, s"type $t diverged after late arrival")
    }
    // the late batch really changed the curve: final states include
    // pre-cut days no batch-1 emit could have carried
    assert(batch.exists(_._2.exists(_._1 < cut)))
  }

  test("streaming Holt twin converges to the batch level/trend curves") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-holt")
    Tables.events(spark, dir).coalesce(1)
      .write.mode("overwrite").parquet(streamDir.toString)
    val q = EventStream.runToMemory(spark, streamDir.toString,
      "holt_daily", EventStream.holtDaily(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update())
    q.awaitTermination(120000)
    val all = spark.sql("SELECT * FROM holt_daily").collect()
    val streamed = all.groupBy(_.getString(0)).map { case (t, rs) =>
      val mx = rs.map(_.getLong(1)).max
      t -> rs.filter(_.getLong(1) == mx)
        .map(r => (r.getString(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))
        .sortBy(_._1).toSeq
    }
    val batch = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .agg(count(lit(1)).as("cnt"))
      .collect().groupBy(_.getString(0)).map { case (t, rs) =>
        t -> graft.ops.Smoothing.holt(
          rs.map(r => (r.getString(1), r.getLong(2))).toSeq, 8L, 4L)
      }
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (t, exp) =>
      assert(streamed(t) == exp, s"type $t diverged")
    }
    // the curves are non-trivial: some type has a nonzero trend
    assert(batch.exists(_._2.exists(_._4 != 0L)))
  }

  test("streaming Holt-Winters twin: late earlier days re-slot the seasonal array") {
    // the seasonal slot of every day is its RANK in the calendar, so
    // a late-arriving earlier day shifts all later days' slots — the
    // case a frozen-state (non-re-deriving) implementation gets wrong
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-hw")
    val ev = Tables.events(spark, dir)
    val cut = "2024-01-10"
    ev.where(to_date(col("ts")).cast("string") >= cut).coalesce(1)
      .write.parquet(streamDir.resolve("late").toString)
    ev.where(to_date(col("ts")).cast("string") < cut).coalesce(1)
      .write.parquet(streamDir.resolve("early").toString)
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(streamDir.resolve(sub).toString)
      d.listFiles().foreach(_.setLastModified(t))
      d.setLastModified(t)
    }
    // "late" file arrives FIRST, the earlier days after — maximal
    // re-slotting pressure
    stamp("late", 1000000L)
    stamp("early", 2000000L)
    val q = EventStream.runToMemory(spark, s"$streamDir/*", "hw_daily",
      EventStream.holtWintersDaily(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update(),
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val all = spark.sql("SELECT * FROM hw_daily").collect()
    val streamed = all.groupBy(_.getString(0)).map { case (t, rs) =>
      val mx = rs.map(_.getLong(1)).max
      t -> rs.filter(_.getLong(1) == mx)
        .map(r => (r.getString(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
        .sortBy(_._1).toSeq
    }
    val batch = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .agg(count(lit(1)).as("cnt"))
      .collect().groupBy(_.getString(0)).map { case (t, rs) =>
        t -> graft.ops.Smoothing.holtWinters(
          rs.map(r => (r.getString(1), r.getLong(2))).toSeq, 7, 8L, 4L, 8L)
      }
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (t, exp) =>
      assert(streamed(t) == exp, s"type $t diverged after late arrival")
    }
    // re-slotting really happened: final curves include pre-cut days
    // no first-batch emit could have carried, and seasonality is live
    assert(batch.exists(_._2.exists(_._1 < cut)))
    assert(batch.exists(_._2.exists(_._5 != 0L)))
  }

  test("streaming burstiness twin equals batch Fano after late days arrive") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-fano")
    val ev = Tables.events(spark, dir)
    val cut = "2024-01-15"
    ev.where(to_date(col("ts")).cast("string") >= cut).coalesce(1)
      .write.parquet(streamDir.resolve("late").toString)
    ev.where(to_date(col("ts")).cast("string") < cut).coalesce(1)
      .write.parquet(streamDir.resolve("early").toString)
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(streamDir.resolve(sub).toString)
      d.listFiles().foreach(_.setLastModified(t))
      d.setLastModified(t)
    }
    stamp("late", 1000000L)
    stamp("early", 2000000L)
    val q = EventStream.runToMemory(spark, s"$streamDir/*", "fano_daily",
      EventStream.burstinessDaily(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update(),
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val all = spark.sql("SELECT * FROM fano_daily").collect()
    val streamed = all.groupBy(_.getString(0)).map { case (t, rs) =>
      val mx = rs.map(_.getLong(1)).max
      t -> rs.filter(_.getLong(1) == mx)
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).head
    }
    // batch truth: the q_burstiness arithmetic over the same table
    val batch = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .agg(count(lit(1)).as("x"))
      .collect().groupBy(_.getString(0)).collect {
        case (t, rs) if rs.length > 1 =>
          val xs = rs.map(_.getLong(2))
          val nd = xs.length.toLong
          val sx = xs.sum
          val sxx = xs.map(x => x * x).sum
          t -> (nd, sx / nd, (nd * sxx - sx * sx) * 1000L / ((nd - 1) * sx))
      }
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (t, exp) =>
      assert(streamed(t) == exp, s"type $t Fano diverged after late days")
    }
    // both halves really contributed: intermediate emits exist
    assert(all.map(_.getLong(1)).distinct.length > 1,
      "everything arrived in one batch")
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

  test("streaming daily-anomaly flags equal batch; unknown users flag; planted spike flags") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-anom")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    // frozen profile: the batch median/MAD (x4 grid) of the SAME
    // period for the first 20 users — everyone else is "unknown"
    val daily = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy(col("user_id"))
      .agg(expr("percentile(n, 0.5D)").as("med"))
    val mad = daily.join(med, Seq("user_id"))
      .withColumn("dev", abs(col("n") - col("med")))
      .groupBy(col("user_id"), col("med"))
      .agg(expr("percentile(dev, 0.5D)").as("mad"))
    val profile = mad.where(col("user_id") < 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1) * 4).toLong, (r.getDouble(2) * 4).toLong)).toMap
    assert(profile.nonEmpty)

    val q = EventStream.runToMemory(spark, streamDir.toString,
      "anom_daily", EventStream.dailyAnomaly(_, profile))
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    val streamed = spark.sql(
      "SELECT user_id, day, n, med_q4, mad_q4, dev_q4, is_anomaly " +
        "FROM anom_daily ORDER BY user_id, day").collect().map(key)
    val batch = EventStream.dailyAnomaly(
        graft.Tables.events(spark, dir), profile)
      .select("user_id", "day", "n", "med_q4", "mad_q4", "dev_q4",
        "is_anomaly")
      .orderBy("user_id", "day").collect().map(key)
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
    // unknown users (>= 20) always flag with the -1 sentinel profile
    assert(streamed.filter(_._1 >= 20).forall(r => r._4 == -1L && r._7 == 1L))
    // planted spike: a day with count far above a known user's median
    // must flag (synthesize via the batch form on a tiny frame)
    import spark.implicits._
    val spike = (1 to 40).map(i =>
      (5L, java.sql.Timestamp.valueOf("2030-01-01 00:00:30"), i))
      .toDF("user_id", "ts", "i")
    val flagged = EventStream.dailyAnomaly(spike, profile)
      .select("is_anomaly").collect().head.getLong(0)
    assert(flagged == 1L, "40-event spike day must flag vs a small median")
  }

  test("stream-stream attribution join equals the batch inequality join") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-attr")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.runToMemory(spark, streamDir.toString, "attr_t",
      EventStream.attributionJoin(_),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Append())
    q.awaitTermination(120000)
    val streamed = spark.sql(
      "SELECT purchase_id, view_id FROM attr_t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.events(spark, dir)
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vt"),
        col("event_id").as("vid"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pt"),
        col("event_id").as("pid"))
    val batch = purchases.join(views,
        col("pu") === col("vu") && col("vt") <= col("pt") &&
          col("pt") < col("vt") + expr("INTERVAL 30 MINUTES"))
      .select("pid", "vid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("stream-stream overlap join equals the batch strict-overlap join") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ovlp")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.runToMemory(spark, streamDir.toString, "ovlp_t",
      EventStream.overlapJoin(_),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Append())
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT click_id, view_id FROM ovlp_t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch reference: the STRICT-OVERLAP inequality join of the same
    // constant-length windows (ls < re AND rs < le with len = 20 min)
    val ev = Tables.events(spark, dir)
    val win = expr("INTERVAL 20 MINUTES")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cs"),
        col("event_id").as("cid"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vs"),
        col("event_id").as("vid"))
    val batch = clicks.join(views,
        col("cu") === col("vu") &&
          col("cs") < col("vs") + win && col("vs") < col("cs") + win)
      .select("cid", "vid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming rate limiter equals the batch earliest-n-per-hour rule") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-rate")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.runToMemory(spark, streamDir.toString, "rate_t",
      EventStream.rateLimit(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update())
    q.awaitTermination(120000)
    val rows = spark.sql("SELECT * FROM rate_t").collect()
    val streamed = rows.groupBy(_.getLong(0)).toSeq.flatMap { case (_, rs) =>
      val maxSeen = rs.map(_.getLong(4)).max
      rs.filter(_.getLong(4) == maxSeen)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    }.toSet
    val batch = graft.SparkEntry.queries("q_rate_limit")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3).toLong)).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming rate limiter: a late earlier event displaces an admitted one") {
    val s = spark
    import s.implicits._
    def n(min: Int) = min * 60L * 1000000000L + 1704067200L * 1000000000L
    val streamDir = java.nio.file.Files.createTempDirectory("graft-rate2")
    // batch 1: six events in one hour — ids 1..6 admitted as 1..5 (6 dropped)
    (1 to 6).map(i => (i.toLong, n(i), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(streamDir.resolve("a").toString)
    // batch 2 (late): an EARLIER event at minute 0 — it must enter the
    // admitted set and push out the minute-5 event.
    Seq((7L, n(0), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(streamDir.resolve("b").toString)
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(streamDir.resolve(sub).toString)
      d.listFiles().foreach(_.setLastModified(t))
      d.setLastModified(t)
    }
    stamp("a", 1000000L)
    stamp("b", 2000000L)
    val q = EventStream.runToMemory(spark, s"$streamDir/*", "rate_late",
      EventStream.rateLimit(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update(),
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val rows = spark.sql("SELECT * FROM rate_late").collect()
    val maxSeen = rows.map(_.getLong(4)).max
    val admitted = rows.filter(_.getLong(4) == maxSeen)
      .sortBy(_.getLong(3)).map(_.getLong(2)).toSeq
    assert(admitted === Seq(7L, 1L, 2L, 3L, 4L), s"got $admitted")
  }

  /** Latest history snapshot per user from the scd2 memory sink:
    * rows carrying each user's max n_seen. */
  private def scd2Snapshot(table: String)
      : Map[Long, Seq[(Long, String, Long, Option[Long], Long)]] =
    spark.sql(s"SELECT * FROM $table").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val maxSeen = rows.map(_.getLong(6)).max
        u -> rows.filter(_.getLong(6) == maxSeen)
          .map(r => (r.getLong(1), r.getString(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
          .sortBy(_._1).toSeq
      }

  test("streaming SCD2 equals the batch history builder on real events") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-scd2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.runToMemory(spark, streamDir.toString, "scd2_t",
      EventStream.scd2(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update())
    q.awaitTermination(120000)
    val streamed = scd2Snapshot("scd2_t")
    val batch = graft.ops.Scd2.fromChangeLog(
      Tables.events(spark, dir).select(col("user_id"),
        unix_micros(col("ts")).as("seq"), col("event_id"),
        col("event_type")),
      "user_id", "seq", "event_id", Seq("event_type"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        u -> rows.map(r => (r.getLong(1), r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
          .sortBy(_._1).toSeq
      }
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming SCD2: a late middle event resurrects a collapsed run") {
    val s = spark
    import s.implicits._
    def n(min: Int) = min * 60L * 1000000000L + 1704067200L * 1000000000L
    val streamDir = java.nio.file.Files.createTempDirectory("graft-scd2l")
    // batch 1: a@1, a@9 — run-collapse keeps only version 1 (a@1).
    Seq((1L, n(1), 1L, "a", 1.0, "{}"), (2L, n(9), 1L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(streamDir.resolve("a").toString)
    // batch 2 (late): b@5 lands BETWEEN them — now a@1, b@5, a@9 are
    // all versions; a frozen greedy collapse would have lost a@9.
    Seq((3L, n(5), 1L, "b", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(streamDir.resolve("b").toString)
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(streamDir.resolve(sub).toString)
      d.listFiles().foreach(_.setLastModified(t))
      d.setLastModified(t)
    }
    stamp("a", 1000000L)
    stamp("b", 2000000L)
    val q = EventStream.runToMemory(spark, s"$streamDir/*", "scd2_late",
      EventStream.scd2(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update(),
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val hist = scd2Snapshot("scd2_late")(1L)
    val us = (m: Int) => n(m) / 1000L
    assert(hist == Seq(
      (1L, "a", us(1), Some(us(5)), 0L),
      (2L, "b", us(5), Some(us(9)), 0L),
      (3L, "a", us(9), None, 1L)), s"got $hist")
  }

  /** Latest session snapshot per user from the sessionize memory sink:
    * rows carrying each user's max n_seen (the re-derivation version). */
  private def sessionSnapshot(table: String)
      : Map[Long, Seq[(Long, Long, Long, Long)]] =
    spark.sql(s"SELECT * FROM $table").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val maxSeen = rows.map(_.getLong(6)).max
        u -> rows.filter(_.getLong(6) == maxSeen)
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
          .sortBy(_._1).toSeq
      }

  test("streaming sessionize equals the batch gap sessionizer") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.runToMemory(spark, streamDir.toString, "sess_t",
      EventStream.sessionize(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update())
    q.awaitTermination(120000)
    val streamed = sessionSnapshot("sess_t")
      .map { case (u, ss) => u -> (ss.length.toLong,
        ss.map(s => s._2 - s._1).sum) }
    // batch twin: same truncated-seconds gap rule as q_sessionize.
    val batch = {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(spark, dir)
        .withColumn("t", unix_timestamp(col("ts")))
        .withColumn("prev", lag(col("t"), 1).over(byUser))
        .withColumn("brk", when(col("prev").isNull ||
          col("t") - col("prev") > 1800, 1L).otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("t")).as("s0"), max(col("t")).as("s1"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum((col("s1") - col("s0")) * 1000).as("dur"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming sessionize: a late event bridges two open sessions") {
    val s = spark
    import s.implicits._
    def n(min: Int) = min * 60L * 1000000000L + 1704067200L * 1000000000L
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sessl")
    // batch 1: events at minute 0 and minute 40 — gap 40 min > 30 min,
    // so the snapshot shows TWO sessions.
    Seq((1L, n(0), 1L, "view", 1.0, "{}"), (2L, n(40), 1L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(streamDir.resolve("a").toString)
    // batch 2 (late): minute 20 lands between them — both gaps are now
    // 20 min, so the sessions MERGE into one. A frozen greedy state
    // (already closed session [0,0]) could never undo the split.
    Seq((3L, n(20), 1L, "view", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(streamDir.resolve("b").toString)
    def stamp(sub: String, t: Long): Unit = {
      val d = new java.io.File(streamDir.resolve(sub).toString)
      d.listFiles().foreach(_.setLastModified(t))
      d.setLastModified(t)
    }
    stamp("a", 1000000L)
    stamp("b", 2000000L)
    val q = EventStream.runToMemory(spark, s"$streamDir/*", "sess_late",
      EventStream.sessionize(spark, _),
      outputMode = org.apache.spark.sql.streaming.OutputMode.Update(),
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val all = spark.sql("SELECT * FROM sess_late").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getLong(5), r.getLong(6)))
    val ms = (m: Int) => n(m) / 1000000L
    // after batch 1 (n_seen=2): two sessions, the last one open.
    assert(all.filter(_._6 == 2L).sortBy(_._1).toSeq == Seq(
      (ms(0), ms(0), 1L, 1.0, 0L, 2L), (ms(40), ms(40), 1L, 2.0, 1L, 2L)),
      s"got ${all.toSeq}")
    // after the late batch (n_seen=3): ONE bridged open session.
    assert(all.filter(_._6 == 3L).toSeq == Seq(
      (ms(0), ms(40), 3L, 7.0, 1L, 3L)), s"got ${all.toSeq}")
  }
}
