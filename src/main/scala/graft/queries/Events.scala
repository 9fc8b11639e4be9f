package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Event-table queries: the per-ID accumulation + time-range semantics
  * from the reference (stats per uid/gid, `--since/--from/--to` ranges,
  * internal/util.go:20-43), plus a batch equivalent of the streaming
  * hourly-window aggregation (see graft.streaming for the
  * Structured Streaming form of the same plan).
  *
  * The events parquet stores TIMESTAMP(NANOS); outputs normalize time
  * to epoch seconds (BIGINT) so Spark and DuckDB hash identically.
  */
object Events {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/A3 per-ID running totals (reference report_stats.go:197-229).
    "q_events_per_user" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"),
          round(max(col("value")), 2).as("max_value"))
        .orderBy(asc("user_id"))
    }),

    // Time-range filter (reference internal/util.go:20-43) + grouped
    // agg; the range lands on the raw int64 nanos so it pushes into
    // the parquet scan (row-group pruning) instead of filtering after
    // the timestamp conversion.
    "q_events_time_range" -> ((s, dir) => {
      eventsRange(s, dir, Some("2024-01-10 00:00:00"), Some("2024-01-20 00:00:00"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(asc("event_type"))
    }),

    // Sessionization in batch: a session breaks after a 30-minute gap;
    // lag + conditional cumulative sum assigns session ids (the
    // streaming twin uses flatMapGroupsWithState, graft.streaming).
    "q_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(asc("user_id"))
    }),

    // Skew-proof two-phase salted aggregation (graft.ops.Skew): same
    // result as a plain groupBy — the oracle proves it — but the wide
    // stage fans each hot key across 8 sub-groups.
    "q_salted_agg" -> ((s, dir) => {
      graft.ops.Skew.saltedAgg(events(s, dir), Seq("event_type"), salts = 8, Seq(
        ("n_events", count(lit(1)), sum(col("n_events"))),
        ("total_value", sum(col("value")), sum(col("total_value"))),
        ("max_value", max(col("value")), max(col("max_value")))))
        .select(col("event_type"), col("n_events"),
          round(col("total_value"), 2).as("total_value"),
          round(col("max_value"), 2).as("max_value"))
        .orderBy(asc("event_type"))
    }),

    // As-of join (graft.ops.AsOfJoin): every purchase aligned to the
    // user's most recent click at-or-before it — one shuffle on
    // user_id, no range-join blowup. Clicks pre-aggregate to one row
    // per (user, ts) so the match is deterministic; the oracle is
    // DuckDB's native ASOF JOIN, proving the union-and-sweep plan
    // implements exactly the textbook semantics.
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("click_value"))
      graft.ops.AsOfJoin.asof(purchases, clicks, "user_id", "ts",
        Seq("click_value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("asof_ts").isNotNull, 1L).otherwise(0L)).as("n_matched"),
          coalesce(round(sum(col("asof_click_value")), 2), lit(0.0))
            .as("matched_value"))
        .orderBy(asc("user_id"))
    }),

    // Arrival burstiness per event type — the Fano factor
    // (variance/mean) of daily counts: 1000 milli ≈ Poisson,
    // above = bursty, below = regular. The capacity-planning scalar
    // for stream sizing. One daily pre-aggregate onto the bounded
    // calendar axis, then exact integer moments and ONE nonneg
    // floor division: fano = (n·Σx² − (Σx)²) / ((n−1)·Σx).
    "q_burstiness" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d"))
        .agg(count(lit(1)).as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .where(col("n_days") > 1)
        .select(col("event_type"), col("n_days"),
          expr("sx div n_days").as("mean_per_day"),
          expr("""(n_days * sxx - sx * sx) * 1000
                  div ((n_days - 1) * sx)""").as("fano_milli"))
        .orderBy(asc("event_type"))
    }),

    // The SAME as-of semantics through the custom PHYSICAL operator
    // (plans/AsOfMergeJoin: logical node -> planner strategy ->
    // co-partitioned merge exec) — the driver's hash gate proves the
    // whole extension path end-to-end against DuckDB's native ASOF
    // JOIN. Identity with the union-sweep form is additionally
    // asserted row-for-row in AsOfMergeJoinSpec.
    "q_asof_merge" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("click_value"))
      graft.plans.AsOfMergeJoin.asof(purchases, clicks, "user_id", "ts",
        Seq("click_value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("asof_ts").isNotNull, 1L).otherwise(0L)).as("n_matched"),
          coalesce(round(sum(col("asof_click_value")), 2), lit(0.0))
            .as("matched_value"))
        .orderBy(asc("user_id"))
    }),

    // STRING-keyed as-of through the same physical merge exec — the
    // reference-shaped use (paths as keys). The exec's general path
    // compares projected UnsafeRows under the natural (binary UTF8)
    // ordering; the long fast path covers q_asof_merge above.
    "q_asof_merge_str" -> ((s, dir) => {
      val ev = events(s, dir)
      val skey = format_string("u%03d", pmod(col("user_id"), lit(50L)))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(skey.as("ukey"), col("ts"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .select(skey.as("ukey"), col("ts"), col("value"))
        .groupBy(col("ukey"), col("ts"))
        .agg(max(col("value")).as("click_value"))
      graft.plans.AsOfMergeJoin.asof(purchases, clicks, "ukey", "ts",
        Seq("click_value"))
        .groupBy(col("ukey"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("asof_ts").isNotNull, 1L).otherwise(0L)).as("n_matched"),
          coalesce(round(sum(col("asof_click_value")), 2), lit(0.0))
            .as("matched_value"))
        .orderBy(asc("ukey"))
    }),

    // Interval range join (graft.ops.RangeJoin): events vs overlapping
    // campaign windows (stride 3 d, length 5 d — most events match two
    // campaigns), bucketed into 5-day bins so the plan is an EQUI-join
    // both sides shuffle into, not the BroadcastNestedLoopJoin a bare
    // `p BETWEEN start AND end` would plan. The oracle is the plain
    // inequality join.
    "q_range_join" -> ((s, dir) => {
      val epoch0 = 1704067200L // 2024-01-01 00:00:00 UTC
      val campaigns = s.range(10).select(
        col("id").as("campaign_id"),
        (lit(epoch0) + col("id") * (3L * 86400)).as("start_epoch"),
        (lit(epoch0) + col("id") * (3L * 86400) + 5L * 86400).as("end_epoch"))
      val points = events(s, dir)
        .select(unix_timestamp(col("ts")).as("p_epoch"), col("value"))
      graft.ops.RangeJoin.byBinning(points, "p_epoch",
        campaigns, "start_epoch", "end_epoch", binWidth = 5L * 86400)
        .groupBy(col("campaign_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(asc("campaign_id"))
    }),

    // SLIDING windows (1 h window, 15 min slide): every event lands in
    // 4 overlapping windows — the smoothing shape streaming dashboards
    // use. Spark's window() explodes each row into its windows before
    // ONE partial+final aggregate (replication factor = window/slide =
    // 4, bounded by the ratio, never by data volume). The oracle
    // rebuilds the same epoch-aligned window-start series and joins —
    // proving Spark's window assignment to the second.
    "q_events_sliding" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .select(unix_timestamp(col("window.start")).as("win_epoch"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy(asc("win_epoch"), asc("event_type"))
        .limit(300)
    }),

    // Batch form of the streaming hourly tumbling-window aggregation.
    "q_events_hourly" -> ((s, dir) => {
      events(s, dir)
        .groupBy(
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(asc("hour_epoch"), asc("event_type"))
        .limit(200)
    }),

    // Ordered funnel: users whose first view is STRICTLY followed by a
    // click, then a purchase (each step's timestamp strictly after the
    // previous step's). Step k+1 needs step k's per-user min timestamp,
    // which exists only after all of step k is seen — so the funnel is
    // inherently multi-pass; the scale-shape lever is that every
    // intermediate is ≤ |users| rows, so each pass is "filtered events
    // groupBy user_id" (event_type pushes into the scan) with the
    // previous step BROADCAST into it. Nothing wide ever shuffles: the
    // corpus-sized frames only aggregate, never join each other.
    "q_funnel" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_type"))
      def step(of: String, prev: DataFrame, prevT: String, t: String) =
        ev.where(col("event_type") === of)
          .join(broadcast(prev), "user_id")
          .where(col("ts") > col(prevT))
          .groupBy(col("user_id")).agg(min(col("ts")).as(t))
      val t1 = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = step("click", t1, "t1", "t2")
      val t3 = step("purchase", t2, "t2", "t3")
      def row(n: Int, name: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n_users"))
          .select(lit(n).as("step"), lit(name).as("event_type"),
            col("n_users"))
      row(1, "view", t1)
        .unionByName(row(2, "click", t2))
        .unionByName(row(3, "purchase", t3))
        .orderBy(asc("step"))
    }),

    // Retention cohorts: users grouped by first-active day, counted on
    // each later active day. `act` is distinct (user, day) — ONE
    // groupBy-shaped shuffle of the events table; the per-user cohort
    // frame (≤ |users| rows) broadcasts back into it, and the final
    // aggregate is bounded by days². A count_distinct(user) would plan
    // an Expand — distinct-ing (user, day) FIRST makes the final count
    // a plain count.
    "q_retention" -> ((s, dir) => {
      val act = events(s, dir)
        .select(col("user_id"),
          unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"))
        .distinct()
      val coh = act.groupBy(col("user_id"))
        .agg(min(col("day_epoch")).as("cohort_epoch"))
      act.join(broadcast(coh), "user_id")
        .groupBy(col("cohort_epoch"),
          expr("(day_epoch - cohort_epoch) div 86400").as("offset_days"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(asc("cohort_epoch"), asc("offset_days"))
    }),

    // Mergeable-sketch rollup (ops.SketchRollup): one DataSketches
    // HLL sketch per day of user_id, then every range-distinct
    // question is a kilobyte-sized sketch merge — the materialized
    // sketch-column pattern for 100 TB dashboards (build day grains
    // once at ingest; never rescan raw events). Rows-only driver
    // check (the oracle engine has no DataSketches); accuracy is
    // gated in Verify (hll_rollup_relerr, ≤5% worst-case vs exact)
    // and SketchRollupSpec.
    "q_hll_rollup" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val sk = graft.ops.SketchRollup.sketches(ev, Seq("day"), "user_id")
      val perDay = graft.ops.SketchRollup.rollup(sk, Seq("day"))
        .select(col("day").cast("string").as("day"), col("est_distinct"))
      val total = graft.ops.SketchRollup.rollup(sk, Nil)
        .select(lit("ALL").as("day"), col("est_distinct"))
      perDay.unionByName(total).orderBy(asc("day"))
    }),

    // HASH-EXACT HLL twin (ops/HllGrid — Flajolet et al. 2007 on the
    // 52-bit md5 prefix): the same register-per-day mergeable pattern
    // as q_hll_rollup, but the hash, bucket, rank, register max and
    // the floor-once estimate chain are expressions BOTH engines
    // compute identically — the per-day estimates AND the ALL row
    // (register union by max) replay in DuckDB. The DataSketches tier
    // above stays the production path (HLL++ bias correction).
    "q_hll_rollup_twin" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))
      val regs = graft.ops.HllGrid.registers(ev, Seq("day"), "user_id")
        .localCheckpoint(true) // consumed by per-day AND the ALL merge
      val perDay = graft.ops.HllGrid.estimate(regs, Seq("day"))
      val total = graft.ops.HllGrid.estimate(regs, Nil)
        .select(lit("ALL").as("day"), col("est_distinct"))
      perDay.unionByName(total).orderBy(asc("day"))
    }),

    // Bounded RANGE-frame moving aggregate: per-user trailing-hour
    // event count and value sum, evaluated at every event. The frame
    // is TIME-bounded (3600 s preceding), so window state stays
    // O(events-in-an-hour) per user however long the history — the
    // legitimate window shape, unlike the unbounded low-cardinality
    // windows the build notes ban. Partitioning by user_id scales
    // with the user population; the frame arithmetic runs on epoch
    // seconds (exact BIGINT) on both engines.
    "q_events_moving" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-3600, Window.currentRow)
      events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("n_win", count(lit(1)).over(w))
        .withColumn("sum_win", round(sum(col("value")).over(w), 2))
        .select(col("event_id"), col("user_id"), col("n_win"), col("sum_win"))
        .orderBy(asc("event_id"))
    }),

    // Distribution-drift monitor: grid-KS distance between the first
    // and second half-month's per-type value distributions, computed
    // entirely from one KLL sketch row per (type, cohort) — the
    // batch-quality gate a continuous ingest pipeline runs (rows-only;
    // sensitivity and null behavior are asserted in
    // QuantileSketchSpec).
    "q_drift" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type"), col("ts"), col("value"))
      val cut = lit("2024-01-15").cast("timestamp")
      graft.ops.QuantileSketch.drift(
          ev.where(col("ts") < cut), ev.where(col("ts") >= cut),
          "value", Seq("event_type"))
        .orderBy(asc("event_type"))
    }),

    // HASH-EXACT drift twin (ops/QuantileSketch.driftGrid): exact KS
    // between the same two cohorts on a declared 4096-bin integer
    // grid — values floor once to cents, binned CDFs are exact
    // integer counts, the KS gap is an integer cross-multiply, and
    // the per-group cumulative window is bounded by the GRID (≤4096
    // rows/group at any SF). Makes the drift DECISION oracle-
    // replayable; the KLL tier above stays the sketch-mergeable scale
    // path.
    "q_drift_grid" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type"), col("ts"), col("value"))
      val cut = lit("2024-01-15").cast("timestamp")
      graft.ops.QuantileSketch.driftGrid(
          ev.where(col("ts") < cut), ev.where(col("ts") >= cut),
          "value", Seq("event_type"))
        .orderBy(asc("event_type"))
    }),

    // Mergeable KLL quantile rollup — the quantile analogue of
    // q_hll_rollup: one sketch row per (event_type, day) grain, then
    // per-type p50/p90/p99 from merging each type's day rows. At
    // 100 TB the raw scan happens once per grain; every later range
    // question touches kilobytes (approximate; rows-only — rank-error
    // bounds are asserted in QuantileSketchSpec and re-checked
    // against the exact profiler by the kll_rollup_rankerr Verify
    // gate). Values round to 2dp only for display.
    "q_quantile_rollup" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      val sk = ev.groupBy(col("event_type"), col("day"))
        .agg(graft.ops.QuantileSketch.sketch(col("value")).as("sketch"))
      graft.ops.QuantileSketch.rollup(sk, Seq("event_type"),
          Seq(0.5, 0.9, 0.99))
        .select(col("event_type"), round(col("p5000bp"), 2).as("p50"),
          round(col("p9000bp"), 2).as("p90"), round(col("p9900bp"), 2).as("p99"))
        .orderBy(asc("event_type"))
    }),

    // HASH-EXACT mergeable-quantile twin (ops/QuantileSketch
    // .gridHistogram/gridQuantileRollup): fixed 4096-bin histogram
    // rows per (event_type, day) grain — grains merge by SUMMING
    // exact integer counts — then per-type p50/p90/p99 read off the
    // merged CDF at the ⌈p·n⌉ integer rank (no floats anywhere).
    // Value error is bounded by one bin width, rank error zero at
    // bin granularity; the KLL tier above stays the unknown-range
    // production path.
    "q_quantile_rollup_twin" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("value"))
      val hist = graft.ops.QuantileSketch.gridHistogram(ev,
        Seq("event_type", "day"), "value")
      graft.ops.QuantileSketch.gridQuantileRollup(hist,
          Seq("event_type"), Seq(5000, 9000, 9900))
        .orderBy(asc("event_type"), asc("p_bp"))
    }),

    // Time-series gap-fill (ops/GapFill): per-user daily activity
    // completed to a dense calendar over each user's own observed
    // span, with the last observed level carried across gaps. The
    // calendar explode is bounded per key; the carry-forward window
    // partitions by the HIGH-cardinality user — no global sort, no
    // low-cardinality skew. The carried metric is an integer
    // (floor(max·100)), so the oracle compares exactly.
    "q_gap_fill" -> ((s, dir) => {
      graft.ops.GapFill.dailyActivity(events(s, dir), "user_id",
          col("ts"), col("value"))
        .withColumn("day", col("day").cast("string"))
        .orderBy(asc("user_id"), asc("day"))
    }),

    // Robust per-key anomaly flags: a user's daily event count is
    // anomalous when it deviates from that user's MEDIAN daily count
    // by more than 3× the MAD (median absolute deviation) — the
    // robust z-score every data-quality monitor runs. Two grouped
    // aggregates keyed by the high-cardinality user (the per-group
    // percentile runs over ≤ span-days small integers — not the
    // banned high-cardinality-double shape). All outputs ride an
    // integer quarter-grid (counts are ints, medians land on .5, MADs
    // on .25), so ×4 makes every emitted column integer-exact.
    "q_anomaly_mad" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val med = daily.groupBy(col("user_id"))
        .agg(expr("percentile(n, 0.5D)").as("med"))
      val dev = daily.join(med, Seq("user_id"))
        .withColumn("dev", abs(col("n") - col("med")))
      val mad = dev.groupBy(col("user_id"))
        .agg(expr("percentile(dev, 0.5D)").as("mad"))
      dev.join(mad, Seq("user_id"))
        .select(col("user_id"), col("day").cast("string").as("day"), col("n"),
          (col("med") * 4).cast("long").as("med_q4"),
          (col("dev") * 4).cast("long").as("dev_q4"),
          (col("mad") * 4).cast("long").as("mad_q4"),
          when(col("dev") > col("mad") * 3, 1L).otherwise(0L)
            .as("is_anomaly"))
        .orderBy(asc("user_id"), asc("day"))
    }),

    // Semi-structured JSON parsing: one explicit-schema from_json per
    // row (codegen'd Jackson parse, vs get_json_object's re-parse per
    // extracted field), then a plain aggregate — the "props bag"
    // ingestion shape for event streams whose payload schema is known.
    "q_json_props" -> ((s, dir) => {
      val k = from_json(col("props"), org.apache.spark.sql.types
        .StructType(Seq(org.apache.spark.sql.types
          .StructField("k", org.apache.spark.sql.types.IntegerType))))
        .getField("k")
      events(s, dir)
        .select(col("event_type"), k.as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(when(col("k") >= 50, 1L).otherwise(0L)).as("n_hi"))
        .orderBy(asc("event_type"))
    }),

    // PHYSICAL keyed interval-overlap join
    // (plans/IntervalSweepJoin — the second whole-operator Catalyst
    // extension): per customer, which of their 30-day order windows
    // overlap across the even/odd order-key halves. One exchange +
    // sort per side, then a per-co-partition start-order sweep whose
    // working set is the true concurrent-overlap count — no bin
    // width to tune and no bin-exploded shuffle rows, vs
    // overlapByBinning below. Oracle: the plain inequality join.
    // Spec (IntervalSweepJoinSpec) pins row-for-row parity with the
    // inequality join incl. empty intervals, dup groups, self-scan
    // re-aliasing, timestamp bounds.
    "q_interval_overlap_merge" -> ((s, dir) => {
      val win = 30L * 86400
      val o = orders(s, dir).select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("st"))
      val l = o.where(col("o_orderkey") % 2 === 0)
        .select(col("o_custkey"), col("o_orderkey").as("l_okey"),
          col("st").as("ls"), (col("st") + win).as("le"))
      val r = o.where(col("o_orderkey") % 2 === 1)
        .select(col("o_custkey"), col("o_orderkey").as("r_okey"),
          col("st").as("rs"), (col("st") + win).as("re"))
      graft.plans.IntervalSweepJoin.overlap(l, r, Seq("o_custkey"),
          "ls", "le", "rs", "re", Seq("r_okey"))
        .select(col("o_custkey"), col("l_okey"),
          col("iv_r_okey").as("r_okey"),
          (least(col("le"), col("iv_end")) -
            greatest(col("ls"), col("iv_start"))).as("ov_secs"))
        .orderBy(asc("o_custkey"), asc("l_okey"), asc("r_okey"))
    }),

    // Interval×interval OVERLAP join (ops/RangeJoin.overlapByBinning):
    // each user's first-activity window vs the staggered campaign
    // windows — both sides binned, equi-join on the bin, each pair
    // emitted from its canonical shared bin (no distinct pass). The
    // oracle is the plain inequality join.
    "q_interval_overlap" -> ((s, dir) => {
      val epoch0 = 1704067200L // 2024-01-01 00:00:00 UTC
      val campaigns = s.range(10).select(
        col("id").as("campaign_id"),
        (lit(epoch0) + col("id") * (3L * 86400)).as("c_start"),
        (lit(epoch0) + col("id") * (3L * 86400) + 5L * 86400).as("c_end"))
      val userWin = events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(unix_timestamp(col("ts"))).as("u_start"))
        .withColumn("u_end", col("u_start") + 2L * 86400)
      graft.ops.RangeJoin.overlapByBinning(
          userWin, "u_start", "u_end",
          campaigns, "c_start", "c_end", binWidth = 5L * 86400)
        .select(col("user_id"), col("campaign_id"),
          greatest(col("u_start"), col("c_start")).as("ov_start"),
          least(col("u_end"), col("c_end")).as("ov_end"))
        .withColumn("ov_secs", col("ov_end") - col("ov_start"))
        .orderBy(asc("user_id"), asc("campaign_id"))
    }),

    // Built-in session_window sessionization — the declarative twin
    // of the lag-based q_sessionize (which uses truncated-seconds
    // gaps for its oracle; session_window is micros-precise with a
    // `gap >= 30min` split, so the oracle here mirrors that exact
    // rule). One shuffle; Spark merges overlapping per-event windows
    // inside the aggregate.
    "q_session_window" -> ((s, dir) => {
      events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_ev"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n_ev")).as("n_events"))
        .orderBy(asc("user_id"))
    }),

    // Ingest rate limiting: keep each user's EARLIEST 5 events per
    // hour (the "cap each source at N docs per window" admission
    // rule). Ranked through the bounded-heap TopK — the shuffle
    // carries ≤ 5 rows per (user, hour, partition); epoch micros fit
    // a double exactly (< 2^53) so the heap's numeric score is exact.
    "q_rate_limit" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      graft.ops.TopK.byScore(
          ev.withColumn("__s", -col("ts_us").cast("double"))
            .select(col("user_id"), col("hour_epoch"), col("__s"),
              col("event_id")),
          Seq("user_id", "hour_epoch"), "__s", "event_id", 5)
        .select(col("user_id"), col("hour_epoch"), col("event_id"),
          col("rk"))
        .orderBy(asc("user_id"), asc("hour_epoch"), asc("rk"))
    }),

    // Week-over-week change rates per event type: aggregate to ISO
    // weeks first (the window then runs over the TINY weekly frame,
    // ~5 types × 5 weeks, partitioned by type), lag one week, emit
    // integer basis points via floor div. The week label is a VARCHAR
    // date on both engines per the day-column rule.
    "q_wow_change" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val weekly = events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
      weekly
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        // ratio-minus-10000 keeps the floor div on a NONNEGATIVE
        // numerator: Spark `div` truncates toward zero while DuckDB
        // `//` floors, and they only agree when the quotient is >= 0
        .withColumn("delta_bp",
          expr("n * 10000L div prev_n") - lit(10000L))
        .select(col("event_type"), col("week").cast("string").as("week"),
          col("n"), col("prev_n"), col("delta_bp"))
        .orderBy(asc("event_type"), asc("week"))
    }),

    // Key-skew diagnostic: all-integer Gini / top-share / exact-value
    // median of the per-user event counts — the measurement behind
    // the salt-or-not decision, engine-exact by construction.
    "q_skew_report" -> ((s, dir) =>
      graft.ops.SkewReport.of(events(s, dir), "user_id")),

    // SCD2 history build: each user's event_type change log becomes
    // versioned [valid_from, valid_to) intervals with an open current
    // row — run-collapse + interval assembly in ops/Scd2. Sequence is
    // epoch MICROS (exact on both engines), ties broken by event_id.
    "q_scd2_history" -> ((s, dir) => {
      val log = events(s, dir).select(col("user_id"),
        unix_micros(col("ts")).as("seq_us"), col("event_id"),
        col("event_type"))
      graft.ops.Scd2.fromChangeLog(log, "user_id", "seq_us", "event_id",
          Seq("event_type"))
        .withColumnRenamed("valid_from", "valid_from_us")
        .withColumnRenamed("valid_to", "valid_to_us")
        .orderBy(asc("user_id"), asc("version"))
    }),

    // First-order Markov transition matrix over each user's ordered
    // event stream: count (prev_type -> event_type) transitions and
    // the per-row transition probability in integer basis points
    // (floor div on a nonnegative numerator — the engine-exact ratio
    // recipe). One window shuffle partitioned by user_id (high
    // cardinality at scale), one 25-row aggregate; the row-total join
    // broadcasts a type-squared-sized frame.
    "q_event_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy(col("prev_type"))
        .agg(sum(col("n")).as("row_n"))
      pairs.join(broadcast(totals), "prev_type")
        .select(col("prev_type"), col("event_type"), col("n"),
          expr("n * 10000L div row_n").as("p_bp"))
        .orderBy(asc("prev_type"), asc("event_type"))
    }),

    // Funnel latency: per-user seconds from first 'view' to the first
    // subsequent 'purchase', bucketed by hour on an all-integer grid
    // (epoch MICROS diff, floor div — nonnegative by construction).
    // Same broadcast-step shape as q_funnel; no windows.
    "q_time_to_convert" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_type"))
      val t1 = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val lat = ev.where(col("event_type") === "purchase")
        .join(broadcast(t1), "user_id")
        .where(col("ts") > col("t1"))
        .groupBy(col("user_id"), col("t1"))
        .agg(min(unix_micros(col("ts"))).as("tc_us"))
        .select(col("user_id"),
          expr("(tc_us - unix_micros(t1)) div 1000000").as("latency_s"))
      lat.groupBy(expr("latency_s div 3600").as("hour_bucket"))
        .agg(count(lit(1)).as("n_users"),
          min(col("latency_s")).as("min_s"),
          max(col("latency_s")).as("max_s"))
        .orderBy(asc("hour_bucket"))
    }),

    // Top event-type trigram paths: the 20 most common ordered
    // 3-step sequences across user streams (the "what do users
    // actually do" path query). Two lags over the same per-user
    // window — ONE shuffle — then a ≤|types|³ aggregate and a
    // TakeOrdered top-k, never a global sort.
    "q_event_paths" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("s3"))
        .withColumn("s2", lag(col("s3"), 1).over(w))
        .withColumn("s1", lag(col("s3"), 2).over(w))
        .where(col("s1").isNotNull)
        .groupBy(col("s1"), col("s2"), col("s3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("s1"), asc("s2"), asc("s3"))
        .limit(20)
    }),

    // A/B experiment readout: deterministic md5-coin arm assignment
    // (bit-reproducible, engine-exact via the hex-prefix recipe),
    // conversion = any purchase event; rates in integer basis points
    // (floor div on nonnegative counts). One distinct-users pass, one
    // tiny aggregate — no windows, no skew.
    "q_ab_lift" -> ((s, dir) => {
      val users = events(s, dir)
        .groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("long"))
          .as("converted"))
        .withColumn("arm",
          conv(substring(md5(concat(lit("ab1|"), col("user_id"))), 1, 13),
            16, 10).cast("long") % 2)
      users.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("converted")).as("n_converted"))
        .withColumn("conv_bp", expr("n_converted * 10000L div n_users"))
        .orderBy(asc("arm"))
    }),

    // Seasonal-naive forecast evaluation: predict each hour's event
    // count by the same hour one day earlier, report per-type MAE in
    // milli-units (all-integer — counts subtract exactly, floor div).
    // The day-back lookup is a self-join on the shifted hour key
    // (hours missing a day-ago observation are excluded by the inner
    // join, declaredly). One aggregate + one equi self-join on a
    // pre-aggregated ≤|types|·|hours| frame — never raw events twice.
    "q_forecast_eval" -> ((s, dir) => {
      val hourly = events(s, dir)
        .groupBy(col("event_type"),
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // consumed by both sides of the shift join
      val joined = hourly.as("now")
        .join(hourly.select(col("event_type"),
          (col("hour_epoch") + 86400L).as("hour_epoch"),
          col("n").as("n_pred")).as("prev"),
          Seq("event_type", "hour_epoch"))
      joined
        .select(col("event_type"),
          greatest(col("n") - col("n_pred"), col("n_pred") - col("n"))
            .as("abs_err"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"), sum(col("abs_err")).as("sum_err"))
        .select(col("event_type"), col("n_hours"),
          expr("sum_err * 1000L div n_hours").as("mae_milli"))
        .orderBy(asc("event_type"))
    }),

    // Inter-arrival time distribution per event type: per-user
    // consecutive gaps in exact integer seconds, histogrammed by bit
    // length (the engine-exact power-of-two bucket). One per-user
    // window shuffle, one bounded aggregate.
    "q_interarrival" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .where(col("prev_us").isNotNull)
        .select(col("event_type"),
          expr("(us - prev_us) div 1000000").as("gap_s"))
        .groupBy(col("event_type"),
          expr("CAST(length(conv(greatest(gap_s, 1), 10, 2)) AS BIGINT) - 1")
            .as("log2_bucket"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_s")).as("min_s"), max(col("gap_s")).as("max_s"))
        .orderBy(asc("event_type"), asc("log2_bucket"))
    }),

    // Cohort LTV curves: users grouped by first-active week, purchase
    // revenue accumulated by weeks-since-signup. Revenue sums to
    // integer CENTS (floor of value*100 — exact merges, no float
    // accumulation order); the cumulative curve is a running window
    // over the ≤|cohorts|×|weeks| pre-aggregated frame, partitioned
    // by cohort — never over raw events.
    "q_ltv_cohorts" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
      val firstSeen = ev.groupBy(col("user_id"))
        .agg(min(date_trunc("week", col("ts"))).as("cohort_week"))
      val rev = ev.where(col("event_type") === "purchase")
        .join(broadcast(firstSeen), "user_id")
        .groupBy(unix_timestamp(col("cohort_week")).as("cohort_epoch"),
          expr("""(unix_micros(date_trunc('week', ts))
                 | - unix_micros(cohort_week))
                 | div 604800000000""".stripMargin).as("week_idx"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("rev_c"))
      val w = Window.partitionBy(col("cohort_epoch"))
        .orderBy(col("week_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.withColumn("cum_rev_c", sum(col("rev_c")).over(w))
        .select(col("cohort_epoch"), col("week_idx"), col("n_purchases"),
          col("rev_c"), col("cum_rev_c"))
        .orderBy(asc("cohort_epoch"), asc("week_idx"))
    }),

    // Activity seasonality matrix: hour-of-day × day-of-week event
    // share in basis points — one aggregate over ≤ 7×24 cells plus a
    // broadcast grand total.
    "q_seasonality" -> ((s, dir) => {
      val cells = events(s, dir)
        // weekday()+1 == ISO dow (1=Monday), pairing DuckDB's isodow —
        // Spark dayofweek() is 1=Sunday and DuckDB dayofweek() is
        // 0=Sunday, a cross-engine off-by-one trap
        .groupBy(expr("weekday(ts) + 1").cast("long").as("dow"),
          hour(col("ts")).cast("long").as("hod"))
        .agg(count(lit(1)).as("n_events"))
      cells.crossJoin(broadcast(
          cells.agg(sum(col("n_events")).as("total"))))
        .select(col("dow"), col("hod"), col("n_events"),
          expr("n_events * 10000L div total").as("share_bp"))
        .orderBy(asc("dow"), asc("hod"))
    })
  )

  def oracle: Map[String, String] = Map(
    // md5-HLL replay: bucket/rank from the 52-bit prefix, register
    // max per (day, bucket), union-by-max for the ALL row, exact
    // integer T = Σ2^(50−M), floor-once estimate branches.
    "q_hll_rollup_twin" ->
      """WITH h AS (
        |  SELECT ts::DATE::VARCHAR AS day,
        |    ('0x' || substr(md5('hll|' || user_id::VARCHAR),
        |      1, 13))::BIGINT AS h
        |  FROM events),
        |r AS MATERIALIZED (
        |  SELECT day, h & 255 AS bucket,
        |    max(CASE WHEN (h >> 8) = 0 THEN 45
        |        ELSE 45 - length(bin(h >> 8)) END)::BIGINT AS m_rho
        |  FROM h GROUP BY 1, 2),
        |ra AS (SELECT bucket, max(m_rho) AS m_rho FROM r GROUP BY 1),
        |g AS (
        |  SELECT day,
        |    sum(1::BIGINT << CAST(50 - m_rho AS INT))::BIGINT AS tp,
        |    count(*)::BIGINT AS np
        |  FROM r GROUP BY 1
        |  UNION ALL
        |  SELECT 'ALL' AS day,
        |    sum(1::BIGINT << CAST(50 - m_rho AS INT))::BIGINT AS tp,
        |    count(*)::BIGINT AS np
        |  FROM ra),
        |e AS (
        |  SELECT day, tp + (256 - np) * (1::BIGINT << 50) AS t,
        |    256 - np AS v
        |  FROM g)
        |SELECT day,
        |  CASE WHEN v > 0 AND
        |      (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE
        |        / 256.0::DOUBLE)) * 256.0::DOUBLE * 256.0::DOUBLE
        |        * 1125899906842624::DOUBLE / t::DOUBLE <= 640.0::DOUBLE
        |    THEN floor(256.0::DOUBLE * ln(256.0::DOUBLE / v::DOUBLE))
        |    ELSE floor((0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE
        |        / 256.0::DOUBLE)) * 256.0::DOUBLE * 256.0::DOUBLE
        |        * 1125899906842624::DOUBLE / t::DOUBLE)
        |  END::BIGINT AS est_distinct
        |FROM e ORDER BY day""".stripMargin,
    // Grid-histogram quantile replay: the per-day grains sum to the
    // same per-type bin counts, so the oracle bins directly; integer
    // ceil rank, first bin reaching it, lower-edge value in cents.
    "q_quantile_rollup_twin" ->
      """WITH v AS (
        |  SELECT event_type, floor(value::DOUBLE * 100)::BIGINT AS v
        |  FROM events),
        |mm AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
        |m AS (
        |  SELECT event_type,
        |    ((v - lo) * 4095) // greatest(hi - lo, 1) AS bin,
        |    count(*)::BIGINT AS c
        |  FROM v, mm GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, bin, c,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY bin)::BIGINT
        |      AS cum
        |  FROM m),
        |tot AS (SELECT event_type, sum(c)::BIGINT AS n FROM m GROUP BY 1),
        |pp AS (SELECT unnest([5000, 9000, 9900])::BIGINT AS p_bp),
        |sel AS (
        |  SELECT c2.event_type, pp.p_bp,
        |    min(CASE WHEN c2.cum >= (pp.p_bp * t.n + 9999) // 10000
        |        THEN c2.bin END)::BIGINT AS q_bin
        |  FROM cum c2 JOIN tot t ON c2.event_type = t.event_type, pp
        |  GROUP BY 1, 2)
        |SELECT s.event_type, s.p_bp, s.q_bin,
        |  (mm.lo + s.q_bin * (mm.hi - mm.lo) // 4095)::BIGINT
        |    AS q_value_cent
        |FROM sel s, mm
        |ORDER BY event_type, p_bp""".stripMargin,
    // Exact binned-KS replay: cent-floored values, 4096 equi-width
    // bins over the global span, integer CDF cross-multiply, HUGEINT
    // products cast back ::BIGINT.
    "q_drift_grid" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0
        |      END::BIGINT AS isa,
        |    floor(value::DOUBLE * 100)::BIGINT AS v
        |  FROM events),
        |mm AS (SELECT min(v) AS lo, max(v) AS hi FROM base),
        |cells AS (
        |  SELECT event_type,
        |    ((v - lo) * 4095) // greatest(hi - lo, 1) AS bin,
        |    sum(isa)::BIGINT AS na, sum(1 - isa)::BIGINT AS nb
        |  FROM base, mm GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, bin, na, nb,
        |    sum(na) OVER (PARTITION BY event_type ORDER BY bin)::BIGINT AS ca,
        |    sum(nb) OVER (PARTITION BY event_type ORDER BY bin)::BIGINT AS cb
        |  FROM cells),
        |tot AS (
        |  SELECT event_type, sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b
        |  FROM cells GROUP BY 1),
        |ks AS (
        |  SELECT c.event_type,
        |    max(abs(c.ca::HUGEINT * t.n_b - c.cb::HUGEINT * t.n_a)) AS g,
        |    max(t.n_a) AS n_a, max(t.n_b) AS n_b
        |  FROM cum c JOIN tot t ON c.event_type = t.event_type
        |  GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN 10000::BIGINT
        |    ELSE ((g * 10000) // (n_a::HUGEINT * n_b))::BIGINT END AS ks_bp
        |FROM ks ORDER BY event_type""".stripMargin,
    "q_events_moving" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_win,
        |  round(sum(value) OVER w, 2) AS sum_win
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)::BIGINT
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_events_per_user" ->
      """SELECT user_id, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value,
        |  round(max(value), 2) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_events_time_range" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value,
        |  round(max(value), 2) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sessionize" ->
      """WITH seq AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |         OR epoch(ts)::BIGINT - epoch(prev_ts)::BIGINT > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM seq)
        |SELECT user_id, sum(new_session)::BIGINT AS n_sessions, count(*) AS n_events
        |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.user_id, count(*) AS n_purchases,
        |  sum(CASE WHEN c.ts IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_matched,
        |  coalesce(round(sum(c.click_value), 2), 0.0) AS matched_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_burstiness" ->
      """WITH daily AS (
        |  SELECT event_type, ts::DATE::VARCHAR AS d, count(*)::BIGINT AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, count(*)::BIGINT AS n_days,
        |    sum(x)::BIGINT AS sx, sum(x * x)::BIGINT AS sxx
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days,
        |  (sx // n_days)::BIGINT AS mean_per_day,
        |  ((n_days * sxx - sx * sx) * 1000
        |   // ((n_days - 1) * sx))::BIGINT AS fano_milli
        |FROM m WHERE n_days > 1 ORDER BY event_type""".stripMargin,
    "q_asof_merge" ->
      """WITH p AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.user_id, count(*) AS n_purchases,
        |  sum(CASE WHEN c.ts IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_matched,
        |  coalesce(round(sum(c.click_value), 2), 0.0) AS matched_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_asof_merge_str" ->
      """WITH p AS (
        |  SELECT printf('u%03d', user_id % 50) AS ukey, ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT printf('u%03d', user_id % 50) AS ukey, ts,
        |    max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.ukey, count(*) AS n_purchases,
        |  sum(CASE WHEN c.ts IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_matched,
        |  coalesce(round(sum(c.click_value), 2), 0.0) AS matched_value
        |FROM p ASOF LEFT JOIN c ON p.ukey = c.ukey AND p.ts >= c.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_range_join" ->
      """WITH c AS (
        |  SELECT i AS campaign_id,
        |    1704067200 + i * 259200 AS start_epoch,
        |    1704067200 + i * 259200 + 432000 AS end_epoch
        |  FROM range(10) t(i)),
        |e AS (SELECT epoch(ts)::BIGINT AS p, value FROM events)
        |SELECT campaign_id, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM e JOIN c ON p >= start_epoch AND p < end_epoch
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_events_sliding" ->
      """WITH b AS (SELECT min(ts) AS a, max(ts) AS z FROM events),
        |s AS (
        |  SELECT unnest(generate_series(
        |    make_timestamp((((floor(epoch(a) / 900) * 900)::BIGINT - 2700)
        |      * 1000000)::BIGINT),
        |    make_timestamp((epoch(z) * 1000000)::BIGINT),
        |    INTERVAL 15 MINUTE)) AS ws
        |  FROM b),
        |j AS (
        |  SELECT epoch(s.ws)::BIGINT AS win_epoch, e.event_type, e.value
        |  FROM events e JOIN s ON e.ts >= s.ws
        |    AND e.ts < s.ws + INTERVAL 60 MINUTE)
        |SELECT win_epoch, event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 300""".stripMargin,
    "q_events_hourly" ->
      """SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
        |  event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 200""".stripMargin,
    "q_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |t3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT 1 AS step, 'view' AS event_type, count(*) AS n_users FROM t1
        |UNION ALL
        |SELECT 2, 'click', count(*) FROM t2
        |UNION ALL
        |SELECT 3, 'purchase', count(*) FROM t3
        |ORDER BY step""".stripMargin,
    "q_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    epoch(date_trunc('day', ts))::BIGINT AS day_epoch
        |  FROM events),
        |coh AS (
        |  SELECT user_id, min(day_epoch) AS cohort_epoch FROM act GROUP BY 1)
        |SELECT cohort_epoch,
        |  (act.day_epoch - cohort_epoch) // 86400 AS offset_days,
        |  count(*) AS n_users
        |FROM act JOIN coh USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts)::DATE AS day,
        |    count(*) AS n, floor(max(value) * 100)::BIGINT AS level_cents
        |  FROM events GROUP BY 1, 2),
        |spans AS (
        |  SELECT user_id, min(day) AS lo, max(day) AS hi
        |  FROM daily GROUP BY 1),
        |cal AS (
        |  SELECT user_id,
        |    unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        |  FROM spans)
        |SELECT c.user_id, c.day::VARCHAR AS day,
        |  coalesce(d.n, 0)::BIGINT AS n,
        |  last_value(d.level_cents IGNORE NULLS) OVER (
        |    PARTITION BY c.user_id ORDER BY c.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS level_cents_filled,
        |  (CASE WHEN d.user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS is_gap
        |FROM cal c LEFT JOIN daily d
        |  ON c.user_id = d.user_id AND c.day = d.day
        |ORDER BY c.user_id, c.day""".stripMargin,
    "q_anomaly_mad" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts)::DATE AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT user_id, quantile_cont(n, 0.5) AS med FROM daily GROUP BY 1),
        |dev AS (
        |  SELECT d.user_id, d.day, d.n, m.med, abs(d.n - m.med) AS dev
        |  FROM daily d JOIN med m USING (user_id)),
        |mad AS (
        |  SELECT user_id, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT v.user_id, v.day::VARCHAR AS day, v.n,
        |  (v.med * 4)::BIGINT AS med_q4,
        |  (v.dev * 4)::BIGINT AS dev_q4,
        |  (m.mad * 4)::BIGINT AS mad_q4,
        |  (CASE WHEN v.dev > m.mad * 3 THEN 1 ELSE 0 END)::BIGINT
        |    AS is_anomaly
        |FROM dev v JOIN mad m USING (user_id)
        |ORDER BY v.user_id, v.day""".stripMargin,
    "q_json_props" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  sum(k)::BIGINT AS sum_k, min(k) AS min_k, max(k) AS max_k,
        |  sum(CASE WHEN k >= 50 THEN 1 ELSE 0 END)::BIGINT AS n_hi
        |FROM (SELECT event_type,
        |        json_extract(props, '$.k')::INTEGER AS k
        |      FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // epoch_us // 1e6 (epoch(ts)::BIGINT ROUNDS; Spark truncates).
    "q_interval_overlap_merge" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    epoch_us(o_orderdate) // 1000000 AS st
        |  FROM orders),
        |l AS (SELECT o_custkey, o_orderkey AS l_okey, st AS ls,
        |        st + 2592000 AS le
        |      FROM o WHERE o_orderkey % 2 = 0),
        |r AS (SELECT o_custkey, o_orderkey AS r_okey, st AS rs,
        |        st + 2592000 AS re
        |      FROM o WHERE o_orderkey % 2 = 1)
        |SELECT l.o_custkey, l_okey, r_okey,
        |  (least(le, re) - greatest(ls, rs))::BIGINT AS ov_secs
        |FROM l JOIN r ON l.o_custkey = r.o_custkey
        |  AND ls < re AND rs < le
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_interval_overlap" ->
      """WITH c AS (
        |  SELECT i AS campaign_id,
        |    1704067200 + i * 259200 AS c_start,
        |    1704067200 + i * 259200 + 432000 AS c_end
        |  FROM range(10) t(i)),
        |u AS (
        |  -- epoch(ts)::BIGINT ROUNDS; Spark unix_timestamp truncates.
        |  -- Integer floor-div on micros matches Spark exactly.
        |  SELECT user_id, min(epoch_us(ts) // 1000000) AS u_start,
        |    min(epoch_us(ts) // 1000000) + 172800 AS u_end
        |  FROM events GROUP BY 1)
        |SELECT user_id, campaign_id,
        |  greatest(u_start, c_start) AS ov_start,
        |  least(u_end, c_end) AS ov_end,
        |  least(u_end, c_end) - greatest(u_start, c_start) AS ov_secs
        |FROM u JOIN c ON u_start < c_end AND c_start < u_end
        |ORDER BY 1, 2""".stripMargin,
    "q_rate_limit" ->
      """WITH e AS (
        |  SELECT user_id,
        |    epoch_us(date_trunc('hour', ts)) // 1000000 AS hour_epoch,
        |    epoch_us(ts) AS ts_us, event_id
        |  FROM events),
        |r AS (
        |  SELECT user_id, hour_epoch, event_id,
        |    row_number() OVER (PARTITION BY user_id, hour_epoch
        |      ORDER BY ts_us, event_id) AS rk
        |  FROM e)
        |SELECT user_id, hour_epoch, event_id, rk FROM r WHERE rk <= 5
        |ORDER BY user_id, hour_epoch, rk""".stripMargin,
    "q_wow_change" ->
      """WITH weekly AS (
        |  SELECT event_type, date_trunc('week', ts)::DATE AS week,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, week, n,
        |    lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
        |  FROM weekly)
        |SELECT event_type, week::VARCHAR AS week, n, prev_n,
        |  ((n * 10000 // prev_n) - 10000)::BIGINT AS delta_bp
        |FROM lagged ORDER BY event_type, week""".stripMargin,
    "q_session_window" ->
      """WITH seq AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |         OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM seq)
        |SELECT user_id, sum(new_session)::BIGINT AS n_sessions,
        |  count(*) AS n_events
        |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skew_report" ->
      """WITH c AS (
        |  SELECT user_id::VARCHAR AS k, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS r FROM c),
        |s AS (
        |  SELECT count(*) AS n_keys, sum(cnt) AS n_rows,
        |    min(cnt) AS min_cnt, max(cnt) AS max_cnt,
        |    sum(2 * r * cnt) AS s2
        |  FROM r),
        |p AS (
        |  SELECT r.cnt AS p50_cnt FROM r, s
        |  WHERE r.r = (s.n_keys + 1) // 2)
        |SELECT n_keys::BIGINT AS n_keys, n_rows::BIGINT AS n_rows,
        |  min_cnt::BIGINT AS min_cnt, max_cnt::BIGINT AS max_cnt,
        |  p50_cnt::BIGINT AS p50_cnt,
        |  (((s2 - (n_keys + 1) * n_rows) * 10000)
        |    // (n_keys * n_rows))::BIGINT AS gini_bp,
        |  ((max_cnt * 10000) // n_rows)::BIGINT AS top1_bp
        |FROM s, p""".stripMargin,
    "q_scd2_history" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS seq_us, event_id,
        |    lag(event_type)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |changes AS (
        |  SELECT user_id, event_type, seq_us, event_id FROM ordered
        |  WHERE prev IS DISTINCT FROM event_type),
        |v AS (
        |  SELECT user_id,
        |    row_number()
        |      OVER (PARTITION BY user_id ORDER BY seq_us, event_id)
        |      AS version,
        |    event_type, seq_us AS valid_from_us,
        |    lead(seq_us)
        |      OVER (PARTITION BY user_id ORDER BY seq_us, event_id)
        |      AS valid_to_us
        |  FROM changes)
        |SELECT user_id, version, event_type, valid_from_us, valid_to_us,
        |  (CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,
    "q_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |pairs AS (
        |  SELECT prev_type, event_type, count(*) AS n
        |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, sum(n) AS row_n FROM pairs GROUP BY 1)
        |SELECT p.prev_type, p.event_type, p.n,
        |  (p.n * 10000 // t.row_n)::BIGINT AS p_bp
        |FROM pairs p JOIN tot t USING (prev_type)
        |ORDER BY 1, 2""".stripMargin,
    "q_time_to_convert" ->
      """WITH t1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |conv AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS tc_us,
        |    min(epoch_us(t1.t1)) AS t1_us
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |lat AS (
        |  SELECT user_id, (tc_us - t1_us) // 1000000 AS latency_s FROM conv)
        |SELECT (latency_s // 3600)::BIGINT AS hour_bucket,
        |  count(*) AS n_users, min(latency_s)::BIGINT AS min_s,
        |  max(latency_s)::BIGINT AS max_s
        |FROM lat GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_event_paths" ->
      """WITH seq AS (
        |  SELECT event_type AS s3,
        |    lag(event_type, 1)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2,
        |    lag(event_type, 2)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s1
        |  FROM events)
        |SELECT s1, s2, s3, count(*) AS n
        |FROM seq WHERE s1 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, s1, s2, s3 LIMIT 20""".stripMargin,
    "q_ab_lift" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |      AS converted
        |  FROM events GROUP BY 1),
        |armed AS (
        |  SELECT ('0x' || substring(md5('ab1|' || user_id), 1, 13))::BIGINT
        |    % 2 AS arm, converted
        |  FROM u)
        |SELECT arm, count(*) AS n_users,
        |  sum(converted)::BIGINT AS n_converted,
        |  (sum(converted) * 10000 // count(*))::BIGINT AS conv_bp
        |FROM armed GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_forecast_eval" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch(date_trunc('hour', ts))::BIGINT
        |    AS hour_epoch, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |joined AS (
        |  SELECT now.event_type, abs(now.n - prev.n) AS abs_err
        |  FROM hourly now
        |  JOIN hourly prev ON prev.event_type = now.event_type
        |    AND prev.hour_epoch + 86400 = now.hour_epoch)
        |SELECT event_type, count(*) AS n_hours,
        |  (sum(abs_err) * 1000 // count(*))::BIGINT AS mae_milli
        |FROM joined GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_interarrival" ->
      """WITH seq AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |gaps AS (
        |  SELECT event_type, (us - prev_us) // 1000000 AS gap_s
        |  FROM seq WHERE prev_us IS NOT NULL)
        |SELECT event_type,
        |  (length(bin(greatest(gap_s, 1))) - 1)::BIGINT AS log2_bucket,
        |  count(*) AS n_gaps, min(gap_s)::BIGINT AS min_s,
        |  max(gap_s)::BIGINT AS max_s
        |FROM gaps GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_ltv_cohorts" ->
      """WITH fs AS (
        |  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
        |  FROM events GROUP BY 1),
        |rev AS (
        |  SELECT epoch(fs.cohort_week)::BIGINT AS cohort_epoch,
        |    (epoch_us(date_trunc('week', e.ts))
        |     - epoch_us(fs.cohort_week)) // 604800000000 AS week_idx,
        |    count(*) AS n_purchases,
        |    sum(CAST(floor(e.value * 100) AS BIGINT))::BIGINT AS rev_c
        |  FROM events e JOIN fs ON e.user_id = fs.user_id
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT cohort_epoch, week_idx::BIGINT AS week_idx, n_purchases,
        |  rev_c,
        |  (sum(rev_c) OVER (PARTITION BY cohort_epoch ORDER BY week_idx
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
        |    AS cum_rev_c
        |FROM rev ORDER BY cohort_epoch, week_idx""".stripMargin,
    "q_seasonality" ->
      """WITH cells AS (
        |  SELECT isodow(ts)::BIGINT AS dow, hour(ts)::BIGINT AS hod,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT sum(n_events)::BIGINT AS total FROM cells)
        |SELECT dow, hod, n_events,
        |  (n_events * 10000 // tot.total)::BIGINT AS share_bp
        |FROM cells, tot ORDER BY dow, hod""".stripMargin
  )
}
