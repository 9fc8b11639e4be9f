package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming form of the event pipeline (SURVEY.md §2.8):
  * the reference is batch-with-incremental-rescan; here the same
  * aggregations run continuously with watermarked event time. State
  * lives in the checkpointed state store, sized by (window × key)
  * cardinality, not input volume — the 100 TB/day-safe shape.
  */
object EventStream {

  /** Event schema matching Tables.events after ns→µs normalization. */
  val eventSchema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
    "event_type STRING, value DOUBLE, props STRING"

  /** Hourly tumbling-window totals per event type, 10-minute
    * watermark: the streaming twin of q_events_hourly — identical
    * grouped aggregation, plus late-data bounds. */
  def hourlyTotals(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("total_value"))

  /** SLIDING windows (1 h / 15 min) with watermark — the streaming
    * twin of q_events_sliding. State per (window × type) key; the 4×
    * window replication is bounded by window/slide, and expired
    * windows age out with the watermark. */
  def slidingTotals(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("win_epoch"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Per-user session log state for [[sessionize]]: sessionization is
    * ORDER-SENSITIVE under disorder — a late-arriving event can BRIDGE
    * two sessions previously judged separate (or extend one backward),
    * so greedy freezing mis-assigns every subsequent gap decision. Per
    * the order-sensitive-derivation rule (funnel/scd2/ewma twins), the
    * state retains exactly what the derivation reads — the per-user
    * (ts, value) log, bounded by events per key (production: bound it
    * with a retention horizon/timeout) — and re-derives ALL sessions on
    * every update. */
  final case class SessionLog(log: List[(Long, Double)], nSeen: Long)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, total_value: Double, is_open: Long, n_seen: Long)

  /** Streaming twin of the batch gap sessionizer (q_sessionize's
    * gap-vs-threshold rule on millis): each update re-emits the user's
    * full current session list — including the still-open final session
    * (`is_open` = 1), which a frozen Append-mode design could never
    * emit — stamped with the monotone `n_seen` version; readers keep
    * each user's max-n_seen rows. */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id"), col("ts").cast("long") * 1000,
      col("value")).as[(Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Double)],
            state: GroupState[SessionLog]) => {
          var st = state.getOption.getOrElse(SessionLog(Nil, 0L))
          rows.foreach { case (_, t, v) =>
            st = SessionLog((t, v) :: st.log, st.nSeen + 1)
          }
          state.update(st)
          val ordered = st.log.sortBy(_._1)
          // re-derive: split the ordered log at gaps > gapMs.
          val sessions = ordered.foldLeft(
            List.empty[(Long, Long, Long, Double)]) {
            case (acc, (t, v)) => acc match {
              case (s0, last, n, tot) :: rest if t - last <= gapMs =>
                (s0, t, n + 1, tot + v) :: rest
              case _ => (t, t, 1L, v) :: acc
            }
          }.reverse
          sessions.zipWithIndex.map { case ((s0, e, n, tot), i) =>
            SessionOut(user, s0, e, n, tot,
              if (i == sessions.length - 1) 1L else 0L, st.nSeen)
          }.iterator
        }).toDF()
  }

  /** Per-user streaming funnel state (see [[funnel]]): min view
    * timestamp is O(1) — a late-arriving earlier view only ever lowers
    * it — but clicks/purchases must be RETAINED: when a later view
    * lowers t1, clicks that were ineligible become eligible, and a
    * min-only click state would have already discarded them. State is
    * therefore bounded by each user's step-2/3 event count (in
    * production, by the funnel attribution window via a state timeout),
    * never by stream volume; views are never stored. */
  final case class FunnelState(minView: Long, clicks: List[Long],
      purchases: List[Long], nSeen: Long)
  final case class FunnelOut(user_id: Long, n_seen: Long,
      view_us: Option[Long], click_us: Option[Long],
      purchase_us: Option[Long])

  /** Streaming twin of the batch ordered funnel (q_funnel): per-user
    * first view, first click strictly after it, first purchase strictly
    * after that — exact under arbitrary event-time disorder, because
    * the derived step times are recomputed from retained candidates on
    * every update instead of being frozen greedily. Emits the user's
    * current funnel row each time their state changes (`n_seen` is a
    * monotone per-user version — readers keep the max). */
  def funnel(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .as[(Long, Long, String)]
    typed.groupByKey(_._1).mapGroupsWithState(GroupStateTimeout.NoTimeout)(
      (user: Long, rows: Iterator[(Long, Long, String)],
          state: GroupState[FunnelState]) => {
        var st = state.getOption.getOrElse(
          FunnelState(Long.MaxValue, Nil, Nil, 0L))
        rows.foreach { case (_, t, tpe) =>
          st = tpe match {
            case "view" =>
              st.copy(minView = math.min(st.minView, t), nSeen = st.nSeen + 1)
            case "click" =>
              st.copy(clicks = t :: st.clicks, nSeen = st.nSeen + 1)
            case "purchase" =>
              st.copy(purchases = t :: st.purchases, nSeen = st.nSeen + 1)
            case _ => st.copy(nSeen = st.nSeen + 1)
          }
        }
        state.update(st)
        val t1 = if (st.minView == Long.MaxValue) None else Some(st.minView)
        val t2 = t1.flatMap(v => st.clicks.filter(_ > v).minOption)
        val t3 = t2.flatMap(c => st.purchases.filter(_ > c).minOption)
        FunnelOut(user, st.nSeen, t1, t2, t3)
      }).toDF()
  }

  /** Watermarked STREAM-STREAM event-time join — the attribution
    * shape: each purchase joins the views by the same user in the
    * preceding `horizonMin` minutes. Both sides carry watermarks and
    * the join condition bounds event-time distance, so the state
    * store retains only rows inside (watermark + horizon) — without
    * the time-range conjunct a stream-stream join must keep EVERY
    * past row and the state grows without bound (Spark rejects some
    * such plans, silently bloats others). Self-join of one source
    * stream (filtered twice) is the standard pattern. Append output:
    * a pair emits once both sides have passed the watermark. */
  def attributionJoin(events: DataFrame, horizonMin: Int = 30): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "10 minutes")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("p_ts") < col("v_ts") + expr(s"INTERVAL $horizonMin MINUTES"))
      .select(col("purchase_id"), col("view_id"),
        col("p_user").as("user_id"),
        unix_micros(col("v_ts")).as("view_us"),
        unix_micros(col("p_ts")).as("purchase_us"), col("value"))
  }

  /** Streaming twin of the PHYSICAL interval-overlap join
    * (plans/IntervalSweepJoin / q_interval_overlap_merge): per user,
    * click activity windows × view activity windows that strictly
    * overlap. Both interval streams have CONSTANT length `winMin`, so
    * strict overlap ⇔ |c_start − v_start| < winMin — the overlap
    * predicate IS the event-time range conjunct that stream-stream
    * state bounding requires (both sides watermarked; each side's
    * state is one window's worth of rows past the watermark, exactly
    * the sweep exec's open-interval working set translated to
    * streaming). Variable-length intervals would add the length bound
    * as a separate conjunct; the equal-length case needs nothing
    * else. */
  def overlapJoin(events: DataFrame, winMin: Int = 20): DataFrame = {
    val win = expr(s"INTERVAL $winMin MINUTES")
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_start"),
        col("event_id").as("click_id"))
      .withWatermark("c_start", "10 minutes")
    val views = events.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_start"),
        col("event_id").as("view_id"))
      .withWatermark("v_start", "10 minutes")
    clicks.join(views,
        col("c_user") === col("v_user") &&
          col("v_start") > col("c_start") - win &&
          col("v_start") < col("c_start") + win)
      .select(col("click_id"), col("view_id"),
        col("c_user").as("user_id"),
        unix_micros(col("c_start")).as("click_us"),
        unix_micros(col("v_start")).as("view_us"))
  }

  /** Streaming twin of the rate limiter (q_rate_limit): admit each
    * user's EARLIEST `n` events per hour. Order-sensitive under
    * disorder — a late-arriving EARLIER event must displace a
    * previously admitted one — but unlike SCD2 the sufficient state
    * is tiny: the n smallest (ts, event_id) per open hour (a bounded
    * set; a late event either enters it, evicting the max, or is
    * dropped). Emits each key's current admitted set stamped with
    * monotone n_seen; readers keep max-n_seen rows per (user, hour).
    * State = hours-seen × n per key (production: expire old hours
    * with a timeout). */
  final case class RateState(
      byHour: Map[Long, List[(Long, Long)]], nSeen: Long)
  final case class RateOut(user_id: Long, hour_epoch: Long,
      event_id: Long, rk: Long, n_seen: Long)

  def rateLimit(spark: SparkSession, events: DataFrame,
      n: Int = 5): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour"),
        unix_micros(col("ts")), col("event_id"))
      .as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long, Long)],
            state: GroupState[RateState]) => {
          var st = state.getOption.getOrElse(RateState(Map.empty, 0L))
          rows.foreach { case (_, hour, ts, id) =>
            val kept = st.byHour.getOrElse(hour, Nil)
            val merged = ((ts, id) :: kept).sorted.take(n)
            st = RateState(st.byHour.updated(hour, merged), st.nSeen + 1)
          }
          state.update(st)
          st.byHour.iterator.flatMap { case (hour, kept) =>
            kept.zipWithIndex.map { case ((_, id), i) =>
              RateOut(user, hour, id, i + 1L, st.nSeen)
            }
          }
        }).toDF()
  }

  /** State for the streaming SCD2 twin: the retained per-key change
    * log. Raw retention (not just the collapsed versions) is REQUIRED
    * for exactness under disorder — a late event landing between two
    * retained changes can resurrect a row that run-collapse previously
    * removed (a → [late b] → a: both a's must now survive), so the
    * derivation re-runs from the log on every update, per the
    * order-sensitive-derivation rule the funnel follows. State is
    * bounded by events per key (production: bound it with a retention
    * horizon), never by stream volume across keys. */
  final case class Scd2State(log: List[(Long, Long, String)], nSeen: Long)
  final case class Scd2Row(user_id: Long, version: Long,
      event_type: String, valid_from: Long, valid_to: Option[Long],
      is_current: Long, n_seen: Long)

  /** Streaming twin of ops/Scd2.fromChangeLog on the events stream
    * (key = user, tracked attribute = event_type, sequence = epoch
    * micros, ties by event_id): each update re-emits the key's full
    * current history stamped with the monotone `n_seen` version —
    * readers keep the rows with each key's max n_seen. */
  def scd2(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[Scd2State]) => {
          var st = state.getOption.getOrElse(Scd2State(Nil, 0L))
          rows.foreach { case (_, seq, tie, attr) =>
            st = Scd2State((seq, tie, attr) :: st.log, st.nSeen + 1)
          }
          state.update(st)
          // re-derive: sort by (seq, tie), collapse runs, assign
          // versions and intervals — the same semantics as the batch
          // window form, driver-free and per-key-bounded.
          val ordered = st.log.sortBy(e => (e._1, e._2))
          val survivors = ordered.foldLeft(List.empty[(Long, String)]) {
            case (acc, (seq, _, attr)) =>
              if (acc.headOption.exists(_._2 == attr)) acc
              else (seq, attr) :: acc
          }.reverse
          survivors.zipWithIndex.map { case ((from, attr), i) =>
            Scd2Row(user, i + 1L, attr, from,
              survivors.lift(i + 1).map(_._1),
              if (i == survivors.length - 1) 1L else 0L, st.nSeen)
          }.iterator
        }).toDF()
  }

  /** Streaming exact dedup: keep the first occurrence of each key
    * within the watermark horizon (the streaming twin of the batch
    * exact dedup — dedup state is one compact row per distinct key
    * inside the horizon, bounded by key cardinality × horizon, never
    * by stream volume; expired keys are dropped with the watermark).
    * For document streams the key would be the normalized-text hash;
    * for events, the event id. */
  def dedupByKey(events: DataFrame, keyCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Continuous heavy hitters: the Space-Saving sketch
    * (graft.ops.HeavyHitters) as a streaming aggregate. Streaming
    * state is ONE capacity-bounded sketch — constant size however many
    * distinct items or events flow through — where a plain
    * `groupBy(item).count()` would grow state with cardinality
    * forever. Complete output mode re-emits the current top set each
    * trigger. */
  def topItems(events: DataFrame, itemCol: String,
      capacity: Int): DataFrame =
    events.groupBy()
      .agg(graft.ops.HeavyHitters.sketch(col(itemCol), capacity).as("__hitters"))
      .select(explode(col("__hitters")).as("h"))
      .select(col("h.item"), col("h.est_count"), col("h.max_err"))

  /** Continuous distribution-drift monitor: the stream's values
    * aggregate into ONE KLL sketch (constant state regardless of
    * volume) and every trigger re-scores the cumulative distribution
    * against a FROZEN reference sketch — the quality gate that
    * quarantines an ingest stream whose metric distribution wanders
    * from the blessed cohort. The reference rides the plan as a
    * closure literal (kilobytes); output is one (n, ks_bp) row in
    * complete mode. */
  def valueDrift(events: DataFrame, valueCol: String,
      reference: graft.ops.QuantileSketch.KllData): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val enc = Encoders.row(StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("ks_bp", LongType, nullable = false))))
    events.groupBy()
      .agg(graft.ops.QuantileSketch.sketch(col(valueCol)).as("sketch"))
      .map { r =>
        val cur = graft.ops.QuantileSketch.kllOfRow(
          r.getStruct(r.fieldIndex("sketch")))
        val ks = graft.ops.QuantileSketch.ksDistance(cur, reference)
        Row(cur.n, math.floor(ks * 10000).toLong)
      }(enc)
  }

  /** Streaming twin of q_anomaly_mad's flagging half: the stream's
    * per-(user, day) counts are scored against a FROZEN robust profile
    * (per-user median/MAD daily counts on the ×4 integer grid, built
    * batch-side from a blessed reference period — the same
    * frozen-literal-model pattern as the streaming NB classifier).
    * The profile rides the plan as two literal maps (|users| longs —
    * kilobytes to low MBs); state is one count per (user, day) seen.
    * A user ABSENT from the profile is itself the anomaly signal
    * (med_q4/mad_q4 = −1, flagged) — the same vanished/new-group
    * reasoning as the drift monitor's full-outer join. Works
    * identically on a batch frame (same Column plan), which is what
    * the spec's stream ≡ batch assertion exercises. */
  def dailyAnomaly(events: DataFrame,
      profile: Map[Long, (Long, Long)]): DataFrame = {
    val medMap = typedLit(profile.map { case (u, (m, _)) => u -> m })
    val madMap = typedLit(profile.map { case (u, (_, d)) => u -> d })
    events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("med_q4",
        coalesce(try_element_at(medMap, col("user_id")), lit(-1L)))
      .withColumn("mad_q4",
        coalesce(try_element_at(madMap, col("user_id")), lit(-1L)))
      .withColumn("dev_q4", abs(col("n") * 4 - col("med_q4")))
      .withColumn("is_anomaly",
        when(col("med_q4") < 0, 1L)
          .when(col("dev_q4") > col("mad_q4") * 3, 1L)
          .otherwise(0L))
  }

  /** Streaming twin of q_ewma_smooth, one smoothed series per
    * event_type: stateful flatMapGroupsWithState whose state is the
    * day→count map (calendar-bounded — the same axis the batch query
    * aggregates onto). EWMA is ORDER-SENSITIVE: a late-arriving
    * earlier day changes every later smoothed value, so the state
    * retains exactly what the derivation reads and RE-DERIVES the
    * whole curve on every update (the funnel late-data rule — never
    * freeze a non-monotone derivation), emitting the refreshed curve
    * through [[graft.ops.Smoothing.ewma]] — bit-identical arithmetic
    * to the batch/oracle path. `seen` (total observations in state)
    * is monotone per key, so the final snapshot = rows where seen is
    * maximal per key. */
  def ewmaDaily(spark: SparkSession, events: DataFrame,
      alphaDen: Long = 8L): DataFrame = {
    import spark.implicits._
    events
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long],
          (String, Long, String, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, String)],
         state: GroupState[Map[String, Long]]) =>
          val m = scala.collection.mutable.Map.empty[String, Long]
          m ++= state.getOption.getOrElse(Map.empty)
          rows.foreach { case (_, d) => m(d) = m.getOrElse(d, 0L) + 1L }
          val snapshot = m.toMap
          state.update(snapshot)
          val seen = snapshot.valuesIterator.sum
          graft.ops.Smoothing.ewma(snapshot.toSeq, alphaDen)
            .iterator.map { case (d, c, sMicro, r) =>
              (key, seen, d, c, sMicro, r)
            }
      }
      .toDF("event_type", "seen", "d", "cnt", "ewma_micro", "resid_micro")
  }

  /** Streaming twin of q_holt_forecast — the [[ewmaDaily]] recipe
    * with the coupled level+trend recursion: state is the per-type
    * calendar-day count map, and every update RE-DERIVES the whole
    * curve through [[graft.ops.Smoothing.holt]] (order-sensitive
    * derivation — the funnel late-data rule), so late-arriving
    * earlier days reshape level, trend, and every later forecast
    * exactly as the batch query would. */
  def holtDaily(spark: SparkSession, events: DataFrame,
      alphaDen: Long = 8L, betaDen: Long = 4L): DataFrame = {
    import spark.implicits._
    events
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long],
          (String, Long, String, Long, Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, String)],
         state: GroupState[Map[String, Long]]) =>
          val m = scala.collection.mutable.Map.empty[String, Long]
          m ++= state.getOption.getOrElse(Map.empty)
          rows.foreach { case (_, d) => m(d) = m.getOrElse(d, 0L) + 1L }
          val snapshot = m.toMap
          state.update(snapshot)
          val seen = snapshot.valuesIterator.sum
          graft.ops.Smoothing.holt(snapshot.toSeq, alphaDen, betaDen)
            .iterator.map { case (d, c, l, b, f, e) =>
              (key, seen, d, c, l, b, f, e)
            }
      }
      .toDF("event_type", "seen", "d", "cnt", "level_micro", "trend_micro",
        "forecast_micro", "err_micro")
  }

  /** Streaming twin of q_hw_forecast — [[holtDaily]] with the
    * period-m seasonal recursion. Same state shape (per-type
    * calendar-day count map) and same late-data rule: the seasonal
    * array's slot assignment depends on each day's RANK in the
    * calendar, so a late-arriving earlier day shifts every later
    * day's slot — only full re-derivation through
    * [[graft.ops.Smoothing.holtWinters]] stays exact. */
  def holtWintersDaily(spark: SparkSession, events: DataFrame, m: Int = 7,
      alphaDen: Long = 8L, betaDen: Long = 4L,
      gammaDen: Long = 8L): DataFrame = {
    import spark.implicits._
    events
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long],
          (String, Long, String, Long, Long, Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, String)],
         state: GroupState[Map[String, Long]]) =>
          val cm = scala.collection.mutable.Map.empty[String, Long]
          cm ++= state.getOption.getOrElse(Map.empty)
          rows.foreach { case (_, d) => cm(d) = cm.getOrElse(d, 0L) + 1L }
          val snapshot = cm.toMap
          state.update(snapshot)
          val seen = snapshot.valuesIterator.sum
          graft.ops.Smoothing.holtWinters(snapshot.toSeq, m, alphaDen,
              betaDen, gammaDen)
            .iterator.map { case (d, c, l, b, s, f, e) =>
              (key, seen, d, c, l, b, s, f, e)
            }
      }
      .toDF("event_type", "seen", "d", "cnt", "level_micro", "trend_micro",
        "season_micro", "forecast_micro", "err_micro")
  }

  /** Streaming twin of q_burstiness — the live Fano-factor monitor
    * for capacity planning: state per event_type is the SAME
    * calendar-day count map the batch query aggregates onto (the
    * ewmaDaily recipe), and every update re-derives n_days, the mean
    * and the Fano factor from the map with the batch query's exact
    * integer arithmetic (JVM truncating long division ≡ Spark `div` ≡
    * DuckDB BIGINT `//` on these nonnegative quantities). Emits only
    * once a type has >1 day, mirroring the batch filter; `seen` is
    * monotone per key, so the final snapshot = rows at max seen. */
  def burstinessDaily(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long],
          (String, Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, String)],
         state: GroupState[Map[String, Long]]) =>
          val m = scala.collection.mutable.Map.empty[String, Long]
          m ++= state.getOption.getOrElse(Map.empty)
          rows.foreach { case (_, d) => m(d) = m.getOrElse(d, 0L) + 1L }
          val snapshot = m.toMap
          state.update(snapshot)
          val seen = snapshot.valuesIterator.sum
          val nd = snapshot.size.toLong
          if (nd <= 1) Iterator.empty
          else {
            val sx = seen
            val sxx = snapshot.valuesIterator.map(x => x * x).sum
            Iterator.single((key, seen, nd, sx / nd,
              (nd * sxx - sx * sx) * 1000L / ((nd - 1) * sx)))
          }
      }
      .toDF("event_type", "seen", "n_days", "mean_per_day", "fano_milli")
  }

  /** Run a parquet-backed streaming query into an in-memory sink until
    * all available input is processed (test/dev harness). */
  def runToMemory(spark: SparkSession, sourceDir: String, name: String,
      transform: DataFrame => DataFrame,
      outputMode: OutputMode = OutputMode.Complete(),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The events parquet has shipped both as TIMESTAMP(NANOS) (long
    // nanos under nanosAsLong) and as timestamp[us]; streaming needs
    // the schema declared up front, so probe one footer batch-side and
    // declare the matching shape (same branch as Tables.eventsRange).
    // An EMPTY or not-yet-populated source directory (valid for a
    // stream — files may arrive later) has no footer to probe: fall
    // back to the current driver encoding (TIMESTAMP_NTZ) instead of
    // throwing at start.
    val tsIsLong =
      try spark.read.parquet(sourceDir).schema("ts").dataType ==
        org.apache.spark.sql.types.LongType
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    val tsDecl = if (tsIsLong) "ts LONG" else "ts TIMESTAMP_NTZ"
    val reader = spark.readStream
      .schema(s"event_id LONG, $tsDecl, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n))
    val parsed = reader.parquet(sourceDir)
    val raw =
      if (tsIsLong) parsed.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else parsed.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    val q = transform(raw).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}
