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
    })
  )

  def oracle: Map[String, String] = Map(
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
    "q_events_hourly" ->
      """SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
        |  event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 200""".stripMargin
  )
}
