package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Semantics checks for the funnel / retention queries on a HAND-BUILT
  * event log (the sf-data oracles prove engine parity; these prove the
  * queries compute the funnel/cohort definitions we claim). The fixture
  * writes `ts` as a plain INT64 nanosecond column — the same physical
  * shape Tables.events reads from the driver-generated parquet.
  */
class EventsQueriesSpec extends SparkSpec {

  private def nanos(utc: String): Long =
    java.time.LocalDateTime.parse(utc.replace(" ", "T"))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000000L

  private def writeEvents(
      rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-evq").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/events.parquet")
    root
  }

  test("funnel: strict ordering gates each step") {
    def m(i: Int) = nanos(f"2024-01-01 00:$i%02d:00")
    val dir = writeEvents(Seq(
      // u1 completes in order: view@1 < click@2 < purchase@3
      (1L, m(1), 1L, "view", 1.0, "{}"),
      (2L, m(2), 1L, "click", 1.0, "{}"),
      (3L, m(3), 1L, "purchase", 1.0, "{}"),
      // u2: click BEFORE its first view — stalls at step 1
      (4L, m(5), 2L, "click", 1.0, "{}"),
      (5L, m(6), 2L, "view", 1.0, "{}"),
      (6L, m(7), 2L, "purchase", 1.0, "{}"),
      // u3: a click at the SAME instant as the view (strict > excludes
      // it), then a later click and purchase — completes
      (7L, m(10), 3L, "view", 1.0, "{}"),
      (8L, m(10), 3L, "click", 1.0, "{}"),
      (9L, m(11), 3L, "click", 1.0, "{}"),
      (10L, m(12), 3L, "purchase", 1.0, "{}"),
      // u4: never views — not even in step 1
      (11L, m(20), 4L, "purchase", 9.0, "{}")))
    val got = Events.queries("q_funnel")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // step1: u1, u2, u3 viewed. step2: u1 and u3 (u3's tying click must
    // not count; its @11 click does). step3: u1, u3.
    assert(got == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 2L)))
  }

  test("retention: cohort = first active day, offsets count active users") {
    val dir = writeEvents(Seq(
      // u1 first on day 0, returns day 1 and day 3 (twice on day 0 —
      // the (user, day) distinct collapses it)
      (1L, nanos("2024-01-01 08:00:00"), 1L, "view", 1.0, "{}"),
      (2L, nanos("2024-01-01 23:59:59"), 1L, "view", 1.0, "{}"),
      (3L, nanos("2024-01-02 01:00:00"), 1L, "view", 1.0, "{}"),
      (4L, nanos("2024-01-04 12:00:00"), 1L, "view", 1.0, "{}"),
      // u2 first on day 1 only
      (5L, nanos("2024-01-02 09:00:00"), 2L, "view", 1.0, "{}")))
    val d0 = 1704067200L // 2024-01-01 UTC midnight
    val got = Events.queries("q_retention")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (d0, 0L, 1L), (d0, 1L, 1L), (d0, 3L, 1L),
      (d0 + 86400, 0L, 1L)))
  }
}
