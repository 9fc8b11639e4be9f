package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("dailyWithGaps: dense per-key calendar, carried values, exact gap flags") {
    val sparse = Seq(
      (1L, d("2026-01-01"), 10L),
      (1L, d("2026-01-04"), 40L), // 2-day hole
      (2L, d("2026-02-10"), 7L)   // single-day key: no holes
    ).toDF("k", "day", "v")
    val out = GapFill.dailyWithGaps(sparse, "k", "day", Seq("v"))
      .orderBy("k", "day")
      .select("k", "day", "v_filled", "is_gap")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "2026-01-01", 10L, 0L),
      (1L, "2026-01-02", 10L, 1L), // carried across the hole
      (1L, "2026-01-03", 10L, 1L),
      (1L, "2026-01-04", 40L, 0L), // fresh observation replaces carry
      (2L, "2026-02-10", 7L, 0L)))
  }

  test("dailyWithGaps: legitimate null values do not flag as gaps") {
    val sparse = Seq(
      (1L, d("2026-01-01"), Some(5L)),
      (1L, d("2026-01-02"), None) // observed day, null metric
    ).toDF("k", "day", "v")
    val out = GapFill.dailyWithGaps(sparse, "k", "day", Seq("v"))
      .orderBy("day")
      .select("is_gap", "v_filled")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // day 2 is OBSERVED (is_gap 0) and its null metric carries day 1's
    assert(out.toSeq == Seq((0L, 5L), (0L, 5L)))
  }

  test("dailyActivity: events to gap-filled daily counts and level") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, Timestamp.valueOf("2026-03-01 10:00:00"), 1.25),
      (1L, Timestamp.valueOf("2026-03-01 11:00:00"), 2.5),
      (1L, Timestamp.valueOf("2026-03-03 09:00:00"), 0.75)
    ).toDF("user_id", "ts", "value")
    val out = GapFill.dailyActivity(ev, "user_id", col("ts"), col("value"))
      .orderBy("day")
      .select("n", "level_cents_filled", "is_gap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (2L, 250L, 0L), // day 1: two events, max 2.5 -> 250 cents
      (0L, 250L, 1L), // day 2: gap, level carried
      (1L, 75L, 0L))) // day 3: fresh level
  }
}
