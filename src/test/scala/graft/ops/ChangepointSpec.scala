package graft.ops

import java.sql.Date

import graft.SparkSpec

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  /** A step-function series: weeks 0-9 at 3 rows/week, weeks 10-19 at
    * 12 rows/week, weeks 20-29 at 6 rows/week — built as one date row
    * per event, starting Monday 1970-01-05 (epoch week 0 covers days
    * 0-6, so week w starts at day 7w). */
  private lazy val stepSeries = {
    val rows = for {
      w <- 0 until 30
      rate = if (w < 10) 3 else if (w < 20) 12 else 6
      i <- 0 until rate
    } yield Date.valueOf(java.time.LocalDate.ofEpochDay(7L * w + (i % 7)))
    rows.toDF("d")
  }

  test("k=3 recovers the planted steps exactly") {
    val got = Changepoint.segments(stepSeries, "d", k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // boundaries at weeks 10 and 20; constant segments → zero SSE
    assert(got.map(x => (x._2, x._3)).toSeq ==
      Seq((0L, 10L), (10L, 20L), (20L, 30L)), got.mkString(", "))
    assert(got.map(_._5).toSeq == Seq(30L, 120L, 60L))
    assert(got.forall(_._6 == 0L))
  }

  test("k=2 merges the two closest regimes; absent weeks are zero cells") {
    val got = Changepoint.segments(stepSeries, "d", k = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(5)))
    // SSE-optimal 2-split keeps the big step at week 10
    assert(got.head._2 == 10L, got.mkString(", "))
    // a series with a gap: weeks 0-4 busy, weeks 5-9 silent, 10-14 busy
    val gappy = (for {
      w <- Seq(0, 1, 2, 3, 4, 10, 11, 12, 13, 14)
      i <- 0 until 8
    } yield Date.valueOf(java.time.LocalDate.ofEpochDay(7L * w + (i % 7))))
      .toDF("d")
    val seg = Changepoint.segments(gappy, "d", k = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    // the silent middle is its own zero-total segment
    assert(seg.exists { case (lo, hi, tot) => lo == 5L && hi == 10L && tot == 0L },
      seg.mkString(", "))
  }
}
