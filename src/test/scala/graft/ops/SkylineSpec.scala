package graft.ops

import graft.SparkSpec

class SkylineSpec extends SparkSpec {

  import spark.implicits._

  private def brute(rows: Seq[(Long, Int, Double)]): Set[Long] =
    rows.filter { a =>
      !rows.exists(b =>
        b._2 >= a._2 && b._3 <= a._3 && (b._2 > a._2 || b._3 < a._3))
    }.map(_._1).toSet

  private def run(rows: Seq[(Long, Int, Double)]): Set[Long] =
    Skyline.frontier2D(rows.toDF("id", "band", "price"), "band", "price")
      .select("id").collect().map(_.getLong(0)).toSet

  test("matches the quadratic dominance definition on random data") {
    var s = 99L
    def nxt(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s }
    val rows = (0L until 200L).map(i =>
      (i, (nxt() % 12).toInt, (nxt() % 1000).toDouble / 10.0))
    assert(run(rows) == brute(rows))
  }

  test("equal (band, value) ties all survive; dominated same-band rows drop") {
    val rows = Seq(
      (1L, 5, 10.0), (2L, 5, 10.0), // tied pair: mutually non-dominating
      (3L, 5, 11.0),                // same band, worse value -> dominated
      (4L, 6, 10.0),                // dominates 1,2 on band? equal value,
                                    // larger band -> yes, strictly
      (5L, 7, 12.0))
    val got = run(rows)
    assert(got == brute(rows))
    assert(!got.contains(3L))
    // 4 dominates 1 and 2 (band strict, value equal)
    assert(got == Set(4L, 5L))
  }

  test("monotone staircase keeps every step; null rows are excluded") {
    val rows = Seq((1L, 1, 1.0), (2L, 2, 2.0), (3L, 3, 3.0))
    assert(run(rows) == Set(1L, 2L, 3L))
    val withNull = Seq((Some(1L), Some(1), Some(1.0)),
      (Some(2L), None, Some(0.5)), (Some(3L), Some(2), None))
      .toDF("id", "band", "price")
    val got = Skyline.frontier2D(withNull, "band", "price")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }
}
