package graft.ops

import scala.util.Random

import graft.SparkSpec

class InversionsSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "x", "y")
  }

  /** Value-space discordant pairs — the quantity Knight's
    * construction must reproduce. */
  private def bruteDiscordant(rows: Seq[(Long, Long, Long)]): Long =
    rows.combinations(2).count { case Seq((_, x1, y1), (_, x2, y2)) =>
      (x1 < x2 && y1 > y2) || (x1 > x2 && y1 < y2)
    }.toLong

  private def discordant(rows: Seq[(Long, Long, Long)],
      blocks: Int = 4, buckets: Int = 8): Long =
    Inversions.count(frame(rows), Seq("x", "y", "id"), Seq("y", "x", "id"),
      blocks = blocks, buckets = buckets)

  test("localInversions: strict inversions only, ties not counted") {
    assert(Inversions.localInversions(Array[Long]()) === 0L)
    assert(Inversions.localInversions(Array(5L)) === 0L)
    assert(Inversions.localInversions(Array(1L, 2L, 3L, 4L)) === 0L)
    assert(Inversions.localInversions(Array(4L, 3L, 2L, 1L)) === 6L)
    assert(Inversions.localInversions(Array(2L, 2L, 2L)) === 0L)
    assert(Inversions.localInversions(Array(2L, 1L, 2L, 1L)) === 3L)
    // reference mergecount vs O(m²) on random data with heavy ties
    val rnd = new Random(7)
    for (_ <- 1 to 20) {
      val a = Array.fill(rnd.nextInt(60) + 1)(rnd.nextInt(8).toLong)
      val brute = (for {
        i <- a.indices; j <- i + 1 until a.length if a(i) > a(j)
      } yield 1).size.toLong
      assert(Inversions.localInversions(a) === brute)
    }
  }

  test("distributed count equals brute-force discordant pairs") {
    val rnd = new Random(11)
    val rows = (0L until 200L).map(i =>
      (i, rnd.nextInt(12).toLong, rnd.nextInt(12).toLong)) // heavy ties
    assert(discordant(rows) === bruteDiscordant(rows))
  }

  test("invariant to blocks/buckets configuration") {
    val rnd = new Random(13)
    val rows = (0L until 300L).map(i =>
      (i, rnd.nextInt(20).toLong, rnd.nextInt(5).toLong))
    val expected = bruteDiscordant(rows)
    for ((p, b) <- Seq((1, 1), (2, 3), (4, 8), (16, 64), (32, 1024)))
      assert(discordant(rows, p, b) === expected, s"blocks=$p buckets=$b")
  }

  test("auto-scaled P/B and the distributed cross sweep stay exact") {
    val rnd = new Random(23)
    val rows = (0L until 400L).map(i =>
      (i, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val expected = bruteDiscordant(rows)
    // tiny targetGroupRows forces needed = ceil(n/target) past the
    // declared floors — several auto-chosen (P,B) points
    for (target <- Seq(1L, 7L, 50L, 400L))
      assert(Inversions.count(frame(rows), Seq("x", "y", "id"),
        Seq("y", "x", "id"), blocks = 2, buckets = 2,
        targetGroupRows = target) === expected, s"target=$target")
    // maxDriverCells = 1 forces crossDistributed at every (P,B)
    for ((p, b) <- Seq((1, 1), (4, 8), (16, 64)))
      assert(Inversions.count(frame(rows), Seq("x", "y", "id"),
        Seq("y", "x", "id"), blocks = p, buckets = b,
        maxDriverCells = 1L) === expected, s"distributed p=$p b=$b")
  }

  test("edge cases: empty, singleton, all-tied, perfect, reversed") {
    assert(discordant(Nil) === 0L)
    assert(discordant(Seq((0L, 1L, 1L))) === 0L)
    val allTied = (0L until 50L).map(i => (i, 3L, 9L))
    assert(discordant(allTied) === 0L)
    val perfect = (0L until 50L).map(i => (i, i, i * 2))
    assert(discordant(perfect) === 0L)
    val reversed = (0L until 50L).map(i => (i, i, 100L - i))
    assert(discordant(reversed) === 50L * 49L / 2)
  }

  test("property sweep: parity across tie/order regimes") {
    // regime axes: value cardinality (1 = all tied .. distinct),
    // correlation direction, and size — distributed count must match
    // value-space brute force in every seeded config.
    val regimes = Seq(
      (1, 1, 1, 80),    // everything tied in both
      (2, 3, 3, 120),   // heavy ties both sides
      (3, 100, 2, 150), // x nearly distinct, y binary
      (4, 0, 0, 100),   // perfectly correlated (x=y=i)
      (5, -1, -1, 100)) // perfectly anti-correlated
    for ((seed, cx, cy, n) <- regimes) {
      val rnd = new Random(seed)
      val rows = (0L until n.toLong).map { i =>
        val x = cx match {
          case 0 => i; case -1 => i; case c => rnd.nextInt(c).toLong
        }
        val y = cy match {
          case 0 => i; case -1 => n - i; case c => rnd.nextInt(c).toLong
        }
        (i, x, y)
      }
      assert(discordant(rows, blocks = 3, buckets = 7) ===
        bruteDiscordant(rows), s"regime seed=$seed cx=$cx cy=$cy")
    }
  }

  test("tau-b identity: C = n0 - D - n1 - n2 + n3 on random data") {
    val rnd = new Random(17)
    val rows = (0L until 150L).map(i =>
      (i, rnd.nextInt(10).toLong, rnd.nextInt(10).toLong))
    val n = rows.size.toLong
    val n0 = n * (n - 1) / 2
    def tiePairs(f: ((Long, Long, Long)) => Any): Long =
      rows.groupBy(f).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val n1 = tiePairs(_._2)
    val n2 = tiePairs(_._3)
    val n3 = tiePairs(r => (r._2, r._3))
    val d = discordant(rows)
    val cExpected = rows.combinations(2).count {
      case Seq((_, x1, y1), (_, x2, y2)) =>
        (x1 < x2 && y1 < y2) || (x1 > x2 && y1 > y2)
    }.toLong
    assert(n0 - d - n1 - n2 + n3 === cExpected)
  }
}
