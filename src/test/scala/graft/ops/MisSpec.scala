package graft.ops

import java.security.MessageDigest

import scala.collection.mutable

import graft.SparkSpec

/** Luby MIS: structural gates (independence + maximality — true for
  * ANY correct MIS) plus bit-for-bit parity with a driver-side replay
  * of the declared md5-priority rounds. */
class MisSpec extends SparkSpec {

  private val fixture: Seq[(Long, Long)] = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L), (3L, 7L),
    (5L, 8L), (8L, 9L), (9L, 5L), (6L, 10L), (11L, 12L), (12L, 13L))

  private def md5hex13(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.substring(0, 13)
  }

  /** Sequential replay of the exact declared semantics. */
  private def brute(edges: Seq[(Long, Long)],
      maxRounds: Int): Map[Long, Long] = {
    val adj = mutable.Map[Long, mutable.Set[Long]]()
    for ((a, b) <- edges) {
      adj.getOrElseUpdate(a, mutable.Set()) += b
      adj.getOrElseUpdate(b, mutable.Set()) += a
    }
    var active = adj.keys.toSet
    val sel = mutable.Map[Long, Long]()
    var r = 1
    while (active.nonEmpty && r <= maxRounds) {
      val p = active.map(n => n -> md5hex13(s"$n:$r")).toMap
      val winners = active.filter { v =>
        !adj(v).exists(w => active.contains(w) &&
          (p(w) < p(v) || (p(w) == p(v) && w < v)))
      }
      winners.foreach(w => sel(w) = r.toLong)
      active = active -- winners -- winners.flatMap(adj)
      r += 1
    }
    assert(active.isEmpty, "brute replay exhausted rounds")
    sel.toMap
  }

  private def run(edges: Seq[(Long, Long)],
      maxRounds: Int): Map[Long, Long] = {
    import spark.implicits._
    Mis.luby(edges.toDF("src", "dst"), maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bit-for-bit parity with the sequential md5-round replay") {
    assert(run(fixture, 12) == brute(fixture, 12))
  }

  test("independence: no edge joins two selected nodes") {
    val mis = run(fixture, 12).keySet
    assert(!fixture.exists { case (a, b) =>
      mis.contains(a) && mis.contains(b) })
  }

  test("maximality: every non-member has a selected neighbor") {
    val mis = run(fixture, 12).keySet
    val adj = fixture.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    assert((nodes -- mis).forall(v => adj(v).exists(mis.contains)))
  }

  test("triangle: exactly one of three mutually adjacent nodes wins") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val mis = run(tri, 12)
    assert(mis.size == 1 && mis == brute(tri, 12))
  }

  test("disconnected pairs each contribute one member") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L))
    val mis = run(pairs, 12).keySet
    assert(mis.size == 3 &&
      Seq((1L, 2L), (3L, 4L), (5L, 6L)).forall { case (a, b) =>
        mis.contains(a) ^ mis.contains(b) })
  }

  test("exhausting maxRounds on a live graph throws (Truss rule)") {
    // a path of 40 nodes rarely clears in 1 round; assert the
    // fail-fast rather than a silent non-maximal set
    val long = (1L to 39L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] { run(long, 1) }
  }
}
