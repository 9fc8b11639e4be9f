package graft.ops

import graft.SparkSpec

class CentralitySpec extends SparkSpec {
  import spark.implicits._

  // star center 0 with leaves 1-6, plus a chain 6-7-8-9 hanging off
  // one leaf: the center dominates, the chain tail trails
  private val edges = (1L to 6L).map(l => (0L, l)) ++
    Seq((6L, 7L), (7L, 8L), (8L, 9L))

  /** Brute multi-source BFS + harmonic sum, mirroring the declared
    * rules (md5-rank sources, depth bound, 10^6 div d terms). */
  private def brute(es: Seq[(Long, Long)], nSources: Int, maxDepth: Int)
      : Map[Long, (Long, Long)] = {
    def md5r(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)
    val adj = (es ++ es.map(_.swap)).groupMap(_._1)(_._2)
    val nodes = adj.keySet.toSeq
    val srcs = nodes.sortBy(n => (md5r(n), n)).take(nSources)
    val contrib = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    srcs.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0)
      var frontier = Set(s)
      for (d <- 1 to maxDepth) {
        frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
        frontier.foreach(n => dist(n) = d)
      }
      dist.foreach { case (n, d) =>
        if (d >= 1) {
          val (h, c) = contrib.getOrElse(n, (0L, 0L))
          contrib(n) = (h + 1000000L / d, c + 1)
        }
      }
    }
    contrib.toMap
  }

  test("distributed multi-source harmonic equals the brute replay; star center tops") {
    val got = Centrality.sampledHarmonic(edges.toDF("src", "dst"),
        nSources = 8, maxDepth = 4, k = 10)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(0), r.getLong(2), r.getLong(3))))
      .toMap
    val want = brute(edges, 8, 4)
    // same nodes, same integer centralities and reach counts
    assert(got.keySet.subsetOf(want.keySet))
    got.foreach { case (n, (_, h, c)) =>
      assert(want(n) == ((h, c)), s"node $n: got ($h,$c) want ${want(n)}")
    }
    // ranking: h desc, node asc — and the star center leads
    val byRank = got.toSeq.sortBy(_._2._1).map(x => (x._1, x._2._2))
    assert(byRank.map(_._2).reverse == byRank.map(_._2).reverse.sorted.reverse ||
      byRank.sliding(2).forall { case Seq(a, b) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) })
    assert(byRank.head._1 == 0L, s"star center must rank 1: $byRank")
    // the chain tail 9 (3+ hops from most sources) trails the center
    assert(got(0L)._2 > got(9L)._2)
  }

  test("double sweep is exact on trees: path graph diameter recovered") {
    // path 0-1-...-9: whatever the md5-smallest seed is, the farthest
    // node is an endpoint, and the second sweep spans the full path
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val r = Centrality.diameterDoubleSweep(path, maxDepth = 16)
      .collect()(0)
    assert(r.getLong(3) == 9L, s"diameter_lb ${r.getLong(3)}")
    assert(Set(0L, 9L).contains(r.getLong(1)), s"far_node ${r.getLong(1)}")
    assert(r.getLong(4) == 10L)
    // star + chain fixture: diameter = chain tail to opposite leaf
    val r2 = Centrality.diameterDoubleSweep(edges.toDF("src", "dst"),
      maxDepth = 16).collect()(0)
    assert(r2.getLong(3) == 5L, s"star+chain diameter ${r2.getLong(3)}")
  }

  test("sweepStats telemetry == hopsOnUnd telemetry, every batch width") {
    // fixtures exercising odd/even depths, mid-batch exhaustion, and
    // depth-bound truncation: star+chain, pure path, triangle
    val fixtures = Seq(
      edges,
      (0L until 9L).map(i => (i, i + 1)),
      Seq((0L, 1L), (1L, 2L), (2L, 0L)))
    for (es <- fixtures; seed <- Seq(0L, 9L).filter(s =>
           es.exists(e => e._1 == s || e._2 == s));
         maxHops <- Seq(1, 2, 3, 5, 16); hpj <- Seq(1, 2, 3)) {
      val und = Bfs.undOf(es.toDF("src", "dst"))
      val (visited, ecc, last) = Bfs.hopsOnUnd(und, seed, maxHops)
      val wantFar = last.agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.col("node")))
        .collect()(0).getLong(0)
      val wantReached = visited.count()
      val got = Bfs.sweepStats(und, seed, maxHops, hopsPerJob = hpj)
      assert(got == ((ecc, wantFar, wantReached)),
        s"es=${es.take(3)}.. seed=$seed maxHops=$maxHops hpj=$hpj: " +
          s"got $got want (${ecc}, $wantFar, $wantReached)")
    }
  }

  test("depth bound truncates honestly: depth 1 only counts neighbors") {
    val got = Centrality.sampledHarmonic(edges.toDF("src", "dst"),
        nSources = 8, maxDepth = 1, k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    val want = brute(edges, 8, 1)
    got.foreach { case (n, c) => assert(want(n)._2 == c, s"node $n") }
  }
}
