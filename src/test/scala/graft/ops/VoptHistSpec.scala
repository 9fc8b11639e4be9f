package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VoptHistSpec extends SparkSpec {
  import spark.implicits._

  // bimodal: tight cluster near 10, tight cluster near 1000, a few
  // stragglers — v-optimal must isolate the modes, which equi-width
  // over the same range would not
  private lazy val bimodal = (
    (0 until 40).map(i => 10.0 + (i % 5)) ++
    (0 until 40).map(i => 1000.0 + (i % 5)) ++
    Seq(300.0, 301.0, 699.0, 700.0)
  ).toDF("v")

  private def run(m: Int, b: Int) =
    VoptHist.plan(bimodal, col("v"), m, b).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  /** Exhaustive check: enumerate every b-way split of the m cells and
    * recompute total floored SSE the same way. */
  private def bruteBest(m: Int, b: Int): Long = {
    val vals = bimodal.select(floor(col("v")).cast("long")).collect()
      .map(_.getLong(0))
    val lo = vals.min
    val w = (vals.max - lo) / m + 1
    val cellOf = vals.map(v => ((v - lo) / w).toInt)
    def cst(i: Int, j: Int): Long = {
      val in = vals.indices.filter(x => cellOf(x) >= i && cellOf(x) < j)
      if (in.isEmpty) 0L
      else {
        val n = in.size.toLong
        val a = in.map(vals(_)).sum.toDouble
        val q = in.map(x => vals(x) * vals(x)).sum.toDouble
        math.floor(q - a * a / n.toDouble).toLong
      }
    }
    // all monotone boundary tuples 0 <= i1 <= ... <= i(b-1) <= m
    def splits(k: Int, from: Int): Seq[List[Int]] =
      if (k == 0) Seq(Nil)
      else (from to m).flatMap(i => splits(k - 1, i).map(i :: _))
    splits(b - 1, 0).map { cuts =>
      val edges = 0 :: cuts ::: List(m)
      edges.sliding(2).map { case List(i, j) => cst(i, j) }.sum
    }.min
  }

  test("DP total SSE equals the exhaustive optimum") {
    val got = run(m = 8, b = 3)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_._5).sum == bruteBest(8, 3))
    // buckets tile the range without gaps
    got.sliding(2).foreach { case Array(a, b2) =>
      assert(a._3 == b2._2, s"gap between $a and $b2")
    }
    assert(got.map(_._4).sum == 84L)
  }

  test("v-optimal separates the bimodal clusters (equi-width would not)") {
    val got = run(m = 16, b = 3)
    // the two modes land in DIFFERENT buckets...
    def bucketOf(v: Long) =
      got.find(r => r._2 <= v && v < r._3).map(_._1).get
    assert(bucketOf(10L) != bucketOf(1000L))
    // ...and splitting pays off by orders of magnitude vs one bucket
    // (the DP may keep a straggler with a mode when a boundary is
    // worth more elsewhere — that IS the optimum, per the exhaustive
    // test above)
    val one = run(m = 16, b = 1).head._5
    assert(got.map(_._5).sum < one / 20,
      s"3 buckets should slash the bimodal SSE: ${got.map(_._5).sum} vs $one")
  }

  test("boundary cases: b=1 is the global SSE; b=m refines further") {
    val one = run(m = 8, b = 1)
    assert(one.length == 1 && one.head._4 == 84L)
    val full = VoptHist.plan(bimodal, col("v"), 8, 8).collect()
    assert(full.map(_.getLong(4)).sum <= one.head._5)
  }
}
