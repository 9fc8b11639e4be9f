package graft.ops

import graft.SparkSpec

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  /** O(n^2) reference: pool ANY adjacent violator repeatedly until the
    * sequence is nondecreasing. PAV's fixpoint is unique, so the
    * scan order doesn't matter. */
  private def brute(bins: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] = {
    var pools = bins.sortBy(_._1).map { case (k, n, p) => (List(k), n, p) }.toList
    var changed = true
    while (changed) {
      changed = false
      val out = scala.collection.mutable.ListBuffer[(List[Long], Long, Long)]()
      pools.foreach { cur =>
        if (out.nonEmpty && out.last._3 * cur._2 > cur._3 * out.last._2) {
          val prev = out.remove(out.length - 1)
          out += ((prev._1 ++ cur._1, prev._2 + cur._2, prev._3 + cur._3))
          changed = true
        } else out += cur
      }
      pools = out.toList
    }
    pools.flatMap { case (ks, n, p) => ks.map(_ -> (p, n)) }.toMap
  }

  private def rate(r: (Long, Long)): Double = r._1.toDouble / r._2

  test("matches the brute-force fixpoint on random bin tables") {
    val rnd = new scala.util.Random(3)
    (0 until 30).foreach { _ =>
      val bins = (0L until (2 + rnd.nextInt(12))).map { k =>
        (k, 1L + rnd.nextInt(50).toLong, rnd.nextInt(40).toLong)
      }.map { case (k, n, p) => (k, n, math.min(p, n)) }
      assert(Isotonic.pav(bins) === brute(bins), s"bins=$bins")
    }
  }

  test("already-monotone input is unchanged; decreasing input pools to one rate") {
    val mono = Seq((0L, 10L, 1L), (1L, 10L, 3L), (2L, 10L, 7L))
    assert(Isotonic.pav(mono) ===
      Map(0L -> ((1L, 10L)), 1L -> ((3L, 10L)), 2L -> ((7L, 10L))))
    val dec = Seq((0L, 10L, 9L), (1L, 10L, 5L), (2L, 10L, 1L))
    val fit = Isotonic.pav(dec)
    assert(fit.values.toSet === Set((15L, 30L)))
  }

  test("fitted sequence is nondecreasing and conserves weighted mass per pool") {
    val bins = Seq((0L, 5L, 1L), (1L, 7L, 5L), (2L, 3L, 1L), (3L, 9L, 8L),
      (4L, 4L, 1L), (5L, 6L, 6L))
    val fit = Isotonic.pav(bins)
    val seq = bins.map(_._1).sorted.map(fit)
    seq.sliding(2).foreach {
      case Seq(a, b) => assert(rate(a) <= rate(b) + 1e-15)
      case _ =>
    }
    // mass conservation: summing n_bin * pooledRate over a pool's bins
    // returns exactly the pool's positives, so the global sum matches.
    val total = bins.map { case (k, n, _) =>
      val (p, pn) = fit(k); BigInt(n) * p -> BigInt(pn)
    }
    val lhs = total.map { case (np, pn) => BigDecimal(np) / BigDecimal(pn) }.sum
    assert((lhs - BigDecimal(bins.map(_._3).sum)).abs < BigDecimal("1e-18"))
  }

  test("fitBinned joins the fitted basis points back distributively") {
    val df = Seq((0L, 10L, 9L), (1L, 10L, 5L), (2L, 10L, 1L))
      .toDF("bin", "n", "pos")
    val got = Isotonic.fitBinned(df).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(0L -> 5000L, 1L -> 5000L, 2L -> 5000L))
  }
}
