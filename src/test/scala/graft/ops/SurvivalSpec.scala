package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class SurvivalSpec extends AnyFunSuite {

  /** Exact rational product-limit via BigInt fractions (no
    * truncation): S_k = Π (n_i − d_i)/n_i over event times ≤ k. */
  private def rational(byT: Seq[(Long, Long, Long)]): Seq[(Long, BigInt, BigInt)] = {
    val total = byT.map(_._2).sum
    var before = 0L
    var num = BigInt(1); var den = BigInt(1)
    byT.sortBy(_._1).flatMap { case (t, ne, d) =>
      val nRisk = total - before
      before += ne
      num *= (nRisk - d); den *= nRisk
      if (d > 0) Some((t, num, den)) else None
    }
  }

  test("tracks the exact rational product within one micro per event step") {
    val rnd = new scala.util.Random(11)
    (0 until 40).foreach { _ =>
      val byT = (0L until (2 + rnd.nextInt(20))).map { t =>
        val ne = 1L + rnd.nextInt(30)
        (t, ne, rnd.nextInt(ne.toInt + 1).toLong)
      }
      val got = Survival.productLimit(byT)
      val exact = rational(byT)
      assert(got.map(r => (r._1, r._2, r._3)) ===
        exact.zip(gotRisk(byT)).map { case ((t, _, _), (nr, d)) => (t, nr, d) })
      got.zip(exact).zipWithIndex.foreach { case (((_, _, _, sMicro), (_, num, den)), i) =>
        val floorExact = (BigInt(1000000) * num / den).toLong
        assert(sMicro <= floorExact, s"byT=$byT")
        // each step truncates at most 1 micro, and the error can only
        // shrink under later (<=1) multipliers
        assert(sMicro >= floorExact - (i + 1), s"byT=$byT")
      }
      // monotone nonincreasing, bounded by [0, 1e6]
      got.map(_._4).foldLeft(1000000L) { (prev, s) =>
        assert(s <= prev && s >= 0L); s
      }
    }
  }

  private def gotRisk(byT: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
    val total = byT.map(_._2).sum
    var before = 0L
    byT.sortBy(_._1).flatMap { case (_, ne, d) =>
      val nRisk = total - before
      before += ne
      if (d > 0) Some((nRisk, d)) else None
    }
  }

  test("censoring shrinks risk sets without touching S; exact powers stay exact") {
    // 8 subjects: death at t=1 (n=8), 3 censored at t=2,
    // death at t=3 (n=4), 3 censored at t=4
    val byT = Seq((1L, 1L, 1L), (2L, 3L, 0L), (3L, 1L, 1L), (4L, 3L, 0L))
    val got = Survival.productLimit(byT)
    assert(got === Seq((1L, 8L, 1L, 875000L), (3L, 4L, 1L, 656250L)))
  }

  test("no deaths means an empty curve; all-deaths single time hits zero") {
    assert(Survival.productLimit(Seq((5L, 4L, 0L))) === Seq.empty)
    assert(Survival.productLimit(Seq((2L, 3L, 3L))) === Seq((2L, 3L, 3L, 0L)))
  }
}
