package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class SmoothingSpec extends AnyFunSuite {

  test("constant series is a fixpoint; bounds hold on random series") {
    val const = (0 until 10).map(i => (f"d$i%02d", 42L))
    assert(Smoothing.ewma(const, 8L).forall(r =>
      r._3 === 42000000L && r._4 === 0L))

    val rnd = new scala.util.Random(7)
    (0 until 30).foreach { _ =>
      val xs = (0 until (2 + rnd.nextInt(40))).map(i =>
        (f"d$i%02d", rnd.nextInt(1000).toLong))
      val out = Smoothing.ewma(xs, 8L)
      val lo = xs.map(_._2).min * 1000000L
      val hi = xs.map(_._2).max * 1000000L
      // s is a truncated convex combination: never escapes the data range
      out.foreach { case (_, _, s, _) => assert(s >= lo - 8L && s <= hi) }
      // moves toward the observation at every step
      out.sliding(2).foreach {
        case Seq((_, _, sPrev, _), (_, x, sCur, _)) =>
          if (x * 1000000L >= sPrev) assert(sCur >= sPrev && sCur <= x * 1000000L)
          else assert(sCur <= sPrev && sCur >= x * 1000000L)
        case _ => ()
      }
    }
  }

  test("truncating division matches DuckDB BIGINT // on negative residuals") {
    // step from s=8e6 to x=7: residual -1e6, /8 = -125000 exactly;
    // then from 7e6+... pick a residual NOT divisible by 8:
    // s=1000000, x=0 -> resid -1000000, trunc(-125000)= -125000;
    // s=3, x=0 would need micro scale; emulate with alphaDen=8 on
    // values where x*1e6 - s = -5: trunc gives 0 (floor would give -1).
    val out = Smoothing.ewma(Seq(("a", 1L), ("b", 1L)), 8L)
    assert(out.last._3 === 1000000L) // exact fixpoint, no drift
    // direct check of the division semantics used
    assert((-5L) / 8L === 0L)
    assert(Math.floorDiv(-5L, 8L) === -1L) // the divergent alternative
  }
}
