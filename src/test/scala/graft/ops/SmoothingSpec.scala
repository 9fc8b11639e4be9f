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

  test("holt: constant series is a fixpoint; linear trend is tracked") {
    // Constant input: level locks to the value, trend stays 0,
    // forecast errors are 0 after the first step.
    val const = Smoothing.holt((0 until 10).map(i => (f"d$i%02d", 7L)), 8L, 4L)
    const.foreach { case (_, _, l, b, _, _) =>
      assert(l == 7000000L && b == 0L)
    }
    assert(const.drop(1).forall(_._6 == 0L))
    // Linear ramp: the trend estimate converges toward the true slope
    // (1e6 micro/step) and the late forecast errors shrink below the
    // early ones.
    val ramp = Smoothing.holt(
      (0 until 40).map(i => (f"d$i%02d", 100L + i)), 8L, 4L)
    val lateTrend = ramp.takeRight(5).map(_._4)
    lateTrend.foreach(b => assert(b > 500000L && b < 1500000L, b))
    val earlyErr = ramp.slice(1, 6).map(r => math.abs(r._6)).max
    val lateErr = ramp.takeRight(5).map(r => math.abs(r._6)).max
    assert(lateErr <= earlyErr)
    // step-by-step integer replay of the declared recursion
    var l = 0L; var b = 0L
    ramp.zipWithIndex.foreach { case ((_, x, lG, bG, fG, eG), i) =>
      val xm = x * 1000000L
      val f = if (i == 0) xm else l + b
      val l2 = if (i == 0) xm else f + (xm - f) / 8L
      val b2 = if (i == 0) 0L else b + ((l2 - l) - b) / 4L
      l = l2; b = b2
      assert(lG == l && bG == b && fG == f && eG == xm - f)
    }
  }

  test("holt-winters: constant fixpoint; pure weekly seasonality learned") {
    // Constant input: level locks, trend and every seasonal stay 0.
    val const = Smoothing.holtWinters(
      (0 until 21).map(i => (f"d$i%02d", 9L)), 7, 8L, 4L, 8L)
    const.foreach { case (_, _, l, b, s, _, _) =>
      assert(l == 9000000L && b == 0L && s == 0L)
    }
    assert(const.drop(1).forall(_._7 == 0L))
    // Pure period-7 signal (no trend): the seasonal array absorbs the
    // pattern, so late 1-step forecast errors shrink well below early
    // ones — the capability plain Holt structurally lacks.
    val season = Array(100L, 160L, 220L, 130L, 90L, 60L, 40L)
    val xs = (0 until 70).map(i => (f"d$i%03d", season(i % 7)))
    val hw = Smoothing.holtWinters(xs, 7, 8L, 4L, 8L)
    val earlyErr = hw.slice(7, 21).map(r => math.abs(r._7)).max
    val lateErr = hw.takeRight(14).map(r => math.abs(r._7)).max
    assert(lateErr < earlyErr / 2, s"late $lateErr vs early $earlyErr")
    val holt = Smoothing.holt(xs, 8L, 4L)
    val holtLateErr = holt.takeRight(14).map(r => math.abs(r._6)).max
    assert(lateErr < holtLateErr / 2,
      s"HW $lateErr should beat Holt $holtLateErr on seasonal data")
    // step-by-step integer replay of the declared recursion
    var l = 0L; var b = 0L
    val st = Array.fill(7)(0L)
    hw.zipWithIndex.foreach { case ((_, x, lG, bG, sG, fG, eG), i) =>
      val xm = x * 1000000L
      val pos = i % 7
      val sOld = st(pos)
      val lb = l + b
      val f = if (i == 0) xm else lb + sOld
      val l2 = if (i == 0) xm else lb + ((xm - sOld) - lb) / 8L
      val b2 = if (i == 0) 0L else b + ((l2 - l) - b) / 4L
      val s2 = if (i == 0) 0L else sOld + ((xm - l2) - sOld) / 8L
      l = l2; b = b2; st(pos) = s2
      assert(lG == l && bG == b && sG == s2 && fG == f && eG == xm - f)
    }
  }

  test("conformal radius is the k-th smallest data value; coverage holds") {
    // rank selection on a known list, ties included
    assert(Smoothing.conformalRadius(Seq(5L, 1L, 3L, 3L, 9L), 1) == 1L)
    assert(Smoothing.conformalRadius(Seq(5L, 1L, 3L, 3L, 9L), 3) == 3L)
    assert(Smoothing.conformalRadius(Seq(5L, 1L, 3L, 3L, 9L), 5) == 9L)
    // split-conformal on a seasonal series with deterministic noise:
    // calibrate on 14 post-init steps (k = 12 = ceil(0.8 * 15)),
    // score the rest — empirical coverage must be near/above 80%
    val season = Array(100L, 160L, 220L, 130L, 90L, 60L, 40L)
    val xs = (0 until 70).map { i =>
      val noise = (i * 2654435761L % 7L) - 3L // deterministic, ±3
      (f"d$i%03d", season(i % 7) + noise)
    }
    val hw = Smoothing.holtWinters(xs, 7, 8L, 4L, 8L)
    val radius = Smoothing.conformalRadius(
      hw.slice(1, 15).map(r => math.abs(r._7)), 12)
    val scored = hw.drop(15)
    val covered = scored.count(r => math.abs(r._7) <= radius)
    assert(covered.toDouble / scored.size >= 0.75,
      s"coverage $covered/${scored.size} with radius $radius")
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
