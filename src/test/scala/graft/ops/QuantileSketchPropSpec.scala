package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** KLL invariants, property-style over seeded random regimes — pure
  * driver-side (no Spark session): the sketch class itself must hold
  * these regardless of how Spark partitions the stream.
  *
  *   - weight conservation: represented weight == n after any mix of
  *     adds and merges (the compaction retains odd maxima, so no
  *     weight is ever created or destroyed);
  *   - rank error: every reported quantile's true rank within 3% for
  *     k=200 across distributions (uniform, zipf-ish, constant,
  *     sorted, reversed) and sizes (10 .. 60k);
  *   - merge associativity of the ERROR BOUND: merging arbitrary
  *     splits of the stream stays within the same rank envelope;
  *   - min/max are exact (level buffers never drop extremes past the
  *     selection rule's reach at p≈0 and p≈1 with the ceil-rank
  *     definition... asserted empirically at p=1.0, which must return
  *     the true maximum's equivalence class within rank error).
  */
class QuantileSketchPropSpec extends AnyFunSuite {

  private val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def gen(regime: Int, n: Int, rnd: scala.util.Random): Seq[Double] =
    regime match {
      case 0 => Seq.fill(n)(rnd.nextDouble() * 1e6)
      case 1 => Seq.fill(n)(math.floor(1.0 / (rnd.nextDouble() + 1e-6))) // zipf-ish
      case 2 => Seq.fill(n)(42.0)
      case 3 => (1 to n).map(_.toDouble)
      case _ => (n to 1 by -1).map(_.toDouble)
    }

  private def rankErr(data: Seq[Double], est: Seq[Double]): Double = {
    val sorted = data.sorted
    probs.zip(est).map { case (q, v) =>
      // true rank interval of v: [frac <, frac ≤]; error is the
      // distance from q to that interval (duplicates widen it)
      val lo = sorted.count(_ < v).toDouble / sorted.size
      val hi = sorted.count(_ <= v).toDouble / sorted.size
      if (q < lo) lo - q else if (q > hi) q - hi else 0.0
    }.max
  }

  test("rank error and weight conservation across regimes, sizes, and splits") {
    val rnd = new scala.util.Random(101)
    for (regime <- 0 to 4; n <- Seq(10, 500, 8000, 60000)) {
      val data = gen(regime, n, rnd)
      // single-stream sketch
      val s1 = data.foldLeft(new QuantileSketch.Sketch(200))(_.add(_))
      assert(s1.n == n, s"regime $regime n $n: weight not conserved")
      val e1 = rankErr(data, s1.quantiles(probs))
      assert(e1 <= 0.03, s"regime $regime n $n: single-stream rank err $e1")
      // random split into 1..8 parts, merged in random order
      val parts = data.grouped(math.max(1, n / (1 + rnd.nextInt(8)))).toSeq
      val sketches = rnd.shuffle(parts).map(
        _.foldLeft(new QuantileSketch.Sketch(200))(_.add(_)))
      val merged = sketches.reduce(_.mergeWith(_))
      assert(merged.n == n, s"regime $regime n $n: merged weight lost")
      val e2 = rankErr(data, merged.quantiles(probs))
      assert(e2 <= 0.03, s"regime $regime n $n: merged rank err $e2")
    }
  }

  test("p=1.0 returns the maximum and p→0 stays at the low extreme") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(30000)(rnd.nextGaussian() * 100)
    val s = data.foldLeft(new QuantileSketch.Sketch(200))(_.add(_))
    val Seq(pLow, pMax) = s.quantiles(Seq(0.0001, 1.0))
    assert(pMax == data.max, "p=1.0 must be the exact maximum")
    // the low tail can only be within rank error of the true percentile
    val lo = data.sorted.apply((data.size * 0.02).toInt)
    assert(pLow <= lo, s"low-tail estimate $pLow above the 2nd percentile $lo")
  }
}
