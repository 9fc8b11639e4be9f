package graft.ops

import graft.SparkSpec

class WaterFillSpec extends SparkSpec {
  import spark.implicits._

  test("no caps binding: pure proportional split, exact total") {
    val out = WaterFill.allocate(
      Seq(("a", 1000L, 2L), ("b", 1000L, 1L), ("c", 1000L, 1L)), 400L)
    assert(out("a") === 200L)
    assert(out("b") === 100L)
    assert(out("c") === 100L)
  }

  test("a capped source's excess re-flows proportionally") {
    // a wants 200 but supplies only 50; the 150 excess flows to b/c 1:1
    val out = WaterFill.allocate(
      Seq(("a", 50L, 2L), ("b", 1000L, 1L), ("c", 1000L, 1L)), 400L)
    assert(out("a") === 50L)
    assert(out("b") === 175L)
    assert(out("c") === 175L)
    assert(out.values.sum === 400L)
  }

  test("cascading caps: excess flows through multiple saturation rounds") {
    val out = WaterFill.allocate(
      Seq(("a", 10L, 5L), ("b", 60L, 3L), ("c", 10000L, 2L)), 1000L)
    assert(out("a") === 10L)
    assert(out("b") === 60L)
    assert(out("c") === 930L)
  }

  test("budget above total supply allocates everything; never above cap") {
    val src = Seq(("a", 30L, 1L), ("b", 70L, 9L))
    val out = WaterFill.allocate(src, 1000000L)
    assert(out === Map("a" -> 30L, "b" -> 70L))
  }

  test("largest-remainder tail: sums exactly, deterministic ties") {
    // 100 over 3 equal weights: 33/33/33 + 1 remainder -> name order
    val out = WaterFill.allocate(
      Seq(("x", 100L, 1L), ("y", 100L, 1L), ("z", 100L, 1L)), 100L)
    assert(out.values.sum === 100L)
    assert(out.values.toSeq.sorted === Seq(33L, 33L, 34L))
    val again = WaterFill.allocate(
      Seq(("z", 100L, 1L), ("y", 100L, 1L), ("x", 100L, 1L)), 100L)
    assert(out === again) // input order never matters
  }

  test("zero weight / zero supply sources get nothing") {
    val out = WaterFill.allocate(
      Seq(("a", 100L, 0L), ("b", 0L, 5L), ("c", 100L, 1L)), 50L)
    assert(out("a") === 0L)
    assert(out("b") === 0L)
    assert(out("c") === 50L)
  }

  test("property: sum == min(budget, supply), caps respected, monotone in weight") {
    val rnd = new scala.util.Random(3)
    (1 to 50).foreach { _ =>
      val src = (1 to 1 + rnd.nextInt(8)).map(i =>
        (s"s$i", rnd.nextInt(500).toLong, rnd.nextInt(5).toLong))
      val budget = rnd.nextInt(2000).toLong
      val out = WaterFill.allocate(src, budget)
      val usable = src.filter(s => s._3 > 0).map(_._2).sum
      assert(out.values.sum === math.min(budget, usable),
        s"$src budget=$budget -> $out")
      src.foreach { case (n, cap, _) => assert(out(n) <= cap) }
    }
  }

  test("DataFrame form aggregates supply and returns the allocation") {
    val df = (Seq.fill(30)("a") ++ Seq.fill(10)("b") ++ Seq.fill(60)("c"))
      .toDF("source")
    val out = WaterFill.allocateByCount(df, "source",
      Map("a" -> 1L, "b" -> 1L, "c" -> 2L), budget = 40L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a")._1 === 30L) // supply from counts
    assert(out.values.map(_._3).sum === 40L)
    assert(out("c")._3 === 20L) // weight 2 of 4
  }

  test("epoch plan: allocations decompose into bounded epochs, budget exact") {
    val rows = graft.SparkEntry.queries("q_epoch_plan")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val totalDocs = rows.map(_._2).sum
    // budget is 2x the corpus and caps (4 epochs) leave headroom, so
    // the whole budget lands
    assert(rows.map(_._3).sum === 2L * totalDocs)
    rows.foreach { case (src, n, alloc, full, rem, bp) =>
      assert(alloc === full * n + rem, src)
      assert(rem >= 0L && rem < n, src)
      assert(full <= 4L, src) // the maxEpochs repeat ceiling
      assert(bp === alloc * 10000L / n, src)
    }
    // some source actually repeats: the budget is 2x total supply,
    // so at least one allocation must exceed its source's doc count
    assert(rows.exists(_._4 >= 1L), "no source repeated under a 2x budget")
  }
}
