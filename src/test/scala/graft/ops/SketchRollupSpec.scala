package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchRollupSpec extends SparkSpec {

  import spark.implicits._

  // 3 groups with known distinct counts and heavy cross-group overlap
  // (user u appears in every group where u % g == 0 … just synthetic
  // rows: group g gets users [g*100, g*100 + 400) step 1 → 400
  // distincts per group, overlapping ranges across groups).
  private val rows = for {
    g <- 0 until 3
    u <- (g * 100) until (g * 100 + 400)
    _ <- 0 until 2 // duplicates must not inflate the sketch
  } yield (g, u.toLong)

  test("per-group estimates within tolerance of exact distincts") {
    val df = rows.toDF("g", "u")
    val sk = SketchRollup.sketches(df, Seq("g"), "u")
    val est = SketchRollup.rollup(sk, Seq("g"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 3).foreach { g =>
      assert(math.abs(est(g) - 400L) <= 20, s"group $g: ${est(g)}")
    }
  }

  test("merged rollup estimates the UNION, not the sum, of overlapping groups") {
    val df = rows.toDF("g", "u")
    val sk = SketchRollup.sketches(df, Seq("g"), "u")
    val total = SketchRollup.rollup(sk, Nil).collect()(0).getLong(0)
    // union = users 0..599 → 600 distinct; sum of groups would be 1200.
    assert(math.abs(total - 600L) <= 30, s"total: $total")
  }

  test("HllGrid twin: estimates within HLL error of exact, merge = union, deterministic") {
    val df = rows.toDF("g", "u")
    val regs = HllGrid.registers(df, Seq("g"), "u")
    // register frame is bounded by the grid: <= 256 rows per group
    assert(regs.groupBy(col("g")).count().collect()
      .forall(_.getLong(1) <= 256L))
    val est = HllGrid.estimate(regs, Seq("g"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // ~1.04/sqrt(256) ≈ 6.5% std error; allow 3σ ≈ 20% at n=400
    (0 until 3).foreach { g =>
      assert(math.abs(est(g) - 400L) <= 80, s"group $g: ${est(g)}")
    }
    // union-by-max merge: total ≈ 600 (sum of groups would be 1200)
    val total = HllGrid.estimate(regs, Nil).collect()(0).getLong(0)
    assert(math.abs(total - 600L) <= 120, s"total: $total")
    // duplicates must not inflate (max is idempotent): re-duplicated
    // input yields the IDENTICAL register frame and estimates
    val est2 = HllGrid.estimate(
      HllGrid.registers(df.unionAll(df), Seq("g"), "u"), Seq("g"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(est2 == est)
    // pairwise inclusion-exclusion: groups 0 and 1 share users
    // 100..499 ∩ 0..399 = 300 of 400 each
    val ov = HllGrid.overlap(HllGrid.registers(df, Seq("g"), "u"), "g")
      .where(col("g_a") === 0 && col("g_b") === 1)
      .collect()(0)
    val inter = ov.getLong(ov.fieldIndex("est_inter"))
    assert(math.abs(inter - 300L) <= 120,
      s"overlap(g0,g1) est $inter vs exact 300")
  }

  test("merge is re-rollable: day sketches re-roll to coarser grains consistently") {
    val df = rows.toDF("g", "u")
    val sk = SketchRollup.sketches(df, Seq("g"), "u")
      .withColumn("coarse", col("g") % 2)
    // merging day sketches into coarse grains ≈ sketching coarse
    // directly (within error: build path — coupon vs promoted HLL
    // mode — can shift the estimate by a hair, never more).
    val reRolled = sk.groupBy(col("coarse"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("e"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = SketchRollup.sketches(
        df.withColumn("coarse", col("g") % 2), Seq("coarse"), "u")
    val directEst = SketchRollup.rollup(direct, Seq("coarse"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    directEst.foreach { case (k, v) =>
      assert(math.abs(reRolled(k) - v) <= math.max(5L, v / 50),
        s"re-rolled $reRolled vs direct $directEst")
    }
  }

  test("repeated identical runs agree exactly; repartitioning shifts ≤ error") {
    val df = rows.toDF("g", "u")
    def est(d: org.apache.spark.sql.DataFrame) = SketchRollup.rollup(
      SketchRollup.sketches(d, Seq("g"), "u"), Seq("g"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // same plan, same partitioning → bit-identical (registers are
    // order-independent for a fixed partial-build structure)
    assert(est(df) == est(df))
    // a different partitioning changes WHICH partials promote from
    // exact coupon mode to HLL mode (measured ±1 at n≈400, lgK=12) —
    // estimates stay within sketch error, not equality
    val a = est(df); val b = est(df.repartition(7))
    a.foreach { case (k, v) =>
      assert(math.abs(b(k) - v) <= math.max(5L, v / 50), s"$a vs $b")
    }
  }

  test("pairwise overlap: inclusion-exclusion tracks exact intersections") {
    // groups: A = [0,1000), B = [500,1500) → |A∩B| = 500,
    // C = [5000,6000) → disjoint from both.
    val ov = for {
      (g, lo) <- Seq(("A", 0), ("B", 500), ("C", 5000))
      u <- lo until (lo + 1000)
    } yield (g, u.toLong)
    val sk = SketchRollup.sketches(ov.toDF("g", "u"), Seq("g"), "u")
    val out = SketchRollup.overlap(sk, "g")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out.size === 3) // AB, AC, BC — each pair once, g_a < g_b
    val (_, abOverlap, abBp) = out(("A", "B"))
    // inclusion-exclusion compounds three ~1.6%-RSE terms on sets of
    // 1000: allow 10% absolute slack on the 500-item truth
    assert(math.abs(abOverlap - 500L) <= 50, s"A∩B est $abOverlap")
    assert(math.abs(abBp - 5000L) <= 500, s"A∩B bp $abBp")
    // disjoint pairs: small residual only (subtraction noise)
    Seq(("A", "C"), ("B", "C")).foreach { p =>
      val (_, o, bp) = out(p)
      assert(o <= 60, s"$p overlap $o")
      assert(bp <= 600, s"$p bp $bp")
    }
  }

  test("overlap of a group with itself-by-another-name is total") {
    val dup = (0 until 800).flatMap(u =>
      Seq(("X", u.toLong), ("Y", u.toLong)))
    val sk = SketchRollup.sketches(dup.toDF("g", "u"), Seq("g"), "u")
    val row = SketchRollup.overlap(sk, "g").collect().head
    // identical member sets: union == each side, overlap_bp ≈ 10000
    assert(math.abs(row.getAs[Long]("overlap_bp") - 10000L) <= 300)
  }
}
