package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  private lazy val df = {
    val s = spark
    import s.implicits._
    // x: 1..1000; y: has nulls and few distincts
    (1 to 1000).map(i => (i.toDouble,
      if (i % 10 == 0) None else Some((i % 7).toDouble)))
      .toDF("x", "y")
  }

  test("exact profile: known statistics on a known column") {
    val p = Profile.numeric(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = p("x")
    assert(x.getLong(1) == 1000L) // n
    assert(x.getLong(2) == 0L) // n_null
    assert(x.getLong(3) == 1000L) // n_distinct
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 1000.0)
    assert(x.getDouble(6) == 500.5) // mean
    assert(x.getDouble(8) == 500.5) // p50 of 1..1000 interpolates to 500.5
    assert(x.getDouble(9) == 950.05) // p95 at rank 0.95*(n-1)=949.05 → 950.05
    val y = p("y")
    assert(y.getLong(1) == 900L && y.getLong(2) == 100L)
    assert(y.getLong(3) == 7L)
  }

  test("near-unique column at a nonzero melt offset interpolates correctly") {
    // regression: with y first, x's order statistics sit at global
    // indices offset by |y|; the interpolation fraction must be the
    // column-LOCAL rank fraction (a bug here produced garbage on
    // near-unique columns while duplicate-heavy ones masked it)
    val p = Profile.numeric(df, Seq("y", "x"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("x").getDouble(8) == 500.5)
    assert(p("x").getDouble(9) == 950.05)
  }

  test("approx mode tracks exact within tolerance") {
    val exact = Profile.numeric(df, Seq("x"))
      .collect()(0)
    val approx = Profile.numeric(df, Seq("x"), approx = true)
      .collect()(0)
    // HLL at default rsd 5%
    assert(math.abs(approx.getLong(3) - exact.getLong(3)) <= 50)
    // sketch quantiles within 1% of exact for this accuracy setting
    assert(math.abs(approx.getDouble(8) - exact.getDouble(8)) <= 10.0)
    assert(math.abs(approx.getDouble(9) - exact.getDouble(9)) <= 10.0)
    // moments identical (same code path)
    assert(approx.getDouble(6) == exact.getDouble(6))
  }

  test("profiling n columns is one aggregate, not n scans") {
    val plan = Profile.numeric(df, Seq("x", "y"))
      .queryExecution.optimizedPlan.toString
    // a single LocalRelation/scan feeding one Aggregate chain — no
    // union of per-column subplans
    assert(!plan.toLowerCase.contains("union"), plan)
  }
}
