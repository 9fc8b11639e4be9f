package graft

/** Every declared query's output schema must be atomic top-level
  * columns only (OutputContract) — the driver's pandas compare cannot
  * hash array/map/struct cells (round 4's `q_pca_project` red row).
  * Builds each query's plan at sf0.001 (no execution needed: the
  * schema is a plan property; model-fitting queries do run their
  * bounded driver-side fits at plan-build time, which is cheap at
  * this scale). */
class OutputContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("all declared queries emit only atomic top-level columns") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val v = OutputContract.violations(fn(spark, dir))
        if (v.isEmpty) Nil else Seq(s"$name -> ${v.mkString("; ")}")
    }
    assert(bad.isEmpty, s"non-atomic output columns:\n${bad.mkString("\n")}")
  }

  test("every oracleSql key has a matching declared query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }
}
