package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{CosineSimExpr, SimHash64Expr}

class GraftExtensionsSpec extends SparkSpec {

  test("extensions install and the functions work through SQL") {
    // applying to a fresh extensions object must not throw (the shared
    // test session predates extension injection, so end-to-end SQL
    // goes through the equivalent registry path below)
    new GraftExtensions().apply(new SparkSessionExtensions)

    SimHash64Expr.register(spark)
    CosineSimExpr.register(spark)
    val row = spark.sql(
      """SELECT simhash64('a b c') AS h,
        |  round(cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)), 6) AS c
        |""".stripMargin).collect()(0)
    assert(row.getLong(0) == SimHash64Expr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
    assert(row.getDouble(1) == 1.0)
  }

  test("injectPlannerStrategy plans AsOfJoinNode in an extensions session") {
    import org.apache.spark.sql.SparkSession
    val base = spark // forces the shared context to exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // Same SparkContext, NEW session state built WITH the
      // extensions — the cluster `spark.sql.extensions` path. The
      // session's experimental.extraStrategies stays empty, so only
      // the injected planner strategy can plan the node.
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne base)
      assert(s2.experimental.extraStrategies.isEmpty)
      import s2.implicits._
      val l = Seq((1L, 10L, "a"), (2L, 9L, "b")).toDF("k", "t", "tag")
      val r = Seq((1L, 4L, 7.5)).toDF("k", "t", "v")
      val node = graft.plans.AsOfMergeJoin.buildNode(l, r, "k", "t", Seq("v"))
      val df = org.apache.spark.sql.GraftClassicBridge.ofRows(s2, node)
      val got = df.orderBy("k").collect().map(row =>
        (row.getLong(0), row.getString(2),
          if (row.isNullAt(4)) -1.0 else row.getDouble(4))).toSeq
      assert(got == Seq((1L, "a", 7.5), (2L, "b", -1.0)))
      assert(df.queryExecution.executedPlan.toString
        .contains("AsOfMergeJoin"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
