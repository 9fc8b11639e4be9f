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
}
