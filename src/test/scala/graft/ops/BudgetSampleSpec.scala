package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BudgetSampleSpec extends SparkSpec {

  private lazy val df = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    (1 to 3000).map { i =>
      (i.toLong, s"src${i % 5}", 1 + rnd.nextInt(40))
    }.toDF("id", "source", "weight")
  }

  test("bucketed budget cut equals the naive per-source window") {
    val got = BudgetSample.byBudget(df, "source", "id",
        col("weight").cast("long"), seed = 9L, budget = 500L)
      .select(col("id"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val naive = df.withColumn("toks", col("weight").cast("long"))
      .withColumn("k", md5(concat(lit("9|"), col("id").cast("string"))))
      .withColumn("cum", sum(col("toks")).over(
        Window.partitionBy("source").orderBy(col("k"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum") <= 500L)
      .select(col("id"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty)
    assert(got == naive)
  }

  test("kept set is the exact order prefix: budget binds per source") {
    val out = BudgetSample.byBudget(df, "source", "id",
      col("weight").cast("long"), seed = 9L, budget = 500L)
    val bySource = out.select(col("source"), col("cum"), col("toks"))
      .collect().groupBy(_.getString(0))
    assert(bySource.keySet == Set("src0", "src1", "src2", "src3", "src4"))
    bySource.values.foreach { rows =>
      val maxCum = rows.map(_.getLong(1)).max
      assert(maxCum <= 500L)
      // maximality: the budget is genuinely binding (adding the
      // smallest possible next doc would overflow is hard to assert
      // without the dropped rows; assert the prefix is near-full)
      assert(maxCum > 500L - 41L, s"prefix underfull: $maxCum")
    }
  }
}
