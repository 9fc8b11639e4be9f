package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed layout: co-bucketed equi-joins plan without an Exchange
  * on either side, and results equal the plain join. */
class LayoutSpec extends SparkSpec {

  test("co-bucketed join is exchange-free and matches the plain join") {
    val s = spark
    import s.implicits._
    val left = (0L until 500L).map(i => (i, s"text_$i")).toDF("id", "payload")
    val right = (0L until 500L by 2L).map(i => (i, i * 10)).toDF("id", "score")
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed")
    try {
      Layout.writeBucketed(left, "bk_left", dir.resolve("l").toString, "id", 4)
      Layout.writeBucketed(right, "bk_right", dir.resolve("r").toString, "id", 4)
      val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = s.table("bk_left").join(s.table("bk_right"), Seq("id"))
        assert(Layout.isExchangeFree(joined),
          s"plan shuffles:\n${joined.queryExecution.executedPlan}")
        val got = joined.select(col("id"), col("score"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val expected = (0L until 500L by 2L).map(i => (i, i * 10)).toSet
        assert(got == expected)
        // the same join on unbucketed frames DOES shuffle — the layout
        // is what removed it
        val plain = left.join(right, Seq("id"))
        assert(!Layout.isExchangeFree(plain))
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      s.sql("DROP TABLE IF EXISTS bk_left")
      s.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
