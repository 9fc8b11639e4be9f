package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SplitSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("every member of a group lands in the same split (no straddling)") {
    // 200 groups, 1-5 members each, member ids unrelated to group key
    val rows = (0 until 200).flatMap { g =>
      (0 to g % 5).map(i => (s"grp$g", g * 100 + i))
    }
    val df = rows.toDF("gkey", "id")
    val straddling = Split.byGroup(df, "gkey", splits)
      .groupBy("gkey")
      .agg(countDistinct(col("split")).as("n_splits"))
      .where(col("n_splits") > 1)
      .count()
    assert(straddling === 0L)
  }

  test("fractions are respected within coin resolution on many groups") {
    val df = (0 until 20000).map(i => s"g$i").toDF("gkey")
    val counts = Split.byGroup(df, "gkey", splits)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 20000L)
    // md5 coin is uniform: expect within ~4 sigma of the binomial sd
    assert(math.abs(counts("train") - 16000L) < 500,
      s"train=${counts("train")}")
    assert(math.abs(counts("val") - 2000L) < 300, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 2000L) < 300, s"test=${counts("test")}")
  }

  test("assignment is deterministic and independent of partitioning") {
    val df = (0 until 1000).map(i => s"k$i").toDF("gkey")
    val a = Split.byGroup(df, "gkey", splits)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = Split.byGroup(df.repartition(13), "gkey", splits)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("summary accounts for every row exactly once and flags dup groups") {
    val df = Seq(
      ("h1", 1), ("h1", 2), ("h1", 3), // dup group of 3
      ("h2", 4), // singleton
      ("h3", 5), ("h3", 6)) // dup group of 2
      .toDF("gkey", "id")
    val s = Split.summary(df, "gkey", splits).collect()
    assert(s.map(_.getLong(1)).sum === 6L) // n_docs covers all rows
    assert(s.map(_.getLong(2)).sum === 3L) // n_groups covers all groups
    assert(s.map(_.getLong(3)).sum === 5L) // dup docs: 3 + 2
  }

  test("k-fold: covers all folds, group-atomic, deterministic") {
    val rows = (0 until 300).flatMap { g =>
      (0 to g % 3).map(i => (s"grp$g", g * 10 + i))
    }
    val df = rows.toDF("gkey", "id")
      .withColumn("fold", Split.foldOf(col("gkey"), 5))
    val folds = df.select("fold").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(folds.toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    val straddling = df.groupBy("gkey")
      .agg(countDistinct(col("fold")).as("nf"))
      .where(col("nf") > 1).count()
    assert(straddling === 0L)
    // deterministic and partition-independent
    val a = df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val b = rows.toDF("gkey", "id").repartition(11)
      .withColumn("fold", Split.foldOf(col("gkey"), 5))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a === b)
    // roughly balanced: each fold gets 300/5 = 60 groups ± slack
    val perFold = df.select("gkey", "fold").distinct()
      .groupBy("fold").count().collect().map(_.getLong(1))
    perFold.foreach(n => assert(math.abs(n - 60L) < 30, perFold.toSeq))
    intercept[IllegalArgumentException] { Split.foldOf(col("gkey"), 1) }
  }

  test("two-way split degenerates correctly; bad fractions rejected") {
    val df = Seq("a", "b", "c").toDF("gkey")
    val two = Split.byGroup(df, "gkey", Seq("train" -> 0.5, "test" -> 0.5))
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(two.subsetOf(Set("train", "test")))
    intercept[IllegalArgumentException] {
      Split.assign(col("gkey"), Seq("a" -> 0.5, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      Split.assign(col("gkey"), Seq("only" -> 1.0))
    }
  }
}
