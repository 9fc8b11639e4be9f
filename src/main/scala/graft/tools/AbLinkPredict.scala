package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-session A/B of the two RA-candidate plans (join-form vs
  * aggregate+map-side-pair form) on the sf0.1 co-purchase graph and on
  * a hub-skewed synthetic — methodology per the build notes: compare
  * solo-to-solo in ONE session, best of 3, GC settle between runs. */
object AbLinkPredict {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("ab-linkpredict")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().localCheckpoint(true)
    val edges = li.as("x")
      .join(li.as("y"), col("x.ok") === col("y.ok") &&
        col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("src"), col("y.pk").as("dst"))
      .agg(count(lit(1)).as("w")).where(col("w") >= 2)
      .select(col("src"), col("dst")).localCheckpoint(true)
    val hub = spark.range(6000L).select(col("id").as("src"),
      lit(999999999L).as("dst"))
    val skewed = edges.union(hub).localCheckpoint(true)

    def time(tag: String, build: () => DataFrame): Long = {
      var n = 0L
      val best = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(300)
        val t0 = System.nanoTime()
        n = build().count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"AB $tag%-28s best=$best%6.3f s rows=$n")
      n
    }

    for (cap <- Seq(1024, 8192)) {
      val a = time(s"join-form cap=$cap (copurch)",
        () => graft.ops.LinkPredict.raJoin(edges, cap))
      val b = time(s"agg-form  cap=$cap (copurch)",
        () => graft.ops.LinkPredict.ra(edges, cap))
      require(a == b, s"row counts differ: $a vs $b")
    }
    val a2 = time("join-form cap=1024 (hub)",
      () => graft.ops.LinkPredict.raJoin(skewed, 1024))
    val b2 = time("agg-form  cap=1024 (hub)",
      () => graft.ops.LinkPredict.ra(skewed, 1024))
    require(a2 == b2)
    // content equality, not just counts
    val d = graft.ops.LinkPredict.raJoin(edges, 1024)
      .exceptAll(graft.ops.LinkPredict.ra(edges, 1024)).count()
    println(s"AB content diff rows: $d")
    require(d == 0L)
    spark.stop()
  }
}
