package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Same-session drift adjudicator: re-times a comma-separated query
  * list (args: sfDir queries [reps]) with the Bench methodology —
  * primed tables, one untimed warmup, full GC + settle before every
  * timed rep — and prints EVERY rep, not just the min. Cross-round
  * "regressions" in files with zero diff are adjudicated here: if the
  * same-session spread covers both rounds' numbers, it is machine
  * drift (the documented ±50% run-to-run swing); a floor that never
  * returns to the old number is a real plan change. */
object AbDrift {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val queries = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-ab-drift")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val p = s"$sfDir/$t.parquet"
      if (new java.io.File(p).exists())
        try spark.read.parquet(p).count()
        catch { case _: Throwable => () }
    }
    queries.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).foreach(_ => ()) // warmup
      val times = (1 to reps).map { _ =>
        System.gc()
        Thread.sleep(500)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = times.sorted
      println(f"[ab] $n reps=${times.map(t => f"$t%.3f").mkString(",")} " +
        f"min=${sorted.head}%.3f median=${sorted(reps / 2)}%.3f")
    }
    spark.stop()
  }
}
