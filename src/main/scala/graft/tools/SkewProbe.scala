package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: does AQE's OptimizeSkewedJoin engage on a
  * shuffle_hash-HINTED join in this Spark build? Plants a hub key,
  * lowers the skew thresholds so test-SF partitions qualify, and
  * inspects the executed plan for skew-split shuffle reads. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-skew-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // skewed stream: hub key 7 carries 2M rows with a payload; the
    // rest spread over 100k keys. build side: one row per key.
    val stream = spark.range(0, 2200000L).select(
      when(col("id") < 2000000L, lit(7L)).otherwise(pmod(col("id"), lit(100000L))).as("b"),
      (col("id") * 3L).as("payload"))
    val build = spark.range(0, 100000L)
      .select(col("id").as("b"), (col("id") * 7L).as("v"))

    def runCase(label: String, hinted: Boolean): Unit = {
      val right = if (hinted) build.hint("shuffle_hash") else build
      val j = stream.join(right, "b").agg(sum(col("payload") + col("v")))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      val shj = plan.contains("ShuffledHashJoin")
      val smj = plan.contains("SortMergeJoin")
      val skewed = plan.contains("skewed=true") || plan.contains("isSkew") ||
        plan.toLowerCase.contains("skew")
      println(s"[skew] $label: SHJ=$shj SMJ=$smj skewHandled=$skewed")
      // show the join + shuffle-read lines for the record
      plan.split("\n").filter(l => l.contains("Join") ||
          l.contains("AQEShuffleRead")).take(6)
        .foreach(l => println(s"[skew]   ${l.trim.take(150)}"))
    }
    runCase("hinted shuffle_hash", hinted = true)
    runCase("unhinted (planner choice)", hinted = false)
    spark.stop()
  }
}
