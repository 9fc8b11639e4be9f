package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis of the prefix-filter Jaccard join's cost shape:
  * index sizes, per-shingle prefix df, and candidate-pair counts
  * before/after verification. Usage: runMain graft.tools.PrefixProbe
  * <sfDir> */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.spread(graft.Tables.documents(spark, sfDir))
    val t = 0.3
    val withSh = docs.select(col("doc_id").as("doc"),
      graft.functions.ShingleExprs.wordShingles(spark, col("text"), 3).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val exploded = withSh.select(col("doc"), col("n_sh"),
      explode(col("sh")).as("shingle"))
    println(s"docs=${docs.count()} postings=${exploded.count()}")
    val dfCounts = exploded.groupBy(col("shingle")).agg(count(lit(1)).as("df_count"))
    println("global df deciles:")
    dfCounts.select(expr("percentile(df_count, array(0.5,0.9,0.99,0.999,1.0))")).show(false)
    val prefix = exploded.join(dfCounts, Seq("shingle"))
      .groupBy(col("doc"), col("n_sh"))
      .agg(array_sort(collect_list(struct(col("df_count"), col("shingle")))).as("ordered"))
      .withColumn("plen",
        (col("n_sh") - ceil(col("n_sh") * lit(t) - lit(1e-9)) + 1).cast("int"))
      .select(col("doc"), col("n_sh"),
        explode(slice(col("ordered"), lit(1), col("plen"))).as("p"))
      .select(col("doc"), col("n_sh"), col("p.shingle").as("shingle"))
    println(s"prefix postings=${prefix.count()}")
    val prefDf = prefix.groupBy(col("shingle")).agg(count(lit(1)).as("pdf"))
    println("prefix-df deciles + top5:")
    prefDf.select(expr("percentile(pdf, array(0.5,0.9,0.99,0.999,1.0))")).show(false)
    println("pair work = sum(pdf*(pdf-1)/2):")
    prefDf.agg(sum(col("pdf") * (col("pdf") - 1) / 2)).show(false)
    val raw = prefix.as("x").join(prefix.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
    println(s"raw candidate emissions=${raw.count()}")
    println(s"distinct candidates=${raw.distinct().count()}")
    // warm end-to-end timings of the real operator at t=0.6
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.dedup.Dedup.jaccardPairsPrefix(docs, "text", "doc_id",
        n = 3, threshold = 0.6).count()
      println(f"full prefix run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
    }
    spark.stop()
  }
}
