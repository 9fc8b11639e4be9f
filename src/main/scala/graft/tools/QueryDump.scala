package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: dump ONE named SparkEntry query to parquet for a
  * single-query `tools/compare.py --only` check without the full
  * Verify pass. Usage: runMain graft.tools.QueryDump <sfDir> <outDir>
  * <name> [name...] */
object QueryDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      println(f"[dump] $n%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // Subset oracle_sql.json so tools/compare.py checks just these.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val subset = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      subset.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
