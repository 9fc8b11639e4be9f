package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan for one or all queries.
  * `runMain graft.tools.Explain [queryName] [sfDir]` */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = name.map(Seq(_)).getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
