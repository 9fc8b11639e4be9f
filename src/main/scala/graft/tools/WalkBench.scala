package graft.tools

import org.apache.spark.sql.SparkSession

/** Walker throughput bench: distributed-walk a real directory tree and
  * report entries/second — the reference engine's headline metric
  * (BASELINE.md quotes ~4,700 files/s for its scanner on Lustre;
  * obviously different hardware, but this puts OUR number on record on
  * the same terms). Usage:
  *
  *   runMain graft.tools.WalkBench [ROOT] [SEED_DEPTH]
  *
  * Defaults to /usr (read-only system tree, present everywhere).
  * Prints one JSON line and appends nothing anywhere else.
  */
object WalkBench {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/usr")
    val seedDepth = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-walkbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // Warmup pass (JIT + page cache), then the timed pass — matching
    // Bench methodology and the steady-state of a long-running scan.
    graft.ingest.Walker.walk(spark, root, seedDepth = seedDepth)
      .records.map(_ => 1L).count()
    val t0 = System.nanoTime()
    val res = graft.ingest.Walker.walk(spark, root, seedDepth = seedDepth)
    val (entries, errors) = res.records
      .map(r => (if (r.entry.isDefined) 1L else 0L, if (r.error.isDefined) 1L else 0L))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"walk_entries_per_sec","value":${entries / sec}%.0f,"entries":$entries,"errors":$errors,"seconds":$sec%.3f,"root":"$root"}""")
    spark.stop()
  }
}
