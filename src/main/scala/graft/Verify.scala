package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Output contract: atomic top-level columns only (see OutputContract)
    // — a violating query is still written (the driver should see it),
    // but the run exits non-zero naming the offender.
    val contractBad = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    // SPARK_GRAFT_QUERIES=a,b,c limits the dump (local iteration only;
    // the driver always runs the full set — same contract as Bench).
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_GATES_ONLY=1 skips the query dump and runs just the
    // recall gates (local gate iteration; the driver never sets it).
    val gatesOnly = sys.env.get("SPARK_GRAFT_GATES_ONLY").contains("1")
    val selected = only match {
      case _ if gatesOnly => Map.empty[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]
      case Some(ks) => SparkEntry.queries.view.filterKeys(ks).toMap
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = OutputContract.violations(df)
        if (bad.nonEmpty) {
          contractBad(name) = bad
          System.err.println(
            s"[verify] $name VIOLATES output contract (non-atomic columns): " +
              bad.mkString("; "))
        }
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles = only match {
      case Some(ks) => SparkEntry.oracleSql.view.filterKeys(ks).toMap
      case None => SparkEntry.oracleSql
    }
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Recall gates for the approximate paths (queries with no SQL
    // oracle): assert spec-level recall/equivalence on the verify-scale
    // data and FAIL the gate (non-zero exit) on violation — the driver's
    // rows-only check would stay green through a silent recall collapse.
    // Gates are skipped on a filtered local iteration run; the driver's
    // unfiltered run always exercises them.
    val gates =
      if (only.isDefined && !gatesOnly) Nil else RecallGates.run(spark, sfDir)
    gates.foreach { g =>
      val status = if (g.pass) "PASS" else "FAIL"
      println(f"[recall] ${g.name}%-24s value=${g.value}%.4f floor=${g.floor}%.3f $status")
    }
    spark.stop()
    if (gates.exists(!_.pass)) {
      System.err.println(s"[verify] recall gate FAILED: " +
        gates.filterNot(_.pass).map(_.name).mkString(", "))
      sys.exit(1)
    }
    if (contractBad.nonEmpty) {
      System.err.println(s"[verify] output contract FAILED: " +
        contractBad.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
