package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec

/** Scan audit: one line per declared query and parquet scan showing
  * what actually reaches the source — read-schema width vs the file's
  * full width (column pruning) and the pushed-down data filters. A
  * scan that reads every column for a narrow projection, or a
  * selective query whose scan pushes no filters, is a 100 TB bug even
  * when the small-SF result is correct.
  *
  * Expected full-width reads: queries that genuinely consume the whole
  * row (snapshot-style selects) and the single-column documents /
  * embeddings tables.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // events.parquet is TIMESTAMP(NANOS); raw reads need this or they
    // throw PARQUET_TYPE_ILLEGAL (Tables.eventsRange sets it too).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Full column counts per table, to report pruning as read/full.
    val fullWidth: Map[String, Int] = graft.Tables.all.map { t =>
      t -> spark.read.parquet(s"$sfDir/$t.parquet").schema.size
    }.toMap
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, q) =>
      try {
        val plan = q(spark, sfDir).queryExecution.sparkPlan
        val scans = plan.collectWithSubqueries {
          case s: FileSourceScanExec =>
            val table = s.relation.location.rootPaths.headOption
              .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
            val read = s.requiredSchema.size
            val full = fullWidth.getOrElse(table, -1)
            val pushed = s.metadata.getOrElse("PushedFilters", "[]")
            val flag =
              if (full > 1 && read == full && pushed == "[]") " FULL-SCAN" else ""
            s"$table read=$read/$full pushed=$pushed$flag"
        }
        println(s"SCAN $n: ${scans.mkString(" | ")}")
      } catch {
        case e: Throwable => println(s"SCAN $n: ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
