package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: one line per declared query naming any cartesian /
  * nested-loop join nodes and any GLOBAL (no-partition) window in its
  * physical plan. Broadcast nested loops against intentionally tiny
  * sides (single-query-row topK, planted LSH twins) are expected;
  * anything else is a scale bug. GlobalWindow hits are acceptable only
  * over provably BOUNDED frames (a calendar axis, distinct small-int
  * scores, strata/decile rollups — currently q_auc, q_cumulative_users,
  * q_cusum, q_emd_lengths, q_lift_table, q_logrank, q_neyman_alloc);
  * one over a corpus-sized frame is the q_abc_classes class the
  * round-6 verdict flagged — rebuild it on Shuffle.positionsBy /
  * PrefixSum.
  */
object JoinAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, q) =>
      try {
        // sparkPlan, not executedPlan: AdaptiveSparkPlanExec exposes
        // no children to collect until executed, which would make the
        // audit vacuously "clean".
        val plan = q(spark, sfDir).queryExecution.sparkPlan
        val risky = plan.collectWithSubqueries {
          case p if p.nodeName.contains("Cartesian") ||
            p.nodeName.contains("NestedLoop") => p.nodeName
          // A window with NO partition columns funnels every row
          // through one task — the q_abc_classes/q_context_pack class
          // the round-6 verdict flagged; both were rebuilt on
          // positionsBy/PrefixSum, and this keeps the class out.
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => "GlobalWindow"
        }
        println(s"AUDIT $n: ${if (risky.isEmpty) "clean" else risky.mkString(", ")}")
      } catch {
        case e: Throwable => println(s"AUDIT $n: ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
