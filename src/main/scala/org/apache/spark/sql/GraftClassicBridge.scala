package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the classic `Dataset` factory
  * (`private[sql]` in Spark 4): the standard way library code
  * materializes a DataFrame over a custom `LogicalPlan` node (every
  * OSS Spark extension that adds whole-operator semantics ships this
  * one-liner). Nothing else from the internal surface is exposed. */
object GraftClassicBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
