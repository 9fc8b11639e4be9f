package graft.ops

import org.apache.spark.sql.DataFrame

/** Physical data layout for repeated-join workloads — the lever that
  * removes the shuffle ENTIRELY instead of optimizing it.
  *
  * A dedup/curation pipeline joins the same corpus by the same key
  * over and over (codes by id, pairs by id, scores by id, provenance
  * by id). Hash-bucketing the stored table on that key means every
  * subsequent equi-join between co-bucketed tables is planned WITHOUT
  * an Exchange on either side: Spark proves both sides already share
  * the bucket partitioning and sort order, so a 100 TB ⋈ 100 TB join
  * reads co-located bucket files pairwise. The shuffle is paid once at
  * write time, then amortized over every downstream join — the same
  * reasoning as the reference's key-ordered store (SURVEY §1.6:
  * BadgerDB's key order ≈ our bucket+sort order), re-expressed as a
  * Spark table property.
  *
  * Bucket count rule at scale: buckets ≈ total table bytes / target
  * task input (say 256 MB) — and IDENTICAL bucket counts on tables
  * you intend to co-join, or the smaller side still exchanges.
  */
object Layout {

  /** Write `df` as a parquet table hash-bucketed AND sorted by
    * `bucketCol` at an explicit `path` (external table — works on the
    * in-memory catalog, no Hive metastore needed). */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** True if the executed plan of `df` contains no SHUFFLE — the
    * property co-bucketed joins must exhibit. Collects
    * ShuffleExchangeLike nodes specifically: a substring match on
    * "Exchange" would also hit BroadcastExchange, misreporting a
    * (shuffle-free) broadcast-join plan. AQE wraps the real plan in
    * AdaptiveSparkPlanExec, whose inner plan is a FIELD, not a child —
    * tree collection must recurse through it explicitly. */
  def isExchangeFree(df: DataFrame): Boolean =
    noShuffle(df.queryExecution.executedPlan)

  private def noShuffle(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    p.collectWithSubqueries {
      case _: ShuffleExchangeLike => false
      case a: AdaptiveSparkPlanExec => noShuffle(a.executedPlan)
    }.forall(identity)
  }
}
