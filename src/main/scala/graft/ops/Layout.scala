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

  /** Small-file compaction — the other chronic layout failure at
    * scale: a streaming sink or over-parallel writer leaves thousands
    * of KB-sized files whose per-file open/footer cost dominates every
    * later scan. Rewrite the dataset into ~`targetBytes` files,
    * range-partitioned AND sorted on `sortCols`, so the output is
    * simultaneously compacted and data-skipping-friendly (each file
    * covers a tight min/max range of the sort key — parquet stats
    * prune whole files for range predicates).
    *
    * File count is estimated from the INPUT's on-disk bytes (listing
    * the source files, so compression ratio carries over) SCALED by
    * the frame's surviving-row fraction: `inputFiles` ignores filters
    * (it lists the whole source), so compacting a filtered frame on
    * raw file bytes would over-provision the file count — more,
    * smaller files than `targetBytes` intends. The row fraction comes
    * from two counts: the frame's own (filter pushdown applies) and
    * the source files' (parquet footer metadata, no data scan).
    * Returns (inputFiles, outputFiles). One shuffle — the range
    * exchange — which is the point: paid once, amortized over every
    * subsequent scan. */
  def compact(df: DataFrame, outPath: String, sortCols: Seq[String],
      targetBytes: Long = 256L << 20): (Int, Int) = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val inFiles = df.inputFiles
    val rawBytes = inFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val sourceRows = math.max(1L, spark.read.parquet(inFiles: _*).count())
    val totalBytes = rawBytes * df.count().toDouble / sourceRows
    val nOut = math.max(1, math.ceil(totalBytes / targetBytes).toInt)
    df.repartitionByRange(nOut, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(outPath)
    val outDir = new org.apache.hadoop.fs.Path(outPath)
    val outFiles = outDir.getFileSystem(conf).listStatus(outDir)
      .count(s => s.getPath.getName.endsWith(".parquet"))
    (inFiles.length, outFiles)
  }

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

  /** Number of shuffle exchanges in the executed plan (AQE-recursed,
    * like [[isExchangeFree]]; execute the frame first or the adaptive
    * plan is still the initial one). Used by PartitionReuseSpec to PIN
    * actual Spark behavior: localCheckpoint DROPS partitioning
    * metadata (LogicalRDD reports UnknownPartitioning), so a join on
    * a checkpointed frame always plans its exchange — any
    * repartition-before-checkpoint in this repo is justified by
    * measured shuffle-write locality, never by planner reuse. */
  def shuffleCount(df: DataFrame): Long =
    countShuffles(df.queryExecution.executedPlan)

  private def countShuffles(
      p: org.apache.spark.sql.execution.SparkPlan): Long = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    p.collectWithSubqueries {
      case _: ShuffleExchangeLike => 1L
      case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
    }.sum
  }

  /** True if the executed plan contains NO Window operator — the
    * plan assert for queries rebuilt on [[PrefixSum]]/[[Shuffle]]
    * positions: a running-sum window over a low-cardinality (or
    * absent) partition key funnels each key's whole extent through
    * one task at scale, and the rebuilt plans must not regress to it.
    * Same AQE recursion caveat as [[isExchangeFree]]. */
  def isWindowFree(df: DataFrame): Boolean =
    noWindow(df.queryExecution.executedPlan)

  private def noWindow(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExecBase
    p.collectWithSubqueries {
      case _: WindowExecBase => false
      case a: AdaptiveSparkPlanExec => noWindow(a.executedPlan)
    }.forall(identity)
  }
}
