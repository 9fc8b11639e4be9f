package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's main query pipeline (`idu stats compute`,
  * stats.go:115-168 → stats/totals.go:150-209 → report_stats.go):
  * filtered totals, per-user/per-group totals, and bounded top-N
  * rankings — as declarative DataFrame aggregations.
  *
  * Matching semantics replicated exactly (totals.go:150-209):
  *   - a PREFIX (directory) that matches the expression contributes
  *     `prefixes`, its own `size` to `bytes` AND `prefix_bytes`, and
  *     calc(size, blocks) to `storage_bytes`;
  *   - ENTRIES are counted only when their parent prefix matched AND
  *     the entry itself matches: child dirs → `sub_prefixes`; duplicate
  *     hardlinks → `hardlinks` (bytes NOT added); files → `files`,
  *     `bytes`, `storage_bytes`.
  *
  * Hardlink canonicalization: the reference counts the first
  * (device, inode) seen during an UNORDERED concurrent scan — which
  * link survives is nondeterministic (SURVEY.md §2.3 J4). We define
  * the canonical link as the lexicographically-least path, computed
  * with one window — a documented, deterministic improvement.
  *
  * Scale: one semi-join of entries against matched prefixes (broadcast
  * when the matched-prefix set is small, shuffle otherwise — left to
  * AQE), then partial+final hash aggregations. No collect, no driver
  * state; top-N compiles to TakeOrderedAndProject.
  */
object Stats {

  final case class Computed(
      /** single row: global totals (reference Totals struct, totals.go:17-27) */
      totals: DataFrame,
      /** one row per uid */
      perUser: DataFrame,
      /** one row per gid */
      perGroup: DataFrame,
      /** one row per prefix (input to rankings; reference computes these
        * per-prefix folds as heap inputs, report_stats.go:231-245) */
      perPrefix: DataFrame,
      /** one row per (uid, prefix) — feeds the per-user report file
        * trees (reference PerIDStats, report_stats.go:34-39, consumed
        * by writeReportFiles, reports.go:128-229) */
      perUserPrefix: DataFrame,
      /** one row per (gid, prefix) */
      perGroupPrefix: DataFrame)

  // sum() over zero rows is NULL in SQL; the reference's zero-value
  // Totals struct means empty must aggregate to 0 (totals.go:17-27).
  private def zsum(c: Column): Column = coalesce(sum(c), lit(0L))

  private val aggCols: Seq[Column] = Seq(
    zsum(when(col("is_prefix_row"), 1L).otherwise(0L)).as("prefixes"),
    zsum(when(!col("is_prefix_row") && col("is_dir"), 1L).otherwise(0L)).as("sub_prefixes"),
    zsum(when(!col("is_prefix_row") && !col("is_dir") && col("is_canonical"), 1L).otherwise(0L)).as("files"),
    zsum(when(!col("is_prefix_row") && !col("is_dir") && !col("is_canonical"), 1L).otherwise(0L)).as("hardlinks"),
    zsum(when(col("is_prefix_row") || (!col("is_dir") && col("is_canonical")), col("size")).otherwise(0L)).as("bytes"),
    zsum(when(col("is_prefix_row"), col("size")).otherwise(0L)).as("prefix_bytes"),
    zsum(when(col("is_prefix_row") || (!col("is_dir") && col("is_canonical")), col("storage")).otherwise(0L)).as("storage_bytes"))

  /** Compute all stats frames for one expression over the fact table.
    *
    * @param files the FileEntry fact table (see graft.model.FileEntry)
    * @param prefixMatch predicate applied to directory rows (the
    *   reference's `Matcher.Prefix`)
    * @param entryMatch predicate applied to entry rows (the reference's
    *   `Matcher.Entry`); pass `lit(true)` for match-all
    * @param countHardlinkDupsAsFiles reference config
    *   `CountHardlinkAsFiles` (stats.go:126): when true, every link
    *   counts bytes; when false only the canonical link does
    */
  def compute(
      files: DataFrame,
      prefixMatch: Column = lit(true),
      entryMatch: Column = lit(true),
      calc: Calculator = Calculator.Identity,
      countHardlinkDupsAsFiles: Boolean = false): Computed = {

    // Canonical-hardlink flag: first (device, inode) by path order.
    // Only the nlink > 1 slice (typically ≪1% of rows) pays the
    // (device, inode) shuffle for the window; everything else is
    // canonical by definition and goes around it.
    val withCanon =
      if (countHardlinkDupsAsFiles) files.withColumn("is_canonical", lit(true))
      else {
        val linkRank = row_number().over(
          Window.partitionBy(col("device"), col("inode")).orderBy(col("path")))
        val multi = files.where(col("nlink") > 1)
          .withColumn("is_canonical", linkRank === 1)
        val single = files.where(col("nlink") <= 1 || col("nlink").isNull)
          .withColumn("is_canonical", lit(true))
        single.unionByName(multi)
      }

    // Matched prefixes (dir rows passing prefixMatch).
    val matchedPrefixes = withCanon
      .where(col("is_dir") && prefixMatch)
      .select(col("path").as("prefix_path"))

    // The prefix's own contribution rows.
    val prefixRows = withCanon
      .where(col("is_dir") && prefixMatch)
      .withColumn("is_prefix_row", lit(true))
      .withColumn("agg_prefix", col("path"))

    // Entry rows: any row whose parent is a matched prefix and which
    // itself passes entryMatch (dirs count as sub_prefixes).
    val entryRows = withCanon
      .where(entryMatch)
      .join(matchedPrefixes, col("parent") === col("prefix_path"), "left_semi")
      .withColumn("is_prefix_row", lit(false))
      .withColumn("agg_prefix", col("parent"))

    val contrib = prefixRows.unionByName(entryRows)
      .withColumn("storage", calc(col("size"), col("blocks")))
      .select(col("agg_prefix"), col("uid"), col("gid"), col("is_prefix_row"),
        col("is_dir"), col("is_canonical"), col("size"), col("storage"))

    Computed(
      totals = contrib.agg(aggCols.head, aggCols.tail: _*),
      perUser = contrib.groupBy(col("uid")).agg(aggCols.head, aggCols.tail: _*),
      perGroup = contrib.groupBy(col("gid")).agg(aggCols.head, aggCols.tail: _*),
      perPrefix = contrib.groupBy(col("agg_prefix").as("prefix"))
        .agg(aggCols.head, aggCols.tail: _*),
      perUserPrefix = contrib
        .groupBy(col("uid"), col("agg_prefix").as("prefix"))
        .agg(aggCols.head, aggCols.tail: _*),
      perGroupPrefix = contrib
        .groupBy(col("gid"), col("agg_prefix").as("prefix"))
        .agg(aggCols.head, aggCols.tail: _*))
  }

  /** K1/K2: top-N prefixes by one metric (reference heap.MinMax
    * PushMaxN) — TakeOrderedAndProject, not a global sort. */
  def topPrefixes(perPrefix: DataFrame, metric: String, n: Int): DataFrame =
    perPrefix.orderBy(desc(metric), asc("prefix")).limit(n)

  /** K2: the reference's five ranked metrics in one pass over the
    * already-aggregated per-prefix frame. */
  val rankedMetrics: Seq[String] =
    Seq("bytes", "storage_bytes", "prefix_bytes", "files", "prefixes")

  /** K3: top-N prefixes for EACH uid (reference PerIDStats,
    * report_stats.go:34-39,169-182) — window per id, no global sort. */
  def topPrefixesPerId(files: DataFrame, idCol: String, metric: String,
      n: Int, calc: Calculator = Calculator.Identity): DataFrame = {
    val perIdPrefix = files
      .where(!col("is_dir"))
      .withColumn("storage", calc(col("size"), col("blocks")))
      .groupBy(col(idCol), col("parent").as("prefix"))
      .agg(count(lit(1)).as("files"), sum(col("size")).as("bytes"),
        sum(col("storage")).as("storage_bytes"))
    val w = Window.partitionBy(col(idCol)).orderBy(desc(metric), asc("prefix"))
    perIdPrefix.withColumn("rk", row_number().over(w)).where(col("rk") <= n)
  }

  /** K4: top-N users/groups overall by a metric. */
  def topIds(perId: DataFrame, idCol: String, metric: String, n: Int): DataFrame =
    perId.orderBy(desc(metric), asc(idCol)).limit(n)
}
