package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental re-scan (reference analyze.go:226-243,313-331,383-424,
  * SURVEY.md §2.8): a prefix whose (mod_time, mode) is unchanged since
  * the previous snapshot reuses its stored FILE rows — only
  * directories are re-statted, skipping the per-file lstat fan-out
  * that dominates scan cost (reference README.md:13-15).
  *
  * Plan shape:
  *   1. walk the tree statting DIRS always; under unchanged dirs the
  *      walker neither lists nor stats children (POSIX dir mtime
  *      changes whenever a child is created/renamed/deleted, so an
  *      unchanged dir implies an unchanged child list — the contract
  *      the reference relies on, prefixinfo.go:110-116);
  *   2. file rows of unchanged dirs come from the previous snapshot
  *      via a semi-join — no filesystem I/O;
  *   3. deletions need no explicit purge: the snapshot is rebuilt from
  *      the live walk, so vanished subtrees simply don't appear (the
  *      reference's DeletePrefix exists because it mutates a KV store;
  *      an immutable snapshot gets J1 for free — the anti-join below
  *      only REPORTS deletions).
  *
  * The previous snapshot's dir metadata never moves through the
  * driver: the walker keys each dir row by its seed-ancestor path and
  * shuffles per-seed slices directly to the walking tasks — at 10⁹
  * files / ~10⁷ dirs each task holds only its own subtree's index
  * (see Walker.walk's prevDirs path).
  */
object Incremental {

  final case class ChangeSummary(
      prefixes_unchanged: Long,
      prefixes_changed: Long,
      prefixes_added: Long,
      prefixes_deleted: Long,
      files_rescanned: Long,
      files_reused: Long,
      files_deleted: Long)

  final case class Result(entries: DataFrame, summary: ChangeSummary)

  /** The previous snapshot's dir rows in the walker's DirMeta shape —
    * stays a DataFrame; the walker ships per-seed slices of it to
    * executors (no driver collect of the full index). */
  def prevDirFrame(prev: DataFrame): DataFrame =
    prev.where(col("is_dir"))
      .select(col("path"), col("parent"),
        unix_millis(col("mod_time")).as("mt_ms"),
        col("mode"), col("n_entries"))

  /** Re-scan `root` against the previous snapshot's entries. */
  def rescan(spark: SparkSession, root: String, prev: DataFrame,
      exclusions: Seq[String] = Nil, seedDepth: Int = 2): Result = {
    val walked = Walker.walk(spark, root, exclusions, seedDepth,
      prevDirs = Some(prevDirFrame(prev)))
    walked.records.cache()
    val entries = walked.entriesWithReuse.cache()

    val currDirs = entries.where(col("is_dir")).select(col("path"), col("reused"))
    val prevDirs = prev.where(col("is_dir")).select(col("path"))
    val prevFiles = prev.where(!col("is_dir"))

    // Reused dirs take their file rows from the previous snapshot.
    val reusedDirPaths = currDirs.where(col("reused")).select(col("path"))
    val reusedFiles = prevFiles
      .join(reusedDirPaths.withColumnRenamed("path", "parent"), Seq("parent"), "left_semi")
    val walkCols = entries.drop("reused").columns.toIndexedSeq
    val full = entries.drop("reused")
      .unionByName(reusedFiles.select(walkCols.map(col): _*))

    val deletedDirs = prevDirs.join(currDirs, Seq("path"), "left_anti")
    val deletedFiles = prevFiles.select(col("path"))
      .join(full.where(!col("is_dir")).select(col("path")), Seq("path"), "left_anti")

    val nUnchanged = currDirs.where(col("reused")).count()
    val nCurrDirs = currDirs.count()
    val nNewDirs = currDirs.join(prevDirs, Seq("path"), "left_anti").count()
    val summary = ChangeSummary(
      prefixes_unchanged = nUnchanged,
      prefixes_changed = nCurrDirs - nUnchanged - nNewDirs,
      prefixes_added = nNewDirs,
      prefixes_deleted = deletedDirs.count(),
      files_rescanned = entries.where(!col("is_dir")).count(),
      files_reused = reusedFiles.count(),
      files_deleted = deletedFiles.count())
    Result(full, summary)
  }
}
