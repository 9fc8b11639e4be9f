package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot diff: added / removed / changed entries with
  * byte deltas — the "what grew since last week" question a disk-usage
  * tool exists to answer (beyond the reference, which only rescans in
  * place; its closest feature is the deleted-children anti-join,
  * walker.go:150-163).
  *
  * Scale shape: one full-outer sort-merge join keyed on `path`. Both
  * snapshots are written `sortWithinPartitions("path")`
  * ([[Snapshot.write]]), so parquet min/max stats prune non-overlapping
  * splits and the join keys arrive locally ordered. Output is a fact
  * table the same size as the churn, not the tree; summaries aggregate
  * it distributively.
  */
object SnapshotDiff {

  /** Per-path diff rows, files AND directories; unchanged entries drop
    * out. `status` ∈ added | removed | changed; `changed` means size,
    * mtime, mode, or ownership moved. */
  def diff(prev: DataFrame, cur: DataFrame): DataFrame = {
    val p = prev.select(col("path"), col("is_dir").as("p_dir"),
      col("size").as("p_size"), col("mod_time").as("p_mtime"),
      col("mode").as("p_mode"), col("uid").as("p_uid"), col("gid").as("p_gid"))
    val c = cur.select(col("path"), col("is_dir").as("c_dir"),
      col("size").as("c_size"), col("mod_time").as("c_mtime"),
      col("mode").as("c_mode"), col("uid").as("c_uid"), col("gid").as("c_gid"))
    p.join(c, Seq("path"), "full_outer")
      .withColumn("status",
        when(col("p_size").isNull, lit("added"))
          .when(col("c_size").isNull, lit("removed"))
          .when(col("p_size") =!= col("c_size") ||
            col("p_mtime") =!= col("c_mtime") ||
            col("p_mode") =!= col("c_mode") ||
            col("p_uid") =!= col("c_uid") ||
            col("p_gid") =!= col("c_gid"), lit("changed"))
          .otherwise(lit(null)))
      .where(col("status").isNotNull)
      .select(col("path"), col("status"),
        coalesce(col("c_dir"), col("p_dir")).as("is_dir"),
        coalesce(col("p_size"), lit(0L)).as("old_size"),
        coalesce(col("c_size"), lit(0L)).as("new_size"),
        (coalesce(col("c_size"), lit(0L)) - coalesce(col("p_size"), lit(0L)))
          .as("size_delta"))
  }

  /** One-row totals: churn counts and net byte movement (file rows
    * only — directory sizes are fs metadata, not content). */
  def summary(d: DataFrame): DataFrame = {
    val files = d.where(!col("is_dir"))
    def n(s: String) = // empty diff → 0, not NULL
      coalesce(sum(when(col("status") === s, 1L).otherwise(0L)), lit(0L))
    files.agg(
      n("added").as("n_added"),
      n("removed").as("n_removed"),
      n("changed").as("n_changed"),
      coalesce(sum(col("size_delta")), lit(0L)).as("net_bytes"))
  }
}
