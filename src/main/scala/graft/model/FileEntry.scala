package graft.model

import java.sql.Timestamp

/** The flat per-file fact row — the primary table of the engine
  * (SURVEY.md §1.6). One row per file AND per directory; a directory's
  * own metadata row carries `is_dir = true` and `n_entries` (its child
  * count, serving the reference's `NumEntries()` hook for the
  * `dir-larger`/`dir-smaller` operands, expression.go:238-240).
  *
  * Replaces the reference's nested prefixinfo.T + idMap encoding
  * (internal/prefixinfo/prefixinfo.go:17-34): in columnar parquet the
  * uid/gid columns dictionary-encode for free, and `explode` is never
  * needed because the table is already flat.
  */
final case class FileEntry(
    path: String,
    parent: String,
    name: String,
    depth: Int,
    is_dir: Boolean,
    size: Long,
    blocks: Long,
    mode: Int,
    mod_time: Timestamp,
    uid: Long,
    gid: Long,
    device: Long,
    inode: Long,
    nlink: Long,
    n_entries: Long)

/** A scan failure (reference error bucket, badgerdb.go:401-417). */
final case class ScanError(path: String, when: Timestamp, error: String)

/** One analyze-run summary (reference log bucket + progress.go:19-35). */
final case class ScanLog(
    start: Timestamp,
    stop: Timestamp,
    root: String,
    prefixes: Long,
    files: Long,
    errors: Long,
    total_bytes: Long)
