package graft.ingest

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Timestamped-artifact candidate listing and retention (reference
  * reports.go:268-296: list report dirs, sort descending, delete all
  * but the newest n). Snapshot dirs, stats artifacts, and report trees
  * all share the `yyyyMMdd'T'HHmmss.SSS` naming, which sorts
  * lexicographically == chronologically, so candidate ordering is a
  * pure name sort — no per-dir stat.
  */
object Retention {

  private val tsName = "^\\d{8}T\\d{6}\\.\\d{3}$".r

  /** Timestamped children of `dir`, newest first. */
  def candidates(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(Files.isDirectory(_))
        .map(_.getFileName.toString)
        .filter(tsName.matches(_))
        .toSeq.sorted.reverse
      finally s.close()
    }
  }

  /** Delete all but the newest `keep` candidates under `dir`; returns
    * the deleted names. `protect` (e.g. the LATEST target) is never
    * deleted regardless of age. */
  def prune(dir: String, keep: Int, protect: Option[String] = None): Seq[String] =
    pruneAll(dir, keep, protect.toSet)

  /** Set-protect variant: every name in `protect` survives regardless
    * of age (e.g. a segment CHAIN the latest index depends on). */
  def pruneAll(dir: String, keep: Int, protect: Set[String]): Seq[String] = {
    require(keep >= 1, "retention must keep at least 1")
    val doomed = candidates(dir).drop(keep).filterNot(protect.contains)
    doomed.foreach(n => deleteRecursively(Paths.get(dir, n)))
    doomed
  }

  private def deleteRecursively(p: Path): Unit = {
    // NOFOLLOW: a symlink to a directory must be unlinked, never
    // descended — following it would delete data OUTSIDE the pruned
    // tree.
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq.foreach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
