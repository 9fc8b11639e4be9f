package graft.ingest

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.FileEntry

/** Snapshot-to-snapshot diff: added/removed/changed classification and
  * the churn summary. Verifies real-tree behavior too (walk, mutate,
  * walk, diff) so the diff stays glued to the walker's schema.
  */
class SnapshotDiffSpec extends SparkSpec {

  private def entry(path: String, size: Long, mtime: Long = 1700000000000L,
      dir: Boolean = false, uid: Long = 1, mode: Int = 420): FileEntry =
    FileEntry(path, path.take(path.lastIndexOf('/').max(0)),
      path.drop(path.lastIndexOf('/') + 1), path.count(_ == '/'), dir,
      size, size / 512, mode, new Timestamp(mtime), uid, 1L, 7L, 0L, 1L, 0L)

  test("classifies added, removed, changed; drops unchanged") {
    import spark.implicits._
    val prev = Seq(
      entry("/r", 0L, dir = true),
      entry("/r/same", 10L),
      entry("/r/grew", 10L),
      entry("/r/gone", 5L),
      entry("/r/chown", 4L)).toDF()
    val cur = Seq(
      entry("/r", 0L, dir = true),
      entry("/r/same", 10L),
      entry("/r/grew", 25L, mtime = 1700000001000L),
      entry("/r/new", 7L),
      entry("/r/chown", 4L, uid = 2)).toDF()
    val d = SnapshotDiff.diff(prev, cur)
    val byPath = d.collect().map(r => r.getString(0) ->
      (r.getString(1), r.getLong(r.fieldIndex("size_delta")))).toMap
    assert(byPath == Map(
      "/r/grew" -> ("changed", 15L),
      "/r/gone" -> ("removed", -5L),
      "/r/new" -> ("added", 7L),
      "/r/chown" -> ("changed", 0L)))

    val s = SnapshotDiff.summary(d).collect()(0)
    assert(s.getLong(s.fieldIndex("n_added")) == 1L)
    assert(s.getLong(s.fieldIndex("n_removed")) == 1L)
    assert(s.getLong(s.fieldIndex("n_changed")) == 2L)
    assert(s.getLong(s.fieldIndex("net_bytes")) == 15L - 5L + 7L)
  }

  test("empty diff of identical snapshots; summary is all zeros") {
    import spark.implicits._
    val a = Seq(entry("/r", 0L, dir = true), entry("/r/f", 3L)).toDF()
    val d = SnapshotDiff.diff(a, a)
    assert(d.count() == 0L)
    val s = SnapshotDiff.summary(d).collect()(0)
    assert((0 to 3).forall(i => s.getLong(i) == 0L))
  }

  test("real tree: walk → mutate → walk → diff matches the mutations") {
    val root = java.nio.file.Files.createTempDirectory("graft-diff")
    java.nio.file.Files.write(root.resolve("keep"), "aaaa".getBytes)
    java.nio.file.Files.write(root.resolve("resize"), "bb".getBytes)
    java.nio.file.Files.write(root.resolve("drop"), "c".getBytes)
    val prev = Walker.walk(spark, root.toString).entries.toDF().cache()
    prev.count() // pin before mutating (lazy plans re-walk)

    java.nio.file.Files.write(root.resolve("resize"), "bbbbbbbb".getBytes)
    java.nio.file.Files.delete(root.resolve("drop"))
    java.nio.file.Files.write(root.resolve("fresh"), "dd".getBytes)
    val cur = Walker.walk(spark, root.toString).entries.toDF()

    val d = SnapshotDiff.diff(prev, cur)
    val files = d.collect().filter(!_.getBoolean(2))
      .map(r => r.getString(0).drop(root.toString.length + 1) -> r.getString(1))
      .toMap
    assert(files == Map("resize" -> "changed", "drop" -> "removed",
      "fresh" -> "added"))
  }
}
