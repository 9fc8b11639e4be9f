package graft.ingest

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot layout (replaces the reference's BadgerDB buckets,
  * badgerdb.go:54-72, and the `.idustats` gob artifact + `latest`
  * symlink, stats.go:31-82):
  *
  * {{{
  * <base>/snapshots/<ts>/files/      parquet fact table
  * <base>/snapshots/<ts>/errors/     scan_errors table
  * <base>/scan_log/                  append-only run log
  * <base>/LATEST                     text file: name of newest snapshot
  * }}}
  *
  * A timestamped-directory-plus-LATEST-pointer works on any Hadoop
  * filesystem (HDFS/S3/GCS have no symlinks). Writers produce a whole
  * new snapshot dir then flip LATEST — readers never see a partial
  * snapshot (the reference gets the same property from Badger
  * transactions).
  */
object Snapshot {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss.SSS")
    .withZone(ZoneOffset.UTC)

  def write(base: String, files: DataFrame, errors: DataFrame): String = {
    val name = tsFmt.format(Instant.now())
    val dir = s"$base/snapshots/$name"
    // Sort within partitions by path: co-locates subtrees per file →
    // parquet min/max path stats give subtree pruning for prefix
    // queries (the analogue of the reference's key-ordered scans).
    files.sortWithinPartitions("path").write.mode(SaveMode.ErrorIfExists).parquet(s"$dir/files")
    errors.write.mode(SaveMode.ErrorIfExists).parquet(s"$dir/errors")
    val latest = Paths.get(base, "LATEST")
    Files.createDirectories(latest.getParent)
    Files.write(latest, name.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    name
  }

  def latestName(base: String): Option[String] = {
    val p = Paths.get(base, "LATEST")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim) else None
  }

  /** All snapshots, newest first (reference reports.go:268-282's
    * candidate listing, applied to snapshots). */
  def candidates(base: String): Seq[String] =
    Retention.candidates(s"$base/snapshots")

  /** Keep the newest `keep` snapshots (the LATEST target always
    * survives); returns deleted names. Reference reports.go:284-296. */
  def prune(base: String, keep: Int): Seq[String] =
    Retention.prune(s"$base/snapshots", keep, protect = latestName(base))

  def readFiles(spark: SparkSession, base: String, snapshot: Option[String] = None): DataFrame = {
    val name = snapshot.orElse(latestName(base)).getOrElse(
      throw new IllegalStateException(s"no snapshot under $base"))
    spark.read.parquet(s"$base/snapshots/$name/files")
  }

  def readErrors(spark: SparkSession, base: String, snapshot: Option[String] = None): DataFrame = {
    val name = snapshot.orElse(latestName(base)).getOrElse(
      throw new IllegalStateException(s"no snapshot under $base"))
    spark.read.parquet(s"$base/snapshots/$name/errors")
  }

  def appendLog(spark: SparkSession, base: String, log: DataFrame): Unit =
    log.write.mode(SaveMode.Append).parquet(s"$base/scan_log")
}
