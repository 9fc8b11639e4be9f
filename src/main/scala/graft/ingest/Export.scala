package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sharded corpus export — the hand-off artifact at the
  * end of a data pipeline: rows hashed into `nShards` stable shards
  * (shard = xxhash64(id) mod n, a pure function of the id — identical
  * across runs, partitionings, and cluster sizes), written as one
  * partition directory per shard, plus a `_MANIFEST.json` recording
  * (underscore-prefixed so Spark's file index ignores it, like _SUCCESS)
  * per-shard row counts and an ORDER-INSENSITIVE content checksum
  * (bit-XOR of xxhash64(id)) so the consumer can verify integrity
  * before spending GPU-hours on it.
  *
  * Scale shape: one hash projection + one partitioned write (shuffle
  * keyed by shard), one aggregate for the manifest. Verification
  * re-reads the export and recomputes the same aggregate — any lost,
  * duplicated, or swapped row changes a shard's count or XOR.
  */
object Export {

  final case class ShardStat(shard: Long, rows: Long, checksum: Long)

  /** `format`: "parquet" (default) or "json" — the latter writes
    * JSONL (one object per line), the LLM-corpus interchange format,
    * with the same shard layout, manifest, and verify machinery. */
  def shards(df: DataFrame, idCol: String, outDir: String,
      nShards: Int, format: String = "parquet"): Seq[ShardStat] = {
    require(nShards >= 1, "need at least one shard")
    require(Set("parquet", "json")(format), s"unsupported format $format")
    val sharded = df
      .withColumn("__shard", pmod(xxhash64(col(idCol)), lit(nShards.toLong)))
    sharded.write.mode(SaveMode.ErrorIfExists)
      .partitionBy("__shard").format(format).save(outDir)
    attest(df.sparkSession, outDir, idCol, nShards, format)
  }

  /** Cut (or re-cut) the manifest from a READ-BACK of `outDir`: the
    * manifest attests the ARTIFACT, not the writing plan, so a
    * write-side fault (truncated/lost part file) shows up in the
    * manifest stats the moment it is cut — a consumer comparing them
    * to the producer's expected counts catches the loss before any
    * GPU-hours are spent, instead of only at a later verify(). */
  def attest(spark: SparkSession, outDir: String, idCol: String,
      nShards: Int, format: String = "parquet"): Seq[ShardStat] = {
    val stats = manifestStats(readBack(spark, outDir, idCol, format), idCol)
    writeManifest(outDir, nShards, stats)
    stats
  }

  /** Load the export for attest/verify aggregates. Parquet carries its
    * schema; JSON must NOT go through full schema inference — that is
    * a complete extra pass over the artifact, and an all-null column
    * silently vanishes from the inferred schema (the JSON writer omits
    * null fields). Only the one attested column is declared (as its
    * raw JSON text — stable whatever type inference would pick);
    * Spark appends the `__shard` partition column from the directory
    * layout. JSON checksums therefore hash the id's TEXT form — attest
    * and verify share this path, so they always agree. */
  private def readBack(spark: SparkSession, outDir: String, idCol: String,
      format: String): DataFrame = {
    // never trust a cached listing of the files being attested/verified
    spark.catalog.refreshByPath(outDir)
    if (format == "json") {
      val pinned = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol,
          org.apache.spark.sql.types.StringType)))
      spark.read.schema(pinned).format("json").load(outDir)
    } else spark.read.format(format).load(outDir)
  }

  private def manifestStats(sharded: DataFrame, idCol: String): Seq[ShardStat] =
    sharded.groupBy(col("__shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("rows"),
        expr(s"bit_xor(xxhash64($idCol))").as("checksum"))
      .collect()
      .map(r => ShardStat(r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.shard).toSeq

  private def writeManifest(outDir: String, nShards: Int,
      stats: Seq[ShardStat]): Unit = {
    val body = stats.map(s =>
      s"""{"shard": ${s.shard}, "rows": ${s.rows}, "checksum": ${s.checksum}}""")
      .mkString(s"""{"n_shards": $nShards, "shards": [\n  """, ",\n  ", "\n]}")
    Files.writeString(Paths.get(outDir, "_MANIFEST.json"), body)
  }

  /** Re-read the export and verify it against its manifest; returns
    * the mismatched shard ids (empty = intact). A shard present in
    * the manifest but absent on disk, or vice versa, mismatches. */
  def verify(spark: SparkSession, outDir: String, idCol: String,
      format: String = "parquet"): Seq[Long] = {
    val manifest = readManifest(outDir)
    val actual = readBack(spark, outDir, idCol, format)
      .groupBy(col("__shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("rows"),
        expr(s"bit_xor(xxhash64($idCol))").as("checksum"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expected = manifest.map(s => s.shard -> ((s.rows, s.checksum))).toMap
    (expected.keySet ++ actual.keySet).toSeq.sorted.filter { sh =>
      expected.get(sh) != actual.get(sh)
    }
  }

  def readManifest(outDir: String): Seq[ShardStat] = {
    val txt = Files.readString(Paths.get(outDir, "_MANIFEST.json"))
    // minimal parse of our own fixed format
    val re = """\{"shard": (-?\d+), "rows": (\d+), "checksum": (-?\d+)\}""".r
    re.findAllMatchIn(txt).map(m =>
      ShardStat(m.group(1).toLong, m.group(2).toLong, m.group(3).toLong)).toSeq
  }
}
