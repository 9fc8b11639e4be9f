package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every table is a single parquet file under `sfDir`. At 100 TB these
  * would be directory-partitioned datasets; `spark.read.parquet` handles
  * both shapes identically, and all downstream code only assumes a
  * DataFrame with the documented schema.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** The events parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as LONG and convert to a microsecond
    * TimestampType column — the same truncation DuckDB applies, so oracle
    * comparisons agree.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsRange(spark, sfDir, None, None)

  /** Events with an optional time-range applied to the RAW nanosecond
    * column BEFORE the µs conversion: a predicate on the derived
    * timestamp cannot reach the parquet scan, but on the raw int64 it
    * pushes down and prunes row groups via min/max stats — at 100 TB
    * of events this is the difference between scanning a day and
    * scanning the archive.
    */
  def eventsRange(spark: SparkSession, sfDir: String,
      fromUtc: Option[String], untilUtc: Option[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def nanosOf(s: String): Long =
      java.time.LocalDateTime.parse(s.replace(" ", "T"))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000000L
    var df = table(spark, sfDir, "events")
    fromUtc.foreach(t => df = df.where(col("ts") >= nanosOf(t)))
    untilUtc.foreach(t => df = df.where(col("ts") < nanosOf(t)))
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** The documents/embeddings parquet are single splits (one row
    * group), so a per-row CPU-heavy stage reading them directly runs
    * in ONE task. Repartition to the cluster's parallelism first; on
    * real multi-file data the scan is already split and this round
    * robin is a cheap rebalance. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
