package graft.similarity

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index: build once, probe many — the missing half of
  * ANN at scale (rebuilding the index per query, as the inline
  * [[Similarity.ivfTopK]] demo does, re-pays the full assignment scan
  * every time).
  *
  * Layout mirrors [[graft.ingest.Snapshot]] (timestamped dirs + LATEST
  * pointer, object-store safe):
  *
  * {{{
  * <base>/ivf/<ts>/centroids/   c rows: (centroid_id, cvec)
  * <base>/ivf/<ts>/assigned/    corpus partitioned BY centroid_id
  * <base>/ivf/LATEST
  * }}}
  *
  * `assigned` is directory-partitioned on `centroid_id`, so probing
  * nprobe cells is PARTITION PRUNING: the query reads nprobe/c of the
  * corpus files and Spark never even lists the rest. That turns query
  * cost from O(corpus) to O(corpus × nprobe/c) at the storage layer —
  * the property that makes 100 TB of embeddings probe-able
  * interactively. Retention/pruning reuse the snapshot machinery.
  */
object IvfIndex {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss.SSS")
    .withZone(ZoneOffset.UTC)

  /** Train centroids, assign the corpus, persist both; returns the
    * index name. One distributed assignment pass (see
    * [[Similarity.ivfCentroids]] for the bounded-sample training). */
  def build(base: String, corpus: DataFrame, vecCol: String, idCol: String,
      c: Int, iters: Int = 5, trainPct: Int = 100): String = {
    val cents = Similarity.ivfCentroids(corpus, vecCol, idCol, c,
      iters = iters, trainPct = trainPct)
    val assigned = Similarity.ivfAssign(corpus, vecCol, idCol, cents)
    val name = tsFmt.format(Instant.now())
    val dir = s"$base/ivf/$name"
    cents.coalesce(1).write.mode(SaveMode.ErrorIfExists)
      .parquet(s"$dir/centroids")
    assigned.write.mode(SaveMode.ErrorIfExists)
      .partitionBy("centroid_id").parquet(s"$dir/assigned")
    val latest = Paths.get(base, "ivf", "LATEST")
    Files.createDirectories(latest.getParent)
    Files.write(latest, name.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    name
  }

  def latestName(base: String): Option[String] = {
    val p = Paths.get(base, "ivf", "LATEST")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  def centroids(spark: SparkSession, base: String,
      name: Option[String] = None): DataFrame =
    spark.read.parquet(s"$base/ivf/${resolve(base, name)}/centroids")

  def assigned(spark: SparkSession, base: String,
      name: Option[String] = None): DataFrame =
    spark.read.parquet(s"$base/ivf/${resolve(base, name)}/assigned")

  /** ANN top-k through the persisted index: rank the (tiny) centroid
    * table for the query, then scan ONLY the nprobe matching
    * partitions of `assigned` — `centroid_id` is a partition column,
    * so the isin filter prunes directories before any file I/O. */
  def topK(spark: SparkSession, base: String, query: DataFrame,
      vecCol: String, idCol: String, k: Int, nprobe: Int = 4,
      name: Option[String] = None): DataFrame = {
    val cells = Similarity.ivfAssignQuery(query, centroids(spark, base, name),
      nprobe).collect().toIndexedSeq.map(_.getLong(0))
    val cand = assigned(spark, base, name)
      .where(col("centroid_id").isin(cells: _*))
    Similarity.topK(cand, vecCol, idCol, query, k)
  }

  /** Timestamped index candidates, newest first / retention. */
  def candidates(base: String): Seq[String] =
    graft.ingest.Retention.candidates(s"$base/ivf")
  def prune(base: String, keep: Int): Seq[String] =
    graft.ingest.Retention.prune(s"$base/ivf", keep, protect = latestName(base))

  private def resolve(base: String, name: Option[String]): String =
    name.orElse(latestName(base)).getOrElse(
      throw new IllegalStateException(s"no IVF index under $base"))
}
