package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSpec, Tables}
import graft.similarity.Similarity

class EmbeddingStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def frozenCentroids(): Seq[(Long, Seq[Double])] =
    Similarity.ivfCentroids(Tables.embeddings(spark, dir),
      "embedding", "vec_id", 8)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
      .toSeq.sortBy(_._1)

  test("streaming routing equals batch routing AND batch ivfAssign cells") {
    val cents = frozenCentroids()
    val streamDir = java.nio.file.Files.createTempDirectory("graft-emb")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/embeddings.parquet"),
      streamDir.resolve("embeddings.parquet"))
    val stream = spark.readStream.schema(EmbeddingStream.vecSchema)
      .parquet(streamDir.toString)
    val q = EmbeddingStream.route(spark, stream, "embedding", "vec_id",
        cents, outlierCos = 0.5)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("routed")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))
    val streamed = spark.sql(
        "SELECT vec_id, centroid_id, best_cos, is_outlier FROM routed")
      .collect().map(key).toSet
    val batch = EmbeddingStream.route(spark,
        Tables.embeddings(spark, dir), "embedding", "vec_id",
        cents, outlierCos = 0.5)
      .collect().map(key).toSet
    assert(streamed.nonEmpty && streamed == batch)
    // and the cells agree with the batch index builder's assignment
    val centsDf = Similarity.ivfCentroids(Tables.embeddings(spark, dir),
      "embedding", "vec_id", 8)
    val viaAssign = Similarity.ivfAssign(Tables.embeddings(spark, dir),
        "embedding", "vec_id", centsDf)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaRoute = streamed.map(t => t._1 -> t._2).toMap
    assert(viaRoute == viaAssign)
  }

  test("outlier flag fires for an out-of-distribution vector") {
    val cents = frozenCentroids()
    val s = spark
    import s.implicits._
    // a vector orthogonal-ish to the corpus: one-hot on the last dim
    val dim = cents.head._2.length
    val odd = Seq((999L, Array.fill(dim)(0.0f).updated(dim - 1, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = EmbeddingStream.route(spark, odd, "embedding", "vec_id",
      cents, outlierCos = 0.99).collect()
    assert(out.length == 1 && out(0).getBoolean(3))
  }
}
