package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructType}

/** Streaming embedding routing — the online half of the IVF index:
  * vectors arriving on a stream are assigned to their nearest frozen
  * centroid (the exact argmax-cosine [[graft.similarity.Similarity.ivfAssign]]
  * computes in batch) and flagged as outliers when even the best cell
  * is a poor fit. The quantizer is FROZEN literals riding the plan
  * (the train-offline / route-online split every production ANN
  * ingest uses — retraining is a query restart, exactly like the
  * streaming NB model): stateless scan-stage arithmetic through the
  * codegen'd cosine kernel, append-mode safe, so streaming ≡ batch
  * row for row (EmbeddingStreamSpec). The routed stream can feed the
  * per-cell index segments that [[graft.similarity.IvfIndex.append]]
  * persists.
  */
object EmbeddingStream {

  val vecSchema: StructType = new StructType()
    .add("vec_id", LongType).add("embedding", ArrayType(FloatType))
    .add("label", IntegerType)

  /** @param centroids (centroid_id, cvec) pairs, frozen at plan time.
    * @param outlierCos best-cell cosine below this flags the vector
    *                   (out-of-distribution / new-topic signal). */
  def route(spark: SparkSession, vecs: DataFrame, vecCol: String,
      idCol: String, centroids: Seq[(Long, Seq[Double])],
      outlierCos: Double): DataFrame = {
    require(centroids.nonEmpty, "empty quantizer")
    val cents: Column = typedLit(centroids)
    val v = col(vecCol).cast("array<double>")
    vecs
      .withColumn("__scored", transform(cents, c =>
        struct(
          graft.functions.CosineSimExpr.cosineSim(spark, v, c.getField("_2"))
            .as("s"),
          c.getField("_1").as("cid"))))
      .withColumn("__best", array_max(col("__scored")))
      .select(col(idCol), col("__best.cid").as("centroid_id"),
        round(col("__best.s"), 4).as("best_cos"),
        (col("__best.s") < outlierCos).as("is_outlier"))
  }
}
