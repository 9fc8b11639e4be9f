package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSpec, Tables}

class DocumentStreamSpec extends SparkSpec {

  test("streaming document scoring/gating equals the batch pipeline") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-docs")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      streamDir.resolve("documents.parquet"))
    // Gate at the corpus's median quality so the threshold provably
    // drops some documents and keeps some, whatever the distribution.
    val minQuality = DocumentStream.scoreAndGate(spark,
        Tables.documents(spark, dir), minQuality = 0.0)
      .stat.approxQuantile("quality", Array(0.5), 0.0).head
    val q = DocumentStream
      .scoredStream(spark, streamDir.toString, minQuality)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName("scored_docs")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3), r.getLong(4))
    val streamed = spark.sql(
      "SELECT doc_id, lang, lang_pred, quality, bpe_tokens FROM scored_docs")
      .collect().map(key).toSet
    val batch = DocumentStream.scoreAndGate(spark,
        Tables.documents(spark, dir), minQuality)
      .collect().map(key).toSet
    assert(streamed.nonEmpty && batch.nonEmpty)
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    // the gate actually gates: below-threshold docs exist and are dropped
    val all = Tables.documents(spark, dir).count()
    assert(batch.size < all, s"gate dropped nothing ($all docs)")
  }

  test("streaming sampling + chunk planning equals batch, bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-docs2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      streamDir.resolve("documents.parquet"))
    val rates = Map("en" -> 0.5, "zh" -> 0.25)
    val q = DocumentStream.sampleAndChunk(spark,
        spark.readStream.schema(DocumentStream.docSchema)
          .parquet(streamDir.toString), rates)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName("sampled_docs")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
    val streamed = spark.sql(
      "SELECT doc_id, lang, tok, n_chunks FROM sampled_docs")
      .collect().map(key).toSet
    val batch = DocumentStream.sampleAndChunk(spark,
        Tables.documents(spark, dir), rates)
      .collect().map(key).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    // the sample really drops rows in the mapped strata
    val total = Tables.documents(spark, dir)
      .where(col("lang").isin("en", "zh")).count()
    val keptMapped = batch.count(t => t._2 == "en" || t._2 == "zh")
    assert(keptMapped < total)
  }
}
