package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Streaming form of the document-pipeline gates: language-ID, quality
  * scoring, and token budgeting applied continuously as documents
  * arrive (file/queue source), with exact-dedup within the watermark
  * horizon available via [[EventStream.dedupByKey]].
  *
  * All three gates are STATELESS scan-stage work through the native
  * kernels — per-microbatch plans are identical to the batch plan, so
  * streaming ≡ batch row-for-row (asserted in DocumentStreamSpec) and
  * throughput scales with source parallelism, no state store involved.
  */
object DocumentStream {

  /** Schema of the documents parquet (TESTDATA.md). */
  val docSchema =
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"

  /** Score + gate one batch or microbatch of documents: predicted
    * language, composite quality, approx-BPE token count; keeps docs
    * at or above `minQuality`. */
  def scoreAndGate(spark: SparkSession, docs: DataFrame,
      minQuality: Double): DataFrame = {
    val st: Column = graft.functions.TextStatsExpr.textStats(spark, col("text"))
    docs.select(col("doc_id"), col("lang"),
        graft.functions.LangIdExpr.langId(spark, col("text")).as("lang_pred"),
        TextAnalysis.qualityScoreFast(spark, col("text")).as("quality"),
        element_at(st, 5).as("bpe_tokens"))
      .where(col("quality") >= minQuality)
  }

  /** Parquet-directory streaming source of documents → scored/gated
    * stream. Append-mode safe: no aggregation state. */
  def scoredStream(spark: SparkSession, sourceDir: String,
      minQuality: Double): DataFrame =
    scoreAndGate(spark,
      spark.readStream.schema(docSchema).parquet(sourceDir), minQuality)

  /** Deterministic stratified sampling + context-chunk planning as a
    * streaming stage. Both are pure scan-stage expressions: the md5
    * sampling coin (graft.ops.Sampling) needs no state, so a given
    * document samples identically in batch, in streaming, and on
    * every re-run — the property that makes streaming curation
    * reproducible and replayable. Emits one row per kept doc with its
    * chunk count under a (win, stride) token windowing. */
  def sampleAndChunk(spark: SparkSession, docs: DataFrame,
      rates: Map[String, Double], win: Long = 128L,
      stride: Long = 112L): DataFrame = {
    val st: Column = graft.functions.TextStatsExpr.textStats(spark, col("text"))
    docs
      .where(graft.ops.Sampling.stratifiedAt(col("doc_id"), col("lang"), rates))
      .select(col("doc_id"), col("lang"), element_at(st, 1).as("tok"))
      .withColumn("n_chunks",
        when(col("tok") <= win, 1L)
          .otherwise(ceil((col("tok") - win).cast("double") / stride)
            .cast("long") + 1L))
  }
}
