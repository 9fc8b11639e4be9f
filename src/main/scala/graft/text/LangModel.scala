package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the "does this text
  * look like the rest of the corpus" signal (the cheap stand-in for
  * KenLM-style perplexity filtering in public pipeline recipes like
  * CCNet/RefinedWeb). Documents whose word transitions are improbable
  * under the corpus's own bigram statistics score low: gibberish,
  * wrong-language contamination, and boilerplate-free word salad all
  * fall out of the same number.
  *
  * Everything is two partial+final aggregates and two equi-joins on
  * the gram key:
  *
  *   1. ONE explode of the corpus into bigram occurrences.
  *   2. c(bigram) — groupBy(bigram) count.
  *   3. c(prev ·) — derived from the c(bigram) frame (Σ per first
  *      token), NOT a second corpus pass (same trick as q_tfidf's
  *      df-from-tf).
  *   4. Per-doc mean of p(w_i | w_{i-1}) = c(bigram)/c(prev ·) — join
  *      occurrences back to the two count frames and aggregate.
  *
  * Counts are MLE over the corpus itself, so every document bigram has
  * a nonzero count (it contributes to its own statistics) — no
  * smoothing needed and the score is a pure rational of two integers.
  * The joins are plain equi-joins on the gram key: Catalyst/AQE
  * broadcasts them while the vocabulary is small and shuffle-joins at
  * scale, where a forced broadcast of a 10⁹-bigram vocabulary would
  * be the bug.
  */
object LangModel {

  /** One row per adjacent token pair: (doc_id, prev, bigram). The
    * token array materializes once per row; the zip_with lambda only
    * routes already-computed elements (no per-element re-evaluation of
    * the split — the O(n²) trap documented in the build notes). Docs
    * with fewer than 2 tokens have no transitions and drop. */
  def bigramOccurrences(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val w = TextAnalysis.tokens(col(textCol))
    df.select(col(idCol).as("doc_id"), w.as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(
        zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
      .withColumn("prev", split(col("bigram"), " ").getItem(0))
  }

  /** Per-document mean transition probability under the corpus bigram
    * model: (doc_id, n_bigrams, avg_bigram_prob). Rational arithmetic
    * (count/count) rather than log-probabilities so the DuckDB oracle
    * matches to the digit (same reasoning as q_tfidf's rational idf:
    * IEEE division is bit-exact across engines, libm `ln` is not). */
  def bigramDocScore(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val occ = bigramOccurrences(df, textCol, idCol)
    val cb = occ.groupBy(col("bigram"))
      .agg(count(lit(1)).as("c_bigram"))
    val cs = cb
      .withColumn("prev", split(col("bigram"), " ").getItem(0))
      .groupBy(col("prev"))
      .agg(sum(col("c_bigram")).as("c_start"))
    occ.join(cb, Seq("bigram")).join(cs, Seq("prev"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("c_bigram").cast("double") / col("c_start")), 4)
          .as("avg_bigram_prob"))
  }

  /** The gate form: documents whose mean transition probability falls
    * below `minAvgProb` — the corpus-outlier screen. */
  def lowLikelihoodDocs(df: DataFrame, textCol: String, idCol: String,
      minAvgProb: Double): DataFrame =
    bigramDocScore(df, textCol, idCol)
      .where(col("avg_bigram_prob") < minAvgProb)
}
