package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval (Robertson/Spärck Jones probabilistic
  * relevance — the Lucene-default ranking function) over the document
  * corpus, for a FIXED literal term set — the "grep the training
  * corpus, ranked" primitive a data pipeline uses to audit what a
  * model will see for a topic.
  *
  * Scale shape — deliberately NOT the textbook inverted-index join:
  * the query is a handful of literal terms, so per-doc term
  * frequencies are scan-stage array counts (no explode, no shuffle of
  * postings). The whole operator is:
  *
  *   1. one narrow projection (doc_id, dl, tf per query term);
  *   2. ONE partial+final aggregate collapsing the corpus to a single
  *      statistics row (N, total tokens, per-term document
  *      frequencies) — driver receives one bounded row;
  *   3. one scoring scan with every model constant riding the plan as
  *      a literal;
  *   4. TakeOrderedAndProject for the top-k (per-partition heaps,
  *      driver merges k rows).
  *
  * Nothing shuffles a corpus-sized frame at any point, so the plan is
  * the one you'd run at 100 TB (the corpus projection is computed
  * twice — once under the stats aggregate, once under scoring — both
  * scan-stage; trading a second parquet scan for zero caching is the
  * right call when the corpus dwarfs cluster memory).
  *
  * Determinism / oracle parity: BM25's idf needs a natural log, and
  * JVM `Math.log` vs libm can differ in the last ulp — so the log is
  * taken ONCE per query term, on a handful of doubles, and rounded to
  * the integer micro-nat grid (`floor(x·10⁶ + 0.5)`, half-up on both
  * engines — the [[Dsir]] trick). Everything after that is exact
  * int64 arithmetic: with k1 = 1.2 = 6/5 and b = 0.75 = 3/4,
  *
  *   idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *     = idf_µ · 44·tf·T  div  (20·tf·T + 6·T + 18·dl·N)
  *
  * where T = Σdl, avgdl = T/N — an integer floor division both
  * engines evaluate identically (all operands positive, so Spark's
  * truncating `div` equals DuckDB's flooring `//`). Ties at the top-k
  * boundary break on doc_id, so the cut is deterministic.
  *
  * Range guard: the numerator is bounded by idf_µ·44·tf·T; the
  * require below refuses corpora where that could exceed int64 —
  * past it, shard the search or drop the µ-nat grid to 10⁵.
  */
object Bm25 {

  /** Per-doc term-frequency frame `(doc_id, dl, tf0..tfN−1)` — the
    * ONE tokenize pass of [[search]], exposed so callers deriving a
    * second ranking from the same scan (q_rank_rbo's density list)
    * can checkpoint and share it instead of re-tokenizing the
    * corpus. */
  def perDocTf(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16,
      s"literal-term search expects a handful of terms, got ${terms.size}")
    val toks = TextAnalysis.tokens(col(textCol))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).cast("long").as(s"tf$i")
    }
    docs.select(
      (col(idCol).as("doc_id") +: size(toks).cast("long").as("dl") +:
        tfCols): _*)
  }

  /** Top-k docs for `terms`, scored by BM25 (k1=1.2, b=0.75).
    * Output: (doc_id, dl, n_match, score_micronats), score-descending
    * with doc_id tiebreak. */
  def search(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int): DataFrame =
    searchTf(perDocTf(docs, textCol, idCol, terms), terms.size, k)

  /** [[search]] over an already-computed [[perDocTf]] frame. */
  def searchTf(perDoc: DataFrame, nTerms: Int, k: Int): DataFrame = {
    val terms = (0 until nTerms) // index-only below; names fixed tf$i

    // ONE aggregate row: corpus size, token mass, per-term df.
    val statsRow = perDoc.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).as("t") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))): _*)
      .head()
    val n = statsRow.getAs[Long]("n")
    val t = statsRow.getAs[Long]("t")
    require(n > 0, "empty corpus")
    val idfMu = terms.indices.map { i =>
      val df = statsRow.getAs[Long](s"df$i")
      // Lucene-form idf: ln(1 + (N - df + 0.5)/(df + 0.5))
      //               = ln(2(N+1)/(2df+1)); ≥ ln(2/(2N+1))·… always ≥
      // ln(2(N+1)/(2N+1)) > 0, so every contribution stays positive.
      math.floor(math.log(2.0 * (n + 1) / (2 * df + 1)) * 1e6 + 0.5).toLong
    }
    val maxIdf = idfMu.max
    require(maxIdf * 44 > 0 && t < Long.MaxValue / (maxIdf * 44) / 4096,
      s"int64 headroom exhausted (T=$t, max idf_µ=$maxIdf): " +
        "shard the search or coarsen the µ-nat grid")

    val contrib = terms.indices.map { i =>
      val c = expr(
        s"(${idfMu(i)}L * 44L * tf$i * ${t}L) div " +
          s"(20L * tf$i * ${t}L + ${6 * t}L + 18L * dl * ${n}L)")
      when(col(s"tf$i") > 0, c).otherwise(lit(0L))
    }
    perDoc
      .withColumn("n_match",
        terms.indices.map(i =>
          when(col(s"tf$i") > 0, 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("score_micronats", contrib.reduce(_ + _))
      .select(col("doc_id"), col("dl"), col("n_match"),
        col("score_micronats"))
      .where(col("n_match") > 0)
      .orderBy(desc("score_micronats"), asc("doc_id"))
      .limit(k)
  }
}
