package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Maximal Marginal Relevance (MMR) re-ranking — diverse top-k: pick
  * k items maximizing `λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)`, so
  * each pick is relevant to the query AND far from what's already
  * selected (Carbonell & Goldstein, SIGIR'98). Pure relevance top-k
  * returns k near-copies when the corpus has dense clusters; MMR is
  * the standard fix when assembling eval sets, few-shot pools, or
  * retrieval contexts from a deduplicated-but-still-clustered corpus.
  *
  * The greedy argmax is inherently sequential, so this follows the
  * driver-greedy-loop + bounded-candidate recipe ([[Coreset]],
  * ivfCentroids): ONE distributed pass scores every vector against
  * the broadcast query and pulls the top-`poolSize` pool (TakeOrdered
  * — bounded heap per partition, no shuffle of the corpus), then the
  * O(k · poolSize · dim) greedy loop runs driver-side on the pool.
  * MMR's selection can only ever come from high-relevance items when
  * λ ≥ 0.5 (the relevance term dominates against the bounded [−1,1]
  * diversity penalty), so a pool a few × k deep loses nothing in
  * practice; the pool bound is what makes the operator safe at 100 TB
  * — corpus cost is exactly one scan regardless of k.
  */
object Mmr {

  /** Re-rank: query is a one-row frame `{qvec}`. Returns k rows
    * (id, mmr_rank 1..k, rel — cosine to the query, mmr_score — the
    * objective value at selection time), deterministic (ties by id).
    */
  def rerank(corpus: DataFrame, vecCol: String, idCol: String,
      query: DataFrame, k: Int, lambda: Double = 0.7,
      poolSize: Int = 256): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda out of [0,1]: $lambda")
    require(k <= poolSize, s"k=$k exceeds poolSize=$poolSize")
    val spark = corpus.sparkSession

    // One distributed pass: score + bounded TakeOrdered pool.
    val scored = corpus.crossJoin(broadcast(query.select(col("qvec"))))
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"),
        Similarity.ncos(corpus, col(vecCol), col("qvec")).as("rel"))
      .orderBy(desc("rel"), asc("id"))
      .limit(poolSize)
    val pool = scored.collect().map { r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2))
    }

    // Driver-side greedy over the bounded pool.
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val n = pool.length
    // max similarity to the selected set — starts at -inf, NOT 0: a
    // candidate anti-correlated with everything selected has a
    // NEGATIVE max-sim, which legitimately boosts its MMR objective.
    val maxSimToS = Array.fill(n)(Double.NegativeInfinity)
    val selected = Array.fill(n)(false)
    val picks = scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]()
    var round = 0
    while (round < math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!selected(i)) {
          val s = lambda * pool(i)._3 -
            (1 - lambda) * (if (picks.isEmpty) 0.0 else maxSimToS(i))
          if (s > bestScore ||
            (s == bestScore && best >= 0 && pool(i)._1 < pool(best)._1)) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      selected(best) = true
      picks += ((pool(best)._1, pool(best)._3, bestScore))
      var j = 0
      while (j < n) {
        if (!selected(j)) {
          val sim = cos(pool(j)._2, pool(best)._2)
          if (sim > maxSimToS(j)) maxSimToS(j) = sim
        }
        j += 1
      }
      round += 1
    }

    val rows = picks.zipWithIndex.map { case ((id, rel, sc), i) =>
      Row(id, (i + 1).toLong, rel, sc)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("mmr_rank", LongType, nullable = false),
        StructField("rel", DoubleType, nullable = false),
        StructField("mmr_score", DoubleType, nullable = false))))
  }
}
