package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-PQ — the composed faiss index shape, built from the two pieces
  * this package already proves out separately:
  *
  *   - IVF ([[Similarity.ivfCentroids]]/[[Similarity.ivfAssign]])
  *     prunes WHICH rows are scanned: a query probes `nprobe` of `c`
  *     cells, ≈ nprobe/c of the corpus.
  *   - PQ ([[Pq]]) shrinks WHAT is scanned: probed rows score as m
  *     int codes via ADC table lookups, not dim-wide float vectors.
  *   - Refine re-scores the k·overfetch ADC survivors exactly.
  *
  * At 10⁹ vectors the probe reads nprobe/c of an 8 GB code table
  * instead of nprobe/c of a 256 GB float table — the difference
  * between a RAM-resident and a spilling probe side. Index build is
  * two bounded driver-side trainings + ONE distributed pass that both
  * assigns and encodes every vector.
  */
object IvfPq {

  final case class IvfPqIndex(centroids: DataFrame, model: Pq.PqModel,
      encoded: DataFrame)

  /** Build: train quantizers on bounded samples, then assign + encode
    * the corpus in one distributed pass. `encoded` carries
    * (centroid_id, id, codes) — the entire searchable state, m ints +
    * 2 longs per vector. */
  def build(corpus: DataFrame, vecCol: String, idCol: String,
      c: Int = 16, m: Int = 8, ksub: Int = 16): IvfPqIndex = {
    val spark = corpus.sparkSession
    val centroids = Similarity.ivfCentroids(corpus, vecCol, idCol, c)
    val model = Pq.train(corpus, vecCol, idCol, m, ksub)
    val encoded = Similarity.ivfAssign(corpus, vecCol, idCol, centroids)
      .select(col("centroid_id"), col(idCol),
        graft.functions.PqExprs.pqEncode(spark, col(vecCol),
          typedLit(model.codebooks.toSeq), model.m, model.ksub).as("codes"))
    IvfPqIndex(centroids, model, encoded)
  }

  /** Search: probe `nprobe` cells by centroid cosine, ADC-score only
    * the probed codes, exact-rescore the k·overfetch survivors against
    * the original vectors (a broadcast-sized id join). */
  def topK(index: IvfPqIndex, corpus: DataFrame, vecCol: String,
      idCol: String, query: Array[Double], k: Int, nprobe: Int,
      overfetch: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = Seq(Tuple1(query.toSeq)).toDF("qvec")
    val probeCells = Similarity.ivfAssignQuery(q, index.centroids, nprobe)
    val cand = index.encoded.join(broadcast(probeCells), Seq("centroid_id"))
    Pq.adcTopKRefined(cand, corpus, vecCol, idCol, index.model, query, k,
      overfetch)
  }
}
