package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage document selection — the classic
  * submodular data-curation primitive (Nemhauser et al. 1978: the
  * greedy prefix is a (1−1/e)-approximation): pick k documents that
  * together cover as much vocabulary as possible. The LLM-pipeline
  * use is seed-set/exemplar selection — "which 5 docs should a human
  * read to see most of this corpus".
  *
  * Scale shape (the ivfCentroids / coreset recipe): the sequential
  * argmax runs DRIVER-SIDE over a BOUNDED deterministic candidate set
  * (md5-order TakeOrdered — a bounded heap per partition, never a
  * global sort), and the corpus is touched by exactly ONE distributed
  * pass that scores the chosen prefix against the full vocabulary.
  * Nothing iterative ever touches the corpus.
  */
object Coverage {

  /** One greedy pick: 1-based step, the doc, its marginal gain on the
    * candidate sample, cumulative covered tokens, and the doc's
    * distinct-token set. */
  final case class Pick(step: Int, docId: Long, gain: Long,
      covered: Long, tokens: Seq[String])

  /** Greedy max-coverage over the `candidates` hash-smallest docs
    * (deterministic md5 order, ties by id). Ties in the argmax break
    * by (gain DESC, docId ASC) — mirrored exactly by the SQL oracle's
    * ORDER BY ... LIMIT 1 layers. */
  def greedySelect(docs: DataFrame, textCol: String, idCol: String,
      candidates: Int, k: Int): Seq[Pick] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cand: Array[(Long, Seq[String])] = docs
      .select(col(idCol).cast("long").as("id"),
        array_distinct(split(trim(lower(col(textCol))), "\\s+")).as("ts"),
        conv(substring(md5(concat(lit("cov|"), col(idCol).cast("string"))),
          1, 13), 16, 10).cast("long").as("u"))
      .orderBy(col("u"), col("id"))
      .limit(candidates)
      .select(col("id"), col("ts"))
      .as[(Long, Seq[String])].collect()
    val covered = scala.collection.mutable.Set.empty[String]
    val taken = scala.collection.mutable.Set.empty[Long]
    // The greedy loop stops early when candidates run out (k larger
    // than the corpus/candidate count) — reduceLeft on an empty
    // remainder would throw.
    (1 to math.min(k, cand.length)).map { step =>
      val (bestId, bestTs, bestGain) = cand.iterator
        .filterNot(c => taken(c._1))
        .map { case (id, ts) => (id, ts, ts.count(!covered(_)).toLong) }
        .reduceLeft { (a, b) =>
          if (b._3 > a._3 || (b._3 == a._3 && b._1 < a._1)) b else a
        }
      taken += bestId
      covered ++= bestTs
      Pick(step, bestId, bestGain, covered.size.toLong, bestTs)
    }
  }

  /** The declared-query report: per greedy step, the sample-side gain
    * and cumulative coverage, plus the CORPUS-side cumulative
    * vocabulary coverage of the selected prefix — computed in one
    * distributed pass (vocab ⟕ broadcast selected-token→first-step,
    * then a 5-row conditional aggregate). */
  def coverageReport(docs: DataFrame, textCol: String, idCol: String,
      candidates: Int, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val picks = greedySelect(docs, textCol, idCol, candidates, k)
    // token → earliest step that covers it, over the selected prefix
    val firstStep = picks.flatMap(p => p.tokens.map(_ -> p.step.toLong))
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).min) }.toSeq
      .toDF("token", "first_step")
    val vocab = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .distinct()
    val perStep = vocab
      .join(broadcast(firstStep), Seq("token"), "left")
      .agg(count(lit(1)).as("vocab_total"),
        (1 to k).map(s => sum(when(col("first_step") <= s, 1L).otherwise(0L))
          .as(s"c$s")): _*)
    val sample = picks
      .map(p => (p.step.toLong, p.docId, p.gain, p.covered))
      .toDF("step", "doc_id", "gain", "covered_sample")
    val longForm = perStep.select(col("vocab_total"),
      explode(map_from_arrays(
        array((1 to k).map(s => lit(s.toLong)): _*),
        array((1 to k).map(s => col(s"c$s")): _*))).as(Seq("step", "corpus_covered")))
    sample.join(broadcast(longForm), Seq("step"))
      .select(col("step"), col("doc_id"), col("gain"), col("covered_sample"),
        col("corpus_covered"), col("vocab_total"),
        expr("corpus_covered * 10000L div vocab_total").as("cover_bp"))
      .orderBy(asc("step"))
  }
}
