package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.dedup.Dedup
import graft.similarity.{IvfPq, Pq, Similarity}

/** Recall/equivalence gates for the approximate query paths, run
  * inside [[Verify]] so the local correctness gate is strictly
  * stronger than the driver's rows-only check: the 13 queries without
  * a SQL oracle would otherwise stay "green" in CORRECTNESS even if
  * LSH recall silently cratered. Each gate re-asserts, against the
  * actual verify-scale data, the property its ScalaTest spec proves on
  * fixtures (DedupSpec / SimilaritySpec / PqSpec / IvfPqSpec /
  * SemanticDedupSpec):
  *
  *   - minhash_highj_recall — MinHash+LSH must recover (nearly) all
  *     high-Jaccard (≥ 0.8) exact pairs; j=0.8 candidates survive a
  *     (k=64, b=16) banding with P(miss) ≈ 2e-4.
  *   - rplsh_twin_recall — RP-LSH near-dup must recover every planted
  *     ±0.1%-perturbation twin (its operating envelope, cos ≈ 1).
  *   - simhash_pigeonhole — the chunk-join candidates must EQUAL the
  *     brute-force hamming ≤ 3 pair set (pigeonhole is exact, not
  *     approximate; any gap is a banding bug).
  *   - pq_refined_recall — ADC + exact-rescore top-10 vs brute cosine.
  *   - ivf_probeall — probing ALL cells must equal brute force (cell
  *     pruning is the only approximation IVF adds).
  *   - ivfpq_allcells — IVF-PQ at nprobe=all must equal the refined-PQ
  *     answer on the same model.
  *   - semantic_dedup_groups — every planted twin resolves into a
  *     duplicate group (one group per twin).
  *
  * All inputs are bounded: `maxDocs`/`maxVecs` cap the corpus slice by
  * id so the brute-force comparisons stay O(cap²) regardless of SF.
  */
object RecallGates {

  final case class Gate(name: String, value: Double, floor: Double) {
    def pass: Boolean = value >= floor
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col(df.columns(0)).cast("long"), col(df.columns(1)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallOf(exact: Set[(Long, Long)],
      approx: Set[(Long, Long)]): Double =
    if (exact.isEmpty) 1.0
    else exact.count(approx.contains).toDouble / exact.size

  def run(spark: SparkSession, sfDir: String, maxDocs: Long = 2000,
      maxVecs: Long = 2000): Seq[Gate] = {
    val docs = documents(spark, sfDir)
      .where(col("doc_id") < maxDocs).select(col("doc_id"), col("text"))
    val emb = embeddings(spark, sfDir)
      .where(col("vec_id") < maxVecs).select(col("vec_id"), col("embedding"))

    // MinHash+LSH recall on high-jaccard exact pairs.
    val exactHighJ = pairSet(
      Dedup.jaccardPairs(spread(docs), "text", "doc_id", n = 3, threshold = 0.8)
        .select(col("doc_a"), col("doc_b")))
    val minhash = pairSet(
      Dedup.minhashNearDups(spread(docs), "text", "doc_id",
        k = 64, bands = 16, n = 3, threshold = 0.3)
        .where(col("jaccard") >= 0.8).select(col("doc_a"), col("doc_b")))
    val g1 = Gate("minhash_highj_recall", recallOf(exactHighJ, minhash), 0.95)

    // RP-LSH twin recall (the q_cosine_near_dup_lsh construction).
    val twins = emb.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x * (lit(1.0f) +
          (pmod(col("vec_id") + i, lit(3)) - 1).cast("float") * lit(0.001f)))
        .as("embedding"))
    val nBase = emb.count()
    val lshPairs = pairSet(
      Similarity.rpLshNearDups(emb.unionByName(twins), "embedding", "vec_id",
        threshold = 0.999).select(col("id_a"), col("id_b")))
    val twinsFound = lshPairs.count { case (a, b) => b == a + 1000000L }
    val g2 = Gate("rplsh_twin_recall",
      if (nBase == 0) 1.0 else twinsFound.toDouble / nBase, 0.999)

    // SimHash pigeonhole candidates ≡ brute-force hamming ≤ 3 pairs.
    val sigs = docs.select(col("doc_id"),
      graft.functions.SimHash64Expr.simhash64(spark, col("text")).as("sh"))
    val a = sigs.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    val brute = pairSet(a.crossJoin(b)
      .where(col("doc_a") < col("doc_b") &&
        bit_count(col("sha").bitwiseXOR(col("shb"))) <= 3)
      .select(col("doc_a"), col("doc_b")))
    val cand = pairSet(
      Dedup.simhashCandidatePairs(spread(docs), "text", "doc_id", maxDist = 3)
        .select(col("doc_a"), col("doc_b")))
    val g3 = Gate("simhash_pigeonhole",
      if (brute == cand) 1.0 else recallOf(brute, cand), 1.0)

    // ANN gates share one exact baseline: brute top-10 for vec 0.
    val query = emb.where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val rest = emb.where(col("vec_id") =!= 0)
    val exactTop = Similarity.topK(rest, "embedding", "vec_id", query, 10)
      .collect().map(_.getLong(0)).toSeq
    val qArr = emb.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray

    val model = Pq.train(emb, "embedding", "vec_id", m = 8, ksub = 16)
    val enc = Pq.encode(spread(rest), "embedding", "vec_id", model)
    val refined = Pq.adcTopKRefined(enc, rest, "embedding", "vec_id",
      model, qArr, 10).collect().map(_.getLong(0)).toSeq
    // Floor 0.75, not PqSpec's 0.9: the synthetic embeddings are
    // near-uniform (pair cosines ~0.5-0.6, tiny top-k margins — the
    // worst case for ADC + bounded overfetch); measured 0.80-0.90
    // across the SF data draws at overfetch 8 (sf0.001's draw sat at
    // 0.70 under overfetch 4 — the draws differ in hardness), while
    // the clustered-fixture spec holds ≥ 0.9. The gate's job is to
    // catch a recall COLLAPSE (kernel/codebook regression → ~0.1),
    // not to re-grade data hardness.
    val g4 = Gate("pq_refined_recall",
      exactTop.toSet.intersect(refined.toSet).size.toDouble /
        math.max(1, exactTop.size), 0.75)

    val cents = Similarity.ivfCentroids(emb, "embedding", "vec_id", 16)
    val assigned = Similarity.ivfAssign(spread(emb), "embedding", "vec_id", cents)
    val ivfAll = Similarity.ivfTopK(assigned.where(col("vec_id") =!= 0),
      "embedding", "vec_id", query, 10, cents, nprobe = 16)
      .collect().map(_.getLong(0)).toSeq
    val g5 = Gate("ivf_probeall", if (ivfAll == exactTop) 1.0 else 0.0, 1.0)

    val index = IvfPq.build(spread(rest), "embedding", "vec_id",
      c = 16, m = 8, ksub = 16)
    val encIdx = Pq.encode(spread(rest), "embedding", "vec_id", index.model)
    val refinedIdx = Pq.adcTopKRefined(encIdx, rest, "embedding", "vec_id",
      index.model, qArr, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivfpqAll = IvfPq.topK(index, rest, "embedding", "vec_id", qArr,
      k = 10, nprobe = 16).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val g6 = Gate("ivfpq_allcells", if (ivfpqAll == refinedIdx) 1.0 else 0.0, 1.0)

    // Semantic dedup: planted twins must all land in duplicate groups.
    val semBase = emb
    val semTwins = semBase.where(col("vec_id") % 10 === 0).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.0001f)).as("embedding"))
    val nPlanted = semTwins.count()
    val semCorpus = spread(semBase.unionByName(semTwins))
    val semCents = Similarity.ivfCentroids(semCorpus, "embedding", "vec_id", 8)
    val semPairs = graft.similarity.SemanticDedup.clusterPairs(semCorpus,
      "embedding", "vec_id", semCents, 0.999)
    val nGroups = graft.ops.ConnectedComponents.summary(
      graft.similarity.SemanticDedup.dupGroups(semPairs)).count()
    val g7 = Gate("semantic_dedup_groups",
      if (nPlanted == 0) 1.0 else nGroups.toDouble / nPlanted, 1.0)

    // DSIR selection quality: q_dsir's construction — three planted
    // twins of target docs carry maximal importance weight (they ARE
    // target text) and must survive Gumbel top-50 selection.
    val dsirTwinIds = Seq(3L, 7L, 11L)
    val dsirTarget = docs.where(col("doc_id") < 25)
    val dsirTwins = docs.where(col("doc_id").isin(dsirTwinIds: _*))
      .select((col("doc_id") + 300000L).as("doc_id"), col("text"))
    val dsirRaw = docs.unionByName(dsirTwins)
    val dsirB = 4096
    val dsirW = graft.text.Dsir.weightsMicroNats(
      graft.text.Dsir.bucketCounts(dsirTarget, "text", dsirB),
      graft.text.Dsir.bucketCounts(dsirRaw, "text", dsirB))
    val dsirPicked = graft.text.Dsir.resample(dsirRaw, "text", "doc_id",
      dsirW, dsirB, k = 50, seed = "graft-r4")
      .collect().map(_.getLong(0)).toSet
    val g8 = Gate("dsir_plant_recall",
      dsirTwinIds.count(id => dsirPicked.contains(id + 300000L)).toDouble /
        dsirTwinIds.size, 1.0)

    // HLL sketch-rollup accuracy: per-day AND merged-total estimates
    // vs exact distincts; lgK=12 → ~1.6% RSE, gate at 5% worst-case.
    val ev = events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val sk = graft.ops.SketchRollup.sketches(ev, Seq("day"), "user_id")
    val estByDay = graft.ops.SketchRollup.rollup(sk, Seq("day"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val estTotal = graft.ops.SketchRollup.rollup(sk, Nil)
      .collect()(0).getLong(0)
    val exactByDay = ev.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val exactTotal = ev.agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val relErrs = exactByDay.map { case (d, n) =>
      math.abs(estByDay.getOrElse(d, 0L) - n).toDouble / math.max(n, 1L)
    }.toSeq :+ (math.abs(estTotal - exactTotal).toDouble / math.max(exactTotal, 1L))
    val g9 = Gate("hll_rollup_relerr", 1.0 - relErrs.max, 0.95)

    // KLL quantile-rollup accuracy: per-type p50/p90/p99 from merged
    // per-(type, day) sketches vs the true rank of each estimate in
    // that type's raw values — worst-case RANK error gated at 2%
    // (the spec's bound at k=200; rank error is the sketch's actual
    // guarantee, value error is data-dependent and ungateable).
    val evq = events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val qprobs = Seq(0.5, 0.9, 0.99)
    val qsk = evq.groupBy(col("event_type"), col("day"))
      .agg(graft.ops.QuantileSketch.sketch(col("value")).as("sketch"))
    val qest = graft.ops.QuantileSketch.rollup(qsk, Seq("event_type"), qprobs)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val rankErrs = qest.toSeq.flatMap { case (tpe, ests) =>
      val vals = evq.where(col("event_type") === tpe)
        .select(col("value")).collect().map(_.getDouble(0)).sorted
      qprobs.zip(ests).map { case (q, v) =>
        val r = vals.count(_ <= v).toDouble / vals.length
        math.abs(r - q)
      }
    }
    val g10 = Gate("kll_rollup_rankerr", 1.0 - rankErrs.max, 0.98)

    // Logistic-regression marker-detector quality: the bounded-
    // sample-trained model (q_logreg's exact path) must recover the
    // planted 'dup' marker docs from hashed features on the verify
    // corpus — BALANCED accuracy, because the marker is rare and raw
    // accuracy would stay green predicting all-negative. A silent
    // featurization or GD regression would otherwise stay rows-green.
    val allDocs = documents(spark, sfDir)
    val lrLabel = array_contains(
      graft.text.TextAnalysis.tokens(col("text")), "dup")
    val lrModel = graft.text.LogReg.train(
      allDocs, "text", "doc_id", lrLabel, buckets = 64)
    val conf = graft.text.LogReg.confusion(allDocs, "text", lrLabel, lrModel)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def c(a: Long, p: Long): Long = conf.getOrElse((a, p), 0L)
    val tpr = c(1, 1).toDouble / math.max(c(1, 1) + c(1, 0), 1L)
    val tnr = c(0, 0).toDouble / math.max(c(0, 0) + c(0, 1), 1L)
    val g11 = Gate("logreg_balacc", (tpr + tnr) / 2.0, 0.95)

    // CMS inner-product join-size estimate vs the exact Σ c(k)² on
    // the skewed l_partkey self-join: the estimate is one-sided
    // (est >= true always — a violation means broken hashing/merge),
    // and at w=65536 the overestimate should stay well inside 10%.
    val cmsKeys = graft.Tables.lineitem(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("l_partkey")
        .cast("string").as("k"))
    val cmsRow = graft.ops.CountMinSketch
      .sketches(cmsKeys, Nil, "k", d = 5, w = 65536)
      .collect().head.getAs[org.apache.spark.sql.Row]("cms")
    val cmsSk = graft.ops.CountMinSketch.fromData(
      graft.ops.CountMinSketch.CmsData(cmsRow.getInt(0), cmsRow.getInt(1),
        cmsRow.getLong(2), cmsRow.getSeq[Long](3)))
    val cmsEst = graft.ops.CountMinSketch.innerProduct(cmsSk, cmsSk)
    val truePairs = {
      import org.apache.spark.sql.functions._
      cmsKeys.groupBy(col("k")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c"))).collect().head.getLong(0)
    }
    val g12 = Gate("cms_join_overest",
      if (cmsEst >= truePairs) truePairs.toDouble / cmsEst else 0.0, 0.9)

    // DIMSUM estimate quality: over co-occurring item pairs (exact
    // binary cos ≥ 0.07, ~36k pairs at verify SF) on a bounded basket
    // slice, the SUM of sampled estimates must track the sum of exact
    // cosines (per-pair draws are deterministic but high-variance;
    // the ratio of sums concentrates over the pair population, so the
    // gate is robust to testdata regeneration). γ = 4 sits well below
    // the slice's mean norm product (~10.7, max ~21), so the BULK of
    // pairs are genuinely sampled at p < 1 — measured at γ = 15 only
    // 37/36k pairs sampled and the gate was vacuous (ratio = 1.0000
    // because the exact p = 1 path dominated).
    val basket = graft.Tables.lineitem(spark, sfDir)
      .where(col("l_orderkey") < 5000)
      .select(col("l_orderkey").as("r"), col("l_partkey").as("c"))
    val bD = basket.distinct().localCheckpoint(true)
    val bn = bD.groupBy(col("c")).agg(count(lit(1)).as("n"))
    val bSides = bD.join(broadcast(bn), Seq("c"))
    val exactCos = bSides.as("x").join(bSides.as("y"),
        col("x.r") === col("y.r") && col("x.c") < col("y.c"))
      .groupBy(col("x.c").as("a"), col("y.c").as("b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .agg(count(lit(1)).as("cooc"))
      .withColumn("cos_e4", expr(
        """CAST(floor(CAST(cooc AS DOUBLE) * 10000.0 /
          |  (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))))
          | AS BIGINT)""".stripMargin))
      .where(col("cos_e4") >= 700)
      .select(col("a"), col("b"), col("cos_e4"))
    val dimsumEst = graft.similarity.Dimsum.pairs(basket, "r", "c",
        gamma = 4.0)
      .select(col("a"), col("b"), col("est_cos_e4"))
    val joined = exactCos.join(dimsumEst, Seq("a", "b"), "left")
      .agg(count(lit(1)).as("n"), sum(col("cos_e4")).as("se"),
        sum(coalesce(col("est_cos_e4"), lit(0L))).as("sa"))
      .collect().head
    val g13 = Gate("dimsum_mean_ratio",
      if (joined.getLong(0) < 5) 1.0
      else {
        val ratio = joined.getLong(2).toDouble / joined.getLong(1)
        1.0 - math.abs(ratio - 1.0)
      }, 0.8)

    Seq(g1, g2, g3, g4, g5, g6, g7, g8, g9, g10, g11, g12, g13)
  }
}
