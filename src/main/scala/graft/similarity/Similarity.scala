package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>), with three tiers:
  *
  *   - [[topK]]: exact brute force for ONE query — a broadcast of the
  *     query row + TakeOrderedAndProject; linear scan, zero shuffle.
  *     The correctness baseline.
  *   - [[knnJoin]]: exact brute force for a (small) query SET —
  *     broadcast the queries, rank per query with a bounded-heap
  *     aggregate (≤ k rows per (query, partition) shuffle). Cost is
  *     |queries| × |corpus| dot products; fine for ≤10³ queries even
  *     against 10⁹ vectors because it stays inside one scan.
  *   - [[ivfTopK]]: the scale path — IVF (inverted-file) index:
  *     k-means-style centroids (deterministically seeded), every
  *     vector assigned to its nearest centroid (one broadcast argmin,
  *     no shuffle), queries probe only `nprobe` nearest cells. Recall
  *     is tunable via nprobe; at 100 TB the probed fraction ≈
  *     nprobe/centroids of the corpus.
  *
  * All distance math is element-cast-to-double + sequential aggregate,
  * bit-compatible with DuckDB's list_cosine_similarity for oracles.
  */
object Similarity {

  /** Dot product of two ARRAY<FLOAT/DOUBLE> columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native codegen'd cosine (bit-identical to [[cosine]]; see
    * graft.functions.CosineSimExpr) — used by every DataFrame-level
    * operator here because the declarative form pays interpreted
    * per-element lambda evaluation in the O(pairs × dim) hot loops. */
  private[similarity] def ncos(df: DataFrame, a: Column, b: Column): Column =
    graft.functions.CosineSimExpr.cosineSim(df.sparkSession, a, b)

  /** Exact top-k by cosine for a single query vector, supplied as a
    * one-row DataFrame (id, vec). The query side is broadcast; the
    * corpus is scanned once; orderBy+limit compiles to
    * TakeOrderedAndProject (bounded heap per partition + driver merge,
    * exactly a distributed min-max heap). */
  def topK(corpus: DataFrame, vecCol: String, idCol: String,
      query: DataFrame, k: Int): DataFrame = {
    val q = broadcast(query.select(col("qvec")))
    corpus.crossJoin(q)
      .withColumn("score", round(ncos(corpus, col(vecCol), col("qvec")), 4))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), asc(idCol))
      .limit(k)
  }

  /** Exact elementwise mean of an embedding column, as a ONE-ROW frame
    * `{qvec: array<double>}`. posexplode feeds a hash aggregate whose
    * partial (map-side) state is dim (sum, count) pairs per partition,
    * so the exchange carries partitions × dim rows — corpus size never
    * crosses the wire, and no driver-side vector math happens at all.
    * Components round to 6 decimals so a DuckDB oracle consuming the
    * same mean parses the identical decimal to the identical double
    * (the cosine kernels on both engines then accumulate the same
    * values in the same index order → bit-equal scores). */
  def meanVector(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(avg(col("x").cast("double")).as("mx"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pm"))
      .select(transform(col("pm"),
        p => round(p.getField("mx"), 6)).as("qvec"))

  /** Exact corpus outliers: the k vectors LEAST cosine-similar to the
    * corpus mean — the cheap first-pass screen for mislabeled /
    * off-distribution embeddings. One aggregation pass builds the mean
    * ([[meanVector]]), which broadcasts as a single row; scoring is the
    * native kernel over one corpus scan; ascending orderBy+limit
    * compiles to TakeOrderedAndProject (bounded heap per partition,
    * driver merge) — nothing global ever sorts. */
  def outliers(corpus: DataFrame, vecCol: String, idCol: String,
      k: Int): DataFrame = {
    val q = broadcast(meanVector(corpus, vecCol))
    corpus.crossJoin(q)
      .withColumn("score", round(ncos(corpus, col(vecCol), col("qvec")), 4))
      .select(col(idCol), col("score"))
      .orderBy(asc("score"), asc(idCol))
      .limit(k)
  }

  /** Exact k-NN join: for every query row, its k nearest corpus rows.
    * Queries broadcast; per-query ranking via the bounded-heap TopK
    * aggregate (graft.ops.TopK.byScore) rather than a
    * `row_number().over(partitionBy(query_id))` window: a window would
    * funnel the scored corpus×queries frame into |queries| reducer
    * partitions for the sort — pure skew when queries are few and the
    * corpus is huge, and AQE cannot split a window partition. The heap
    * form map-side combines, so the shuffle carries ≤ k rows per
    * (query, partition) and nothing is globally sorted. Ranking ties
    * ((score desc, id asc)) match row_number semantics exactly. */
  def knnJoin(corpus: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String, k: Int): DataFrame = {
    val scored = corpus.crossJoin(
        broadcast(queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"))))
      .where(col(idCol) =!= col("query_id"))
      .withColumn("score", round(ncos(corpus, col(vecCol), col("qvec")), 4))
      .select(col("query_id"), col("score"), col(idCol))
    graft.ops.TopK.byScore(scored, Seq("query_id"), "score", idCol, k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("score"), col("rk"))
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the k most cosine-similar corpus rows whose label DIFFERS from
    * the query's — the informative negatives near the decision
    * boundary (the in-batch-negatives upgrade every embedding-model
    * pipeline ships). Same broadcast + bounded-heap shape as
    * [[knnJoin]]; the label filter runs BEFORE ranking (top-k OF the
    * wrong-label set, not a post-filter of the top-k, which could
    * return fewer than k). */
  def hardNegatives(corpus: DataFrame, vecCol: String, idCol: String,
      labelCol: String, queries: DataFrame, qVecCol: String,
      qIdCol: String, qLabelCol: String, k: Int): DataFrame = {
    val scored = corpus.crossJoin(
        broadcast(queries.select(col(qIdCol).as("query_id"),
          col(qVecCol).as("qvec"), col(qLabelCol).as("qlabel"))))
      .where(col(idCol) =!= col("query_id") && col(labelCol) =!= col("qlabel"))
      .withColumn("score", round(ncos(corpus, col(vecCol), col("qvec")), 4))
      .select(col("query_id"), col("score"), col(idCol))
    graft.ops.TopK.byScore(scored, Seq("query_id"), "score", idCol, k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("score"), col("rk"))
  }

  /** Truncated-dimension recall evaluation (the matryoshka-
    * representation question, Kusupati et al., NeurIPS 2022): how
    * much top-k recall survives keeping only the first `dim`
    * embedding components? Runs [[knnJoin]] at full width and at each
    * truncation (`slice` is a zero-copy prefix — no re-embedding),
    * then joins the neighbor sets per query and scores overlap in
    * basis points. The decision input for "can the ANN index store
    * half the vector": cost is (truncations + 1) broadcast kNN joins
    * over one corpus scan each, never a pairwise matrix. */
  def truncationRecall(corpus: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String, k: Int,
      dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty, "need at least one truncation width")
    val full = knnJoin(corpus, vecCol, idCol, queries, qVecCol, qIdCol, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true) // consumed once per truncation below
    dims.map { d =>
      val tCorpus = corpus.withColumn("__t",
        slice(col(vecCol), lit(1), lit(d)))
      val tQueries = queries.withColumn("__tq",
        slice(col(qVecCol), lit(1), lit(d)))
      val trunc = knnJoin(tCorpus, "__t", idCol, tQueries, "__tq", qIdCol, k)
        .select(col("query_id"), col("neighbor_id"))
      // LEFT join from the full set: a query whose truncated
      // neighbors all miss still contributes its k misses (an inner
      // join would silently drop it and overstate recall).
      full.join(trunc.withColumn("__hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(lit(d).as("dim"),
          expr(s"sum(coalesce(__hit, 0L)) * 10000L div count(1)")
            .as("recall_bp"))
    }.reduce(_ unionByName _).orderBy(asc("dim"))
  }

  /** Recall@k of the IVF-probed kNN join against the exact join, per
    * `nprobe` — the tuning curve that prices the recall/compute
    * trade-off before committing an index config (the IVF analogue of
    * [[truncationRecall]]). The exact neighbor set computes ONCE
    * (checkpointed), and — since every probe width is a PREFIX of the
    * same ranked cell list (TopK's (score desc, id asc) order is
    * strict, so rank ≤ np ≡ the width-np probe set) — the index is
    * scanned and scored ONCE at the WIDEST probe, each candidate
    * tagged with its cell's rank; per width, a bounded-heap TopK over
    * the checkpointed candidates (filtered to cell_rank ≤ np)
    * reproduces [[ivfKnnJoin]]'s result exactly. Recall joins FROM
    * the exact set so queries whose probed cells miss entirely still
    * count their misses. At `nprobe = |cells|` the probe is
    * exhaustive — recall must be 10000 bp (asserted in
    * SimilaritySpec, which also pins per-width identity with
    * ivfKnnJoin).
    */
  def ivfRecallSweep(assigned: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      centroids: DataFrame, k: Int, nprobes: Seq[Int]): DataFrame = {
    require(nprobes.nonEmpty, "need at least one probe width")
    val exact = knnJoin(assigned, vecCol, idCol, queries, qVecCol, qIdCol, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true) // consumed once per probe width below
    val maxNp = nprobes.max
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"))
    val ranked = q.crossJoin(broadcast(centroids))
      .withColumn("s", ncos(queries, col("qvec"), col("cvec")))
      .select(col("query_id"), col("s"), col("centroid_id"))
    val probes = graft.ops.TopK.byScore(ranked, Seq("query_id"), "s",
        "centroid_id", maxNp)
      .select(col("query_id"), col("centroid_id"), col("rk").as("cell_rank"))
    val qSide = probes.join(q, Seq("query_id"))
    // the ONE scan+score of the index for the whole sweep
    val scored = assigned.join(broadcast(qSide), Seq("centroid_id"))
      .where(col(idCol) =!= col("query_id"))
      .withColumn("score", round(ncos(assigned, col(vecCol), col("qvec")), 4))
      .select(col("query_id"), col("score"), col(idCol), col("cell_rank"))
      .localCheckpoint(true)
    nprobes.map { np =>
      val approx = graft.ops.TopK.byScore(
          scored.where(col("cell_rank") <= np),
          Seq("query_id"), "score", idCol, k)
        .select(col("query_id"), col(idCol).as("neighbor_id"))
      exact.join(approx.withColumn("__hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(lit(np.toLong).as("nprobe"),
          expr("sum(coalesce(__hit, 0L)) * 10000L div count(1)")
            .as("recall_bp"))
    }.reduce(_ unionByName _).orderBy(asc("nprobe"))
  }

  /** kNN JOIN through the IVF index — the scale path when the query
    * side is a SET. [[knnJoin]] scores corpus × queries (right for a
    * handful of probes); here each query ranks the centroid table
    * (tiny, broadcast) for its `nprobe` best cells via the
    * bounded-heap TopK — never a per-query window — and corpus
    * candidates come from a broadcast hash join on `centroid_id`: the
    * assigned corpus is NEVER shuffled and scores only the
    * ~`nprobe/c` fraction of rows whose cell some query probes,
    * cutting the scoring work by c/nprobe versus the exact join.
    * Output schema matches [[knnJoin]]; recall vs it is asserted in
    * SimilaritySpec (nprobe = c is exhaustive and must match exactly).
    */
  def ivfKnnJoin(assigned: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      centroids: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"))
    val ranked = q.crossJoin(broadcast(centroids))
      .withColumn("s", ncos(queries, col("qvec"), col("cvec")))
      .select(col("query_id"), col("s"), col("centroid_id"))
    val probes = graft.ops.TopK.byScore(ranked, Seq("query_id"), "s",
        "centroid_id", nprobe)
      .select(col("query_id"), col("centroid_id"))
    val qSide = probes.join(q, Seq("query_id"))
    val cand = assigned.join(broadcast(qSide), Seq("centroid_id"))
      .where(col(idCol) =!= col("query_id"))
      .withColumn("score", round(ncos(assigned, col(vecCol), col("qvec")), 4))
      .select(col("query_id"), col("score"), col(idCol))
    graft.ops.TopK.byScore(cand, Seq("query_id"), "score", idCol, k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("score"), col("rk"))
  }

  /** Deterministic k-means IVF centroids, trained the way production
    * IVF quantizers are built (faiss recipe): a BOUNDED deterministic
    * sample of the corpus is collected once, the Lloyd iterations run
    * locally on the driver (the sample is ≤ `maxTrain` × dim doubles —
    * megabytes, independent of corpus size), and the full corpus is
    * touched only by the ONE distributed assignment pass in
    * [[ivfAssign]]. The previous shape — each Lloyd iteration as its
    * own distributed job — paid 2·iters job launches + shuffles to
    * move megabytes; training cost now stays flat as the corpus grows
    * and the cluster runs exactly one pass over the data.
    *
    * Seeding: the first `c` sample vectors by id. The sample itself is
    * deterministic — hash-filtered by `trainPct`, then the `maxTrain`
    * smallest rows by (xxhash64(id), id), which compiles to
    * TakeOrderedAndProject (bounded heap per partition, driver merge).
    *
    * @param trainPct percent of the corpus (deterministic hash sample
    *   on the id) eligible for training; 100 = whole corpus eligible.
    * @param maxTrain hard cap on collected training vectors; 64k of
    *   dim-64 doubles ≈ 33 MB driver-side.
    */
  def ivfCentroids(corpus: DataFrame, vecCol: String, idCol: String, c: Int,
      iters: Int = 5, trainPct: Int = 100, maxTrain: Int = 1 << 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(trainPct >= 1 && trainPct <= 100, s"trainPct $trainPct")
    val eligible =
      if (trainPct >= 100) corpus
      else corpus.where(pmod(xxhash64(col(idCol)), lit(100)) < trainPct)
    val sample: Array[(Long, Array[Double])] = eligible
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(maxTrain)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    require(sample.nonEmpty, "empty training sample")
    val train = sample.map(_._2)
    var cents: Array[Array[Double]] =
      sample.sortBy(_._1).take(c).map(_._2.clone())
    val norms = train.map(v => math.sqrt(v.map(x => x * x).sum))
    def cos(v: Array[Double], vn: Double, u: Array[Double]): Double = {
      var d = 0.0; var un = 0.0; var i = 0
      while (i < v.length) { d += v(i) * u(i); un += u(i) * u(i); i += 1 }
      if (vn == 0 || un == 0) 0.0 else d / (vn * math.sqrt(un))
    }
    for (_ <- 1 to iters) {
      val sums = Array.fill(cents.length)(new Array[Double](train(0).length))
      val counts = new Array[Long](cents.length)
      var r = 0
      while (r < train.length) {
        var best = 0; var bestS = Double.NegativeInfinity; var ci = 0
        while (ci < cents.length) {
          val s0 = cos(train(r), norms(r), cents(ci))
          // ties keep the HIGHER cell id, mirroring the distributed
          // argmax (array_max over struct(score, cid)).
          if (s0 > bestS || (s0 == bestS && ci > best)) { bestS = s0; best = ci }
          ci += 1
        }
        val s = sums(best); val v = train(r); var i = 0
        while (i < v.length) { s(i) += v(i); i += 1 }
        counts(best) += 1
        r += 1
      }
      // A cluster that empties keeps its previous centroid.
      cents = cents.zipWithIndex.map { case (prev, ci) =>
        if (counts(ci) == 0) prev
        else sums(ci).map(_ / counts(ci))
      }
    }
    cents.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("centroid_id", "cvec")
  }

  /** Assign every corpus vector to its nearest centroid: broadcast the
    * centroid array, argmax cosine via a single array expression — no
    * shuffle, no explode. Per-centroid scoring goes through the native
    * cosine kernel (the lambda here only routes struct fields; the
    * O(dim) loop is codegen'd). */
  def ivfAssign(corpus: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame): DataFrame = {
    val cents = broadcast(centroids.agg(
      collect_list(struct(col("centroid_id"), col("cvec"))).as("cents")))
    corpus.crossJoin(cents)
      .withColumn("scored", transform(col("cents"), c =>
        struct(ncos(corpus, col(vecCol), c.getField("cvec")).as("s"),
          c.getField("centroid_id").as("cid"))))
      .withColumn("centroid_id", array_max(col("scored")).getField("cid"))
      .drop("cents", "scored")
  }

  /** ANN top-k through the IVF index: rank centroids for the query,
    * scan only the `nprobe` best cells. */
  def ivfTopK(assigned: DataFrame, vecCol: String, idCol: String,
      query: DataFrame, k: Int, centroids: DataFrame, nprobe: Int = 4): DataFrame = {
    val probeCells = ivfAssignQuery(query, centroids, nprobe)
    val cand = assigned.join(broadcast(probeCells), Seq("centroid_id"))
    topK(cand, vecCol, idCol, query, k)
  }

  def ivfAssignQuery(query: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame =
    query.crossJoin(centroids)
      .withColumn("s", ncos(query, col("qvec"), col("cvec")))
      .orderBy(desc("s")).limit(nprobe)
      .select(col("centroid_id"))

  /** Embedding near-dup pairs: EXACT all-pairs cosine ≥ threshold.
    * O(n²) — the correctness baseline and fine below ~10⁵ vectors;
    * the scale path is [[rpLshNearDups]]. */
  def cosineNearDups(corpus: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    // Cast float→double ONCE per vector before the pair join — inside
    // the join it would run once per PAIR (n²/2 array copies).
    val a = corpus.select(col(idCol).as("id_a"),
      col(vecCol).cast("array<double>").as("va"))
    val b = corpus.select(col(idCol).as("id_b"),
      col(vecCol).cast("array<double>").as("vb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("cos", round(ncos(corpus, col("va"), col("vb")), 4))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Scalar int8 quantization: per-vector symmetric scale
    * (max|v|/127), elements round to [-127, 127] — 4× smaller than
    * float32 at recall cost near zero for cosine work. At 100 TB the
    * embedding store drops from ~256 GB/10⁹ vectors/dim64 to 64 GB,
    * which is the difference between spilling and RAM-resident probe
    * sides. Pure Column arithmetic (codegen'd, zero shuffle);
    * [[dequantize]] inverts it for exact-rescoring stages. */
  def quantizeInt8(vec: Column): Column = {
    val scale = aggregate(vec, lit(0.0d),
      (acc, v) => greatest(acc, abs(v.cast("double")))) / 127.0
    struct(
      scale.as("scale"),
      transform(vec, v =>
        round(v.cast("double") / greatest(scale, lit(1e-30)))
          .cast("int")).as("q"))
  }

  def dequantize(quant: Column): Column =
    transform(quant.getField("q"),
      q => q.cast("double") * quant.getField("scale"))

  /** Random-hyperplane (sign) LSH signature: bit p = sign of
    * ⟨v, h_p⟩ where hyperplane components are deterministic hash noise
    * in [-1, 1). P[bit differs] = angle/π, so near-identical vectors
    * share almost all bits. One aggregate pass over dimensions.
    *
    * This declarative form is the REFERENCE implementation (its
    * nested lambdas evaluate interpreted, dim × planes steps per row);
    * operators use the bit-identical native kernel
    * [[graft.functions.RpLshSigExpr]] — equivalence asserted in
    * SimilaritySpec. */
  def rpLshSignature(vec: Column, planes: Int = 64): Column = {
    val planeIdx = sequence(lit(0), lit(planes - 1))
    val dots = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1), (v, i) =>
        struct(v.cast("double").as("v"), i.as("i"))),
      array_repeat(lit(0.0), planes),
      (acc, e) => zip_with(acc, planeIdx, (a, p) =>
        a + e.getField("v") *
          ((pmod(conv(substring(md5(concat_ws("|",
              e.getField("i").cast("string"), p.cast("string"))), 1, 13),
              16, 10).cast("long"), lit(2000L)).cast("double") - 1000.0)
            / 1000.0)))
    aggregate(
      zip_with(dots, planeIdx, (d, p) =>
        when(d > 0, call_function("shiftleft", lit(1L), p)).otherwise(0L)),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Approximate cosine near-dups: RP-LSH signature → pigeonhole
    * chunk join (same trick as SimHash) → exact cosine verify on the
    * candidates only. Candidate count is bounded by bucket collisions,
    * not corpus².
    *
    * Scale shape: the banded frame carries only (id, sig) — 16 bytes —
    * so the 4× explode never multiplies embedding payload through the
    * bucket shuffle. A pair colliding in several chunks is emitted
    * once, from its FIRST colliding chunk (a signature-arithmetic
    * filter on the joined row), replacing a distinct() that would
    * shuffle the candidate set again. Vectors re-attach by id only for
    * the surviving candidates. */
  def rpLshNearDups(corpus: DataFrame, vecCol: String, idCol: String,
      threshold: Double, maxBitDiff: Int = 3): DataFrame = {
    val chunks = maxBitDiff + 1
    val width = 64 / chunks
    def keyOf(sig: Column, c: Column): Column =
      call_function("shiftrightunsigned", sig, c * width)
        .bitwiseAND((1L << width) - 1)
    val sigs = corpus.select(col(idCol).as("id"),
      graft.functions.RpLshSigExpr.rpLshSig(corpus.sparkSession,
        col(vecCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        c => keyOf(col("sig"), c))))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "key")
    val priorChunks = filter(sequence(lit(0), lit(chunks - 1)),
      c => c < col("x.chunk"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .where(!exists(priorChunks,
        c => keyOf(col("x.sig"), c) === keyOf(col("y.sig"), c)))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    val va = corpus.select(col(idCol).as("id_a"),
      col(vecCol).cast("array<double>").as("va"))
    val vb = corpus.select(col(idCol).as("id_b"),
      col(vecCol).cast("array<double>").as("vb"))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cos", round(ncos(corpus, col("va"), col("vb")), 4))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
