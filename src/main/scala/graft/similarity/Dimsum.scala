package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DIMSUM-sampled all-pairs column cosine similarity over a sparse
  * binary (row, column) matrix — the shuffle-bounded scale path for
  * "which items co-occur more than chance" when the exact wedge join
  * (q_item_similarity) gets quadratic in the hot columns. Follows
  * Zadeh & Carlson, "Dimension Independent Similarity Computation"
  * (DIMSUM, KDD 2013 / Spark's RowMatrix.columnSimilarities): each
  * in-row pair (i, j) survives to the shuffle only with probability
  * p_ij = min(1, γ / (‖cᵢ‖·‖cⱼ‖)), and the estimator
  * X_ij / (p_ij·‖cᵢ‖·‖cⱼ‖) is unbiased for cos(i, j). The magic is
  * oversampling-by-magnitude: HOT column pairs (the quadratic blowup)
  * get the smallest p, so shuffle volume per pair is O(γ) regardless
  * of column skew, while cold pairs pass through exactly (p = 1).
  *
  * Determinism: the coin is the repo-standard 52-bit md5 draw keyed by
  * (row, i, j) compared against p·2⁵² in one fixed IEEE op order, so
  * the sample — and therefore every estimate — is bit-reproducible
  * run to run at any parallelism.
  */
object Dimsum {

  private def coin(r: Column, a: Column, b: Column): Column =
    conv(substring(md5(concat(lit("ds|"), r.cast("string"), lit("|"),
      a.cast("string"), lit("|"), b.cast("string"))), 1, 13), 16, 10)
      .cast("double")

  /** Sampled pairs (a, b, n_sampled, est_cos_e4) with a < b. `gamma`
    * trades shuffle volume for variance (γ ≥ 4·ln n /ε² for ±ε on
    * pairs above ε — in practice a few tens). The coin filter runs
    * BEFORE the pair aggregate, so the shuffle carries only sampled
    * pairs; the wedge generation itself stays map-side of it. */
  def pairs(rc: DataFrame, rowCol: String, colCol: String, gamma: Double,
      minCosE4: Long = 0L): DataFrame = {
    val rcD = rc.select(col(rowCol).as("r"), col(colCol).as("c"))
      .distinct()
      .localCheckpoint(eager = true) // column-norm agg + both join legs
    val n = rcD.groupBy(col("c")).agg(count(lit(1)).as("n"))
    // Checkpointed: a self-join of one frame gets NO exchange reuse
    // under AQE (build note), so without this both legs would
    // re-derive sides independently. The repartition does NOT let the
    // planner skip the join exchanges (localCheckpoint drops
    // partitioning metadata — PartitionReuseSpec pins that), but
    // laying the materialized frame out by the wedge key measured
    // ~15% faster end-to-end (each exchange map task then writes
    // almost entirely to one reducer; same-session A/B).
    val sides = rcD.join(broadcast(n), Seq("c"))
      .repartition(col("r"))
      .localCheckpoint(eager = true)
    // p in one fixed op order both at sampling and at estimation
    def pOf(na: Column, nb: Column): Column =
      least(lit(1.0), lit(gamma) /
        (sqrt(na.cast("double")) * sqrt(nb.cast("double"))))
    val sampled = sides.as("x").join(sides.as("y"),
        col("x.r") === col("y.r") && col("x.c") < col("y.c"))
      .where(coin(col("x.r"), col("x.c"), col("y.c")) <
        pOf(col("x.n"), col("y.n")) * lit(4503599627370496.0))
      .select(col("x.c").as("a"), col("y.c").as("b"),
        col("x.n").as("na"), col("y.n").as("nb"))
    sampled.groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("n_sampled"))
      .withColumn("est_cos_e4", expr(
        s"""CAST(floor(CAST(n_sampled AS DOUBLE) * 10000.0 /
           |  (least(1.0, $gamma / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))))
           |   * sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))))
           | AS BIGINT)""".stripMargin))
      .where(col("est_cos_e4") >= minCosE4)
      .select(col("a"), col("b"), col("n_sampled"), col("est_cos_e4"))
  }

  /** Entry-sampled ("two-sided") tier above [[pairs]]: [[pairs]]
    * still ENUMERATES every in-row pair before coining it away; when
    * hot rows make that enumeration itself the bottleneck, sample the
    * ENTRIES first — (r, c) survives with p_c = min(1, √γ/‖c‖) on its
    * own md5 coin — so the pair join is built from the THINNED
    * matrix and the wedge stream never materializes at full size. A
    * pair (a, b) then appears with q_ab = p_a·p_b ≥ γ/(‖a‖·‖b‖)
    * (independent entry coins) and X_ab/(q_ab·‖a‖·‖b‖) is unbiased
    * for cos(a, b) — at the cost of coin REUSE across one entry's
    * pairs (higher variance per γ than the pair-coined form: the
    * DISCO trade, Zadeh & Goel, Foundations of Data analysis /
    * DISCO 2012). Same determinism recipe as [[pairs]]: a 52-bit md5
    * dyadic per entry ('d2|' salt) against one fixed-IEEE-shape
    * threshold, so a SQL oracle replays the thinned matrix
    * bit-for-bit. Use √γ with an exact binary representation (γ=16)
    * when oracle-pairing. */
  def pairsTwoSided(rc: DataFrame, rowCol: String, colCol: String,
      gamma: Double, minCosE4: Long = 0L): DataFrame = {
    val rcD = rc.select(col(rowCol).as("r"), col(colCol).as("c"))
      .distinct()
      .localCheckpoint(eager = true) // column-norm agg + the sides build
    val n = rcD.groupBy(col("c")).agg(count(lit(1)).as("n"))
    val sqg = math.sqrt(gamma)
    val entryCoin = conv(substring(md5(concat(lit("d2|"),
        col("r").cast("string"), lit("|"), col("c").cast("string"))),
        1, 13), 16, 10).cast("double")
    val sides = rcD.join(broadcast(n), Seq("c"))
      .where(entryCoin <
        least(lit(1.0), lit(sqg) / sqrt(col("n").cast("double")))
          * lit(4503599627370496.0))
      .localCheckpoint(eager = true) // both pair-join legs
    val qExpr =
      s"""(least(1.0, $sqg / sqrt(CAST(na AS DOUBLE)))
         | * least(1.0, $sqg / sqrt(CAST(nb AS DOUBLE))))""".stripMargin
    sides.as("x").join(sides.as("y"),
        col("x.r") === col("y.r") && col("x.c") < col("y.c"))
      .groupBy(col("x.c").as("a"), col("y.c").as("b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .agg(count(lit(1)).as("n_sampled"))
      .withColumn("est_cos_e4", expr(
        s"""CAST(floor(CAST(n_sampled AS DOUBLE) * 10000.0 /
           |  ($qExpr * sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))))
           | AS BIGINT)""".stripMargin))
      .where(col("est_cos_e4") >= minCosE4)
      .select(col("a"), col("b"), col("n_sampled"), col("est_cos_e4"))
  }
}
