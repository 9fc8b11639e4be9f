package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ORACLE-EXACT HyperLogLog twin (Flajolet, Fusy, Gandouet & Meunier
  * 2007) of the DataSketches tier behind `q_hll_rollup`: the same
  * mergeable register-per-grain pattern, but every piece — hash,
  * bucket, rank, register max, estimate — is an expression BOTH
  * engines compute identically, so the released estimates hash-match
  * a DuckDB replay (the library sketch's internals are not
  * replayable; this twin's are, at the cost of the library's HLL++
  * bias tables).
  *
  * Construction (m = 2^b registers on the 52-bit md5 prefix of
  * `"hll|" || id`):
  *   - bucket = low b bits; w = the remaining 52−b bits,
  *   - rank ρ = leading zeros of w within its (52−b)-bit window + 1
  *     = (52−b+1) − bitlen(w), via the cross-engine bit-length
  *     identity `length(conv(w,10,2))` ≡ `length(bin(w))` (w = 0 →
  *     ρ = 52−b+1),
  *   - register M_j = max ρ per (grain, bucket) — a plain MAX, so
  *     grains merge by max exactly like sketch-union (the rollup
  *     contract),
  *   - Σ 2^(−M_j) rides as the exact integer T = Σ 2^(50−M_j)
  *     (absent buckets contribute 2^50; M ≤ 45 at b = 8, so every
  *     term and the ≤ 2^58 total are exact BIGINTs),
  *   - estimate = α_m·m²·2^50 / T with the standard small-range
  *     linear-counting branch (V = empty registers > 0 and raw ≤
  *     2.5m → m·ln(m/V)) — each branch ONE identically-shaped double
  *     chain floored ONCE (the KN-perplexity rule; the branch
  *     CONDITION compares doubles both engines derive identically).
  *
  * Scale shape: one hash aggregate to (grain, bucket) registers —
  * ≤ m rows per grain regardless of data — then a ≤ m-row aggregate
  * per residual group. Nothing funnels; the register frame is the
  * kilobyte-sized artifact every later range question touches.
  * Accuracy is the textbook ~1.04/√m (≈6.5% at b = 8) without HLL++
  * bias correction — the DataSketches tier remains the production
  * path; SketchRollupSpec bounds this twin against exact counts. */
object HllGrid {

  private val B = 8
  private val M = 1 << B // 256 registers
  private val WBits = 52 - B // 44
  private val RhoMax = WBits + 1 // 45; 2^(50-rho) stays nonneg

  /** (grainCols..., bucket, m_rho) — the mergeable register grains. */
  def registers(df: DataFrame, grainCols: Seq[String],
      idCol: String): DataFrame = {
    val h = conv(substring(md5(concat(lit("hll|"),
      col(idCol).cast("string"))), 1, 13), 16, 10).cast("long")
    val withH = df.select(grainCols.map(col) :+ h.as("__h"): _*)
    val w = shiftrightunsigned(col("__h"), B)
    val rho = when(w === 0L, lit(RhoMax))
      .otherwise(lit(RhoMax) - length(conv(w, 10, 2)))
      .cast("long")
    withH
      .select(grainCols.map(col) :+
        col("__h").bitwiseAND((M - 1).toLong).as("bucket") :+
        rho.as("rho"): _*)
      .groupBy(grainCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("m_rho"))
  }

  /** Pairwise overlap via inclusion–exclusion on register unions —
    * the replayable twin of `SketchRollup.overlap`: per unordered
    * group pair, the union sketch is the bucket-wise MAX of the two
    * register sets (two broadcast equi-join legs, never an OR-join),
    * and `est_inter = est_a + est_b − est_union` clamped at 0. The
    * pair frame is |groups|² rows of registers — bounded by groups ×
    * the grid, not the data. */
  def overlap(registers: DataFrame, groupCol: String): DataFrame = {
    val singles = estimate(registers, Seq(groupCol))
    val gs = registers.select(col(groupCol)).distinct()
    val pairs = gs.select(col(groupCol).as("g_a"))
      .join(gs.select(col(groupCol).as("g_b")), col("g_a") < col("g_b"))
    val legA = registers
      .join(broadcast(pairs), col(groupCol) === col("g_a"))
    val legB = registers
      .join(broadcast(pairs), col(groupCol) === col("g_b"))
    val pairRegs = legA.unionByName(legB)
      .groupBy(col("g_a"), col("g_b"), col("bucket"))
      .agg(max(col("m_rho")).as("m_rho"))
    val unions = estimate(pairRegs, Seq("g_a", "g_b"))
      .withColumnRenamed("est_distinct", "est_union")
    unions
      .join(singles.select(col(groupCol).as("g_a"),
        col("est_distinct").as("est_a")), Seq("g_a"))
      .join(singles.select(col(groupCol).as("g_b"),
        col("est_distinct").as("est_b")), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("est_a"), col("est_b"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_inter"))
  }

  /** Merge register rows down to `residualCols` grains and release
    * the integer estimate per group: (residualCols..., est_distinct).
    * Grains merge by MAX per bucket — exactly sketch union. */
  def estimate(registers: DataFrame,
      residualCols: Seq[String]): DataFrame = {
    val merged =
      if (residualCols.isEmpty)
        registers.groupBy(col("bucket"))
          .agg(max(col("m_rho")).as("m_rho"))
      else
        registers.groupBy(residualCols.map(col) :+ col("bucket"): _*)
          .agg(max(col("m_rho")).as("m_rho"))
    val term = call_function("shiftleft", lit(1L), lit(50L) - col("m_rho"))
    val grouped =
      if (residualCols.isEmpty) merged.agg(
        sum(term).as("__t_present"), count(lit(1)).as("__n_present"))
      else merged.groupBy(residualCols.map(col): _*).agg(
        sum(term).as("__t_present"), count(lit(1)).as("__n_present"))
    // absent buckets: register 0 → 2^50 each; V = empty registers
    grouped
      .withColumn("__t", col("__t_present") +
        (lit(M.toLong) - col("__n_present")) * lit(1L << 50))
      .withColumn("__v", lit(M.toLong) - col("__n_present"))
      // the TEXTUAL double chain below is mirrored verbatim in the
      // oracle (CAST keeps Spark's decimal literals in DOUBLE, like
      // DuckDB's ::DOUBLE) — floor once per branch
      .withColumn("est_distinct", expr(
        s"""CAST(CASE
           |  WHEN __v > 0 AND
           |    (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
           |      + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))
           |      * CAST(256.0 AS DOUBLE) * CAST(256.0 AS DOUBLE)
           |      * CAST(${1L << 50} AS DOUBLE) / CAST(__t AS DOUBLE)
           |      <= CAST(640.0 AS DOUBLE)
           |  THEN floor(CAST(256.0 AS DOUBLE)
           |    * ln(CAST(256.0 AS DOUBLE) / CAST(__v AS DOUBLE)))
           |  ELSE floor(
           |    (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
           |      + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))
           |      * CAST(256.0 AS DOUBLE) * CAST(256.0 AS DOUBLE)
           |      * CAST(${1L << 50} AS DOUBLE) / CAST(__t AS DOUBLE))
           |END AS BIGINT)""".stripMargin))
      .select(residualCols.map(col) :+ col("est_distinct"): _*)
  }
}
