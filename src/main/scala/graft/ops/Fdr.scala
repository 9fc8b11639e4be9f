package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benjamini–Hochberg FDR screen (JRSS-B 1995) over per-token
  * permutation tests — multiple-testing control for "which tokens
  * associate with this document label", every quantity an exact
  * integer (see q_fdr_tokens for the full recipe notes: floor-div bp
  * rate gaps, 32 md5-nibble coins from ONE digest, integer
  * cross-multiplied BH line). */
object Fdr {

  /** @param docs    (doc_id, lbl BOOLEAN, text)
    * @param m       candidate tokens = the m highest-df (ties by token)
    * @param alphaBp BH target FDR in basis points (2500 = 0.25)
    * @return (token, t_obs_bp, p_bp, significant), ordered by token. */
  def tokenScreen(docs: DataFrame, m: Int, alphaBp: Long): DataFrame = {
    val nPerms = 32 // one md5 digest carries all 32 nibble coins
    val toks = docs.select(col("doc_id"), col("lbl"),
        explode(array_distinct(
          split(trim(lower(col("text"))), "\\s+"))).as("token"))
      .where(length(col("token")) > 0)
      .localCheckpoint(true) // df ranking + presence join share it
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("token")).limit(m)
      .select(col("token"))
    def sideOf(idC: Column, lblC: Column, pC: Column): Column =
      when(pC === 0, lblC.cast("long"))
        .otherwise((conv(md5(idC.cast("string")).substr(pC, lit(1)),
          16, 10).cast("long") >= 8).cast("long"))
    val permCol = explode(typedLit((0 to nPerms).toList)).as("p")
    val totals = docs.select(col("doc_id"), col("lbl"), permCol)
      .withColumn("side", sideOf(col("doc_id"), col("lbl"), col("p")))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("nt"), sum(col("side")).as("n1"))
      .select(col("p"), col("n1"), (col("nt") - col("n1")).as("n0"))
    val pres = toks.join(broadcast(top), Seq("token"))
      .select(col("token"), col("doc_id"), col("lbl"), permCol)
      .withColumn("side", sideOf(col("doc_id"), col("lbl"), col("p")))
      .groupBy(col("token"), col("p"))
      .agg(count(lit(1)).as("c"), sum(col("side")).as("c1"))
      .select(col("token"), col("p"), col("c1"),
        (col("c") - col("c1")).as("c0"))
    val t = pres.join(broadcast(totals), Seq("p"))
      .select(col("token"), col("p"), expr(
        """abs((c1 * 10000L div greatest(n1, 1L))
          | - (c0 * 10000L div greatest(n0, 1L)))""".stripMargin)
        .as("t_bp"))
    // no-op bound stamps (the Dedup benchSh idiom): these frames are
    // <= m rows BY CONSTRUCTION (their tokens come through the
    // broadcast(top) m-row join), but the bound lives below their
    // aggregates where JoinAudit's provenance check can't see it —
    // the limit makes the bound structural.
    val obs = t.where(col("p") === 0)
      .select(col("token"), col("t_bp").as("t_obs_bp"))
      .limit(m)
    val pvals = t.where(col("p") >= 1)
      .join(broadcast(obs), Seq("token"))
      .groupBy(col("token"))
      .agg(max(col("t_obs_bp")).as("t_obs_bp"),
        sum((col("t_bp") >= col("t_obs_bp")).cast("long")).as("n_ge"))
      .select(col("token"), col("t_obs_bp"),
        expr(s"(1 + n_ge) * 10000L div ${nPerms + 1}").as("p_bp"))
    import org.apache.spark.sql.expressions.Window
    val ranked = pvals.withColumn("rk",
      row_number().over(Window.orderBy(asc("p_bp"), asc("token")))
        .cast("long"))
    val kstar = ranked.agg(coalesce(
      max(when(col("p_bp") * m <= col("rk") * alphaBp, col("rk"))),
      lit(0L)).as("k_star"))
    ranked.crossJoin(broadcast(kstar))
      .select(col("token"), col("t_obs_bp"), col("p_bp"),
        (col("rk") <= col("k_star")).cast("long").as("significant"))
      .orderBy(asc("token"))
  }
}
