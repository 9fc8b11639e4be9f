package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Round-6 diagnostics operators: the model/data-quality measurements
  * a pipeline runs BETWEEN the heavy stages — time-series
  * autocorrelation, functional-dependency discovery, importance-weight
  * health, cluster-separation quality, and community-structure
  * strength. Every query follows the repo's oracle-parity rules: all
  * ratios are floored integer grids (milli/bp/nano), signed divisions
  * go through the DECIMAL shift trick, and every per-term float is
  * floored ONCE from an identically-shaped expression before any
  * integer aggregation.
  *
  * Scale notes (100 TB): every query aggregates the corpus to a
  * bounded frame FIRST (days × types, FD groups, label × dim grid,
  * brand communities) and does its arithmetic there; nothing joins or
  * windows over raw rows except the one scan-stage pass that builds
  * the aggregate.
  */
object Diagnostics {

  /** ACF lags measured by q_acf (calendar-day lags; a missing day
    * simply contributes no pair at that lag — declared semantics). */
  val acfLags: Seq[Int] = Seq(1, 2, 3, 7)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Autocorrelation function of daily event counts per type at
    // calendar lags 1/2/3/7 — the seasonality/burstiness complement
    // that says HOW persistent daily load is (lag-7 picks up weekly
    // cycles). Exactness: with N = days present and S = Σx, the
    // mean-centered deviation N·x_t − S is an exact integer, so
    // num_k = Σ (N·x_t − S)(N·x_{t+k} − S) and den = Σ (N·x_t − S)²
    // are exact integer sums (the N² factors cancel in the ratio).
    // The signed milli ratio goes through the DECIMAL shift div. One
    // scan-stage daily aggregate; everything after runs on the
    // days × types frame (≤ a few hundred rows at any SF).
    "q_acf" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("x"))
      val st = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nd"), sum(col("x")).as("sx"))
      val dev = daily.join(broadcast(st), Seq("event_type"))
        .select(col("event_type"), col("d"),
          (col("nd") * col("x") - col("sx")).as("e"))
        .localCheckpoint(true) // den agg + both pair-join legs
      val den = dev.groupBy(col("event_type"))
        .agg(sum(col("e") * col("e")).as("den"))
      val lagged = dev
        .select(col("event_type"), col("d"), col("e"),
          explode(typedLit(acfLags)).as("lag"))
      val num = lagged.as("a")
        .join(dev.as("b"),
          col("a.event_type") === col("b.event_type") &&
            date_add(col("a.d"), col("a.lag")) === col("b.d"))
        .groupBy(col("a.event_type").as("event_type"), col("a.lag").as("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("a.e") * col("b.e")).as("num"))
      num.join(broadcast(den), Seq("event_type"))
        .where(col("den") > 0)
        .select(col("event_type"), col("lag"), col("n_pairs"),
          expr("""CAST((CAST(num AS DECIMAL(38,0)) * 1000
                 |  + CAST(10000000 AS DECIMAL(38,0)) * den)
                 | div CAST(den AS DECIMAL(38,0))
                 | - 10000000 AS BIGINT)""".stripMargin).as("acf_milli"))
        .orderBy(asc("event_type"), asc("lag"))
    }),

    // Functional-dependency discovery audit (TANE-style g3 error,
    // Huhtala et al. 1999): for each candidate FD LHS → RHS, the
    // distinct-LHS group count, how many groups witness >1 RHS value
    // (violating groups), and g3 = the minimum rows to delete to make
    // the FD hold exactly (Σ per group of n − max single-RHS count) —
    // the standard "how approximate is this dependency" profile that
    // drives schema normalization and DQ rule mining. Each FD costs
    // one two-level hash aggregate on its own table; the reported
    // frame is 6 rows.
    "q_fd_audit" -> ((s, dir) => {
      def fd(name: String, df: DataFrame, lhs: String, rhs: String) =
        df.groupBy(col(lhs).as("l"), col(rhs).as("r"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("l"))
          .agg(sum(col("c")).as("n"), count(lit(1)).as("k"),
            max(col("c")).as("mx"))
          .agg(count(lit(1)).as("n_groups"),
            sum((col("k") > 1).cast("long")).as("viol_groups"),
            sum(col("n")).as("n_rows"),
            sum(col("n") - col("mx")).as("g3"))
          .select(lit(name).as("fd"), col("n_groups"), col("viol_groups"),
            expr("viol_groups * 10000L div n_groups").as("viol_bp"),
            col("n_rows"), col("g3"),
            expr("g3 * 10000L div n_rows").as("g3_bp"))
      fd("customer.c_custkey->c_nationkey", customer(s, dir),
          "c_custkey", "c_nationkey")
        .unionAll(fd("customer.c_nationkey->c_mktsegment", customer(s, dir),
          "c_nationkey", "c_mktsegment"))
        .unionAll(fd("lineitem.l_partkey->l_suppkey", lineitem(s, dir),
          "l_partkey", "l_suppkey"))
        .unionAll(fd("part.p_brand->p_type", part(s, dir),
          "p_brand", "p_type"))
        .unionAll(fd("part.p_name->p_brand", part(s, dir),
          "p_name", "p_brand"))
        .unionAll(fd("part.p_type->p_size", part(s, dir),
          "p_type", "p_size"))
        .orderBy(asc("fd"))
    }),

    // Importance-weight health diagnostics — the effective sample
    // size the reweighted estimators (PPS / DSIR / temperature mixes)
    // actually carry: ESS = (Σw)²/Σw² (Kish), the max single-weight
    // share, and the relative variance of the weights — all from ONE
    // aggregate over exact integer cent weights; every emitted ratio
    // is a DECIMAL cross-multiplied floor division (S² exceeds
    // BIGINT at scale, so the arithmetic runs in DECIMAL(38,0)
    // throughout). An ESS ratio near 10000 bp means weighting is
    // nearly free; a small one warns the estimator rests on few rows.
    "q_weight_ess" -> ((s, dir) => {
      orders(s, dir)
        .select(expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("w"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("s"),
          // w² sums overflow BIGINT (w is cents; w² ~ 2.5e15 × rows) —
          // the moment sum runs in DECIMAL(38,0), as does everything after
          sum(expr("CAST(w AS DECIMAL(38,0)) * w")).as("ss"),
          max(col("w")).as("mx"))
        .select(col("n"), col("s").as("sum_w"),
          expr("""CAST(CAST(s AS DECIMAL(38,0)) * s * 1000
                 | div CAST(ss AS DECIMAL(38,0)) AS BIGINT)"""
            .stripMargin).as("ess_milli"),
          expr("""CAST(CAST(s AS DECIMAL(38,0)) * s * 10000
                 | div (CAST(ss AS DECIMAL(38,0)) * n) AS BIGINT)"""
            .stripMargin).as("ess_ratio_bp"),
          expr("mx * 10000L div s").as("max_share_bp"),
          expr("""CAST((CAST(n AS DECIMAL(38,0)) * ss * 1000)
                 | div (CAST(s AS DECIMAL(38,0)) * s) - 1000 AS BIGINT)"""
            .stripMargin).as("relvar_milli"))
    }),

    // Simplified silhouette per embedding label (centroid form,
    // Hruschka et al.): a = squared distance to the OWN label
    // centroid, b = min squared distance to any OTHER label centroid,
    // s = (b − a)/max(a, b) — the cluster-separation readout for the
    // labels the ANN/IVF family indexes. Engine-exact: components
    // floor to the integer milli grid (the q_embed_centroids cast),
    // centroids are floor-div milli means (declared: the centroid
    // LIVES on the milli grid), so every d² is an exact integer and
    // both signed ratios ride the shift div. One posexplode pass
    // against the broadcast label × dim centroid grid (|labels|·64
    // rows); nothing quadratic in the corpus.
    "q_silhouette" -> ((s, dir) => {
      val ex = embeddings(s, dir)
        .select(col("vec_id"), col("label"), posexplode(col("embedding"))
          .as(Seq("pos", "v")))
        .select(col("vec_id"), col("label"), col("pos"),
          expr("CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)").as("vm"))
        .localCheckpoint(true) // centroid agg + the distance pass
      val cent = ex.groupBy(col("label").as("clabel"), col("pos"))
        .agg(sum(col("vm")).as("sm"), count(lit(1)).as("cn"))
        .select(col("clabel"), col("pos"),
          expr("(sm + cn * 10000000L) div cn - 10000000L").as("cm"))
      val d2 = ex.join(broadcast(cent), Seq("pos"))
        .groupBy(col("vec_id"), col("label"), col("clabel"))
        .agg(sum((col("vm") - col("cm")) * (col("vm") - col("cm"))).as("d2"))
      val ab = d2.groupBy(col("vec_id"), col("label"))
        .agg(max(when(col("clabel") === col("label"), col("d2"))).as("a"),
          min(when(col("clabel") =!= col("label"), col("d2"))).as("b"))
        .where(greatest(col("a"), col("b")) > 0)
        .select(col("label"), expr(
          """((b - a) * 1000 + 10000000L * greatest(a, b))
            | div greatest(a, b) - 10000000L""".stripMargin).as("sv"))
      ab.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("sv")).as("ssum"))
        .select(col("label"), col("n_vecs"),
          expr("(ssum + n_vecs * 10000000L) div n_vecs - 10000000L")
            .as("mean_s_milli"))
        .orderBy(asc("label"))
    }),

    // Modularity of the brand partition on the co-purchase part graph
    // (Newman–Girvan): per community c, the contribution
    // (m_c/m − (d_c/2m)²) — emitted exactly as
    // (4m·m_c − d_c²)·1e9 / 4m² nano units through the signed DECIMAL
    // shift div (one floor per community, never a float). A strongly
    // positive total says parts of a brand are co-bought together;
    // ≈0 says the brand partition explains nothing. The graph builds
    // once (the assortativity edge set); communities via one
    // broadcast join against part, then all arithmetic happens on the
    // |brands|-row frame.
    "q_modularity" -> ((s, dir) => {
      val e = copurchaseEdges(s, dir, minSupport = 2)
        .localCheckpoint(true) // m count, m_c agg, both degree legs
      val brands = part(s, dir)
        .select(col("p_partkey").as("node"), col("p_brand").as("community"))
      val m = e.agg(count(lit(1)).as("m"))
      val withB = e
        .join(broadcast(brands.select(col("node").as("src"),
          col("community").as("cs"))), Seq("src"))
        .join(broadcast(brands.select(col("node").as("dst"),
          col("community").as("cd"))), Seq("dst"))
        .localCheckpoint(true) // internal-edge agg + endpoint agg
      val mc = withB.where(col("cs") === col("cd"))
        .groupBy(col("cs").as("community")).agg(count(lit(1)).as("m_c"))
      val dc = withB.select(col("cs").as("community"))
        .unionAll(withB.select(col("cd").as("community")))
        .groupBy(col("community")).agg(count(lit(1)).as("d_c"))
      dc.join(mc, Seq("community"), "full_outer")
        .na.fill(0L, Seq("m_c", "d_c"))
        .crossJoin(broadcast(m))
        .select(col("community"), col("m_c"), col("d_c"), expr(
          """CAST(((CAST(4 AS DECIMAL(38,0)) * m * m_c - CAST(d_c AS DECIMAL(38,0)) * d_c)
            |    * 1000000000
            |  + CAST(100000000000 AS DECIMAL(38,0))
            |    * (CAST(4 AS DECIMAL(38,0)) * m * m))
            | div (CAST(4 AS DECIMAL(38,0)) * m * m)
            | - 100000000000 AS BIGINT)""".stripMargin).as("contrib_nano"))
        .orderBy(asc("community"))
    }))

  /** Shared with [[Analytics]]: the co-purchase part graph. */
  private def copurchaseEdges(s: SparkSession, dir: String,
      minSupport: Long): DataFrame = {
    val li = lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.as("x")
      .join(li.as("y"), col("x.ok") === col("y.ok") &&
        col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("src"), col("y.pk").as("dst"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= minSupport)
      .select(col("src"), col("dst"))
  }

  def oracle: Map[String, String] = Map(
    "q_acf" ->
      """WITH daily AS (
        |  SELECT event_type, ts::DATE AS d, count(*)::BIGINT AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, count(*)::BIGINT AS nd, sum(x)::BIGINT AS sx
        |  FROM daily GROUP BY 1),
        |dev AS (
        |  SELECT daily.event_type, d, (nd * x - sx)::BIGINT AS e
        |  FROM daily JOIN st USING (event_type)),
        |den AS (
        |  SELECT event_type, sum(e * e)::BIGINT AS den
        |  FROM dev GROUP BY 1),
        |num AS (
        |  SELECT a.event_type, l.lag, count(*)::BIGINT AS n_pairs,
        |    sum(a.e * b.e)::BIGINT AS num
        |  FROM dev a
        |  CROSS JOIN (VALUES (1), (2), (3), (7)) l(lag)
        |  JOIN dev b ON b.event_type = a.event_type AND b.d = a.d + l.lag
        |  GROUP BY 1, 2)
        |SELECT num.event_type, lag, n_pairs,
        |  ((num::HUGEINT * 1000 + 10000000::HUGEINT * den)
        |   // den::HUGEINT - 10000000)::BIGINT AS acf_milli
        |FROM num JOIN den USING (event_type)
        |WHERE den > 0
        |ORDER BY event_type, lag""".stripMargin,
    "q_fd_audit" ->
      """WITH cand AS (
        |  SELECT 'customer.c_custkey->c_nationkey' AS fd,
        |    c_custkey::VARCHAR AS l, c_nationkey::VARCHAR AS r
        |  FROM customer
        |  UNION ALL
        |  SELECT 'customer.c_nationkey->c_mktsegment',
        |    c_nationkey::VARCHAR, c_mktsegment FROM customer
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->l_suppkey',
        |    l_partkey::VARCHAR, l_suppkey::VARCHAR FROM lineitem
        |  UNION ALL
        |  SELECT 'part.p_brand->p_type', p_brand, p_type FROM part
        |  UNION ALL
        |  SELECT 'part.p_name->p_brand', p_name, p_brand FROM part
        |  UNION ALL
        |  SELECT 'part.p_type->p_size', p_type, p_size::VARCHAR FROM part),
        |lv1 AS (
        |  SELECT fd, l, r, count(*)::BIGINT AS c
        |  FROM cand GROUP BY 1, 2, 3),
        |lv2 AS (
        |  SELECT fd, l, sum(c)::BIGINT AS n, count(*)::BIGINT AS k,
        |    max(c)::BIGINT AS mx
        |  FROM lv1 GROUP BY 1, 2)
        |SELECT fd, count(*)::BIGINT AS n_groups,
        |  sum(CASE WHEN k > 1 THEN 1 ELSE 0 END)::BIGINT AS viol_groups,
        |  (sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) * 10000
        |   // count(*))::BIGINT AS viol_bp,
        |  sum(n)::BIGINT AS n_rows,
        |  sum(n - mx)::BIGINT AS g3,
        |  (sum(n - mx) * 10000 // sum(n))::BIGINT AS g3_bp
        |FROM lv2 GROUP BY fd ORDER BY fd""".stripMargin,
    "q_weight_ess" ->
      """WITH w AS (
        |  SELECT floor(o_totalprice * 100)::BIGINT AS w FROM orders),
        |a AS (
        |  SELECT count(*)::BIGINT AS n, sum(w)::BIGINT AS s,
        |    sum(w * w)::HUGEINT AS ss, max(w)::BIGINT AS mx
        |  FROM w)
        |SELECT n, s AS sum_w,
        |  (s::HUGEINT * s * 1000 // ss)::BIGINT AS ess_milli,
        |  (s::HUGEINT * s * 10000 // (ss * n))::BIGINT AS ess_ratio_bp,
        |  (mx * 10000 // s)::BIGINT AS max_share_bp,
        |  ((n::HUGEINT * ss * 1000) // (s::HUGEINT * s) - 1000)::BIGINT
        |    AS relvar_milli
        |FROM a""".stripMargin,
    "q_silhouette" ->
      """WITH u AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
        |    CAST(floor(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS vm
        |  FROM embeddings),
        |g AS (
        |  SELECT label AS clabel, pos, sum(vm)::BIGINT AS sm,
        |    count(*)::BIGINT AS cn
        |  FROM u GROUP BY 1, 2),
        |cent AS (
        |  SELECT clabel, pos,
        |    ((sm + cn * 10000000) // cn - 10000000)::BIGINT AS cm
        |  FROM g),
        |d AS (
        |  SELECT u.vec_id, u.label, cent.clabel,
        |    sum((vm - cm) * (vm - cm))::BIGINT AS d2
        |  FROM u JOIN cent ON cent.pos = u.pos
        |  GROUP BY 1, 2, 3),
        |ab AS (
        |  SELECT vec_id, label,
        |    max(CASE WHEN clabel = label THEN d2 END)::BIGINT AS a,
        |    min(CASE WHEN clabel <> label THEN d2 END)::BIGINT AS b
        |  FROM d GROUP BY 1, 2),
        |sv AS (
        |  SELECT label,
        |    (((b - a) * 1000 + 10000000 * greatest(a, b))
        |     // greatest(a, b) - 10000000)::BIGINT AS sv
        |  FROM ab WHERE greatest(a, b) > 0)
        |SELECT label, count(*)::BIGINT AS n_vecs,
        |  ((sum(sv) + count(*) * 10000000) // count(*) - 10000000)::BIGINT
        |    AS mean_s_milli
        |FROM sv GROUP BY label ORDER BY label""".stripMargin,
    "q_modularity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (SELECT x.pk AS src, y.pk AS dst
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |m AS (SELECT count(*)::BIGINT AS m FROM e),
        |wb AS (
        |  SELECT e.src, e.dst, ps.p_brand AS cs, pd.p_brand AS cd
        |  FROM e JOIN part ps ON ps.p_partkey = e.src
        |  JOIN part pd ON pd.p_partkey = e.dst),
        |mc AS (
        |  SELECT cs AS community, count(*)::BIGINT AS m_c
        |  FROM wb WHERE cs = cd GROUP BY 1),
        |dc AS (
        |  SELECT community, count(*)::BIGINT AS d_c FROM (
        |    SELECT cs AS community FROM wb
        |    UNION ALL SELECT cd FROM wb)
        |  GROUP BY 1)
        |SELECT coalesce(dc.community, mc.community) AS community,
        |  coalesce(m_c, 0)::BIGINT AS m_c,
        |  coalesce(d_c, 0)::BIGINT AS d_c,
        |  (((4::HUGEINT * m.m * coalesce(m_c, 0)
        |     - coalesce(d_c, 0)::HUGEINT * coalesce(d_c, 0)) * 1000000000
        |    + 100000000000::HUGEINT * (4::HUGEINT * m.m * m.m))
        |   // (4::HUGEINT * m.m * m.m) - 100000000000)::BIGINT
        |    AS contrib_nano
        |FROM dc FULL OUTER JOIN mc ON mc.community = dc.community
        |CROSS JOIN m
        |ORDER BY community""".stripMargin)
}
