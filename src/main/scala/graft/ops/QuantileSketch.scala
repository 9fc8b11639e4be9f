package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KLL quantile sketch (Karnin, Lang, Liberty, "Optimal quantile
  * approximation in streams", FOCS 2016) as a typed Spark
  * `Aggregator` — the MERGEABLE quantile summary that completes the
  * materialized-sketch-column trio next to HLL distincts
  * ([[SketchRollup]]) and Space-Saving heavy hitters
  * ([[HeavyHitters]]): aggregate each grain (day) once into a
  * constant-size sketch row, persist the tiny sketch table, and
  * answer "p99 of latency over ANY date range" by merging the
  * matching sketch rows — kilobytes, no rescan. The exact profiler
  * (ops/Profile) answers one-shot exact quantiles with a full
  * distributed sort; this is the amortized path when the same column
  * is asked again and again over sliding ranges.
  *
  * Structure: geometrically-capacitied level buffers; level i items
  * carry weight 2^i. A full level sorts and promotes alternate items
  * to level i+1 (each promoted item now represents two). Weight is
  * conserved exactly: an odd buffer retains its maximum at the
  * current level and compacts the even remainder, so the total
  * represented weight always equals n and rank queries never drift.
  * Rank error after compaction is bounded by the classic KLL
  * analysis at O(1/k) with k the top-level capacity; the spec
  * measures ≤ 2% rank error at k=200 on 50k adversarially-ordered
  * values, and the Verify gate re-checks against the exact profiler
  * on real data.
  *
  * Determinism: KLL's random compaction coin is replaced by an
  * alternating parity counter, so a FIXED plan and partitioning
  * reproduces bit-identical sketches; like the HLL rollup, estimates
  * across DIFFERENT partitionings agree only within sketch error —
  * treat them as ±ε, never as stable keys.
  */
object QuantileSketch {

  // Encoder-visible (public — the private-case-class codegen trap)
  // persistable sketch form: one struct column per grain row.
  final case class LevelData(level: Int, values: Seq[Double])
  final case class KllData(k: Int, n: Long, compactions: Long,
      lo: Double, hi: Double, levels: Seq[LevelData])

  final class Sketch(var k: Int) extends Serializable {
    var n: Long = 0L
    var compactions: Long = 0L
    // exact stream extremes, tracked outside the compaction (the
    // selection rule can drop the true max/min from the buffers —
    // standard KLL implementations carry them explicitly)
    var lo: Double = Double.PositiveInfinity
    var hi: Double = Double.NegativeInfinity
    val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])

    // level capacities shrink from the top by 2/3 per step (KLL §2);
    // the floor of 2 keeps low levels meaningful at small k
    private def capOf(i: Int): Int = {
      val depth = levels.length - 1 - i
      math.max(2, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)
    }
    private def budget: Int = levels.indices.map(capOf).sum
    private def size: Int = levels.iterator.map(_.length).sum

    def add(x: Double): Sketch = {
      levels(0) += x
      n += 1
      if (x < lo) lo = x
      if (x > hi) hi = x
      if (size > budget) compress()
      this
    }

    private def compress(): Unit = {
      val i = levels.indices.find(j => levels(j).length > capOf(j)).getOrElse(0)
      val sorted = levels(i).sorted
      // odd buffer: retain the max at this level, compact the even rest
      val (toCompact, retain) =
        if (sorted.length % 2 == 0) (sorted, Nil)
        else (sorted.init, List(sorted.last))
      val offset = (compactions & 1L).toInt // deterministic alternating coin
      compactions += 1
      val promoted = offset until toCompact.length by 2 map toCompact
      levels(i) = levels(i).take(0)
      levels(i) ++= retain
      if (i + 1 == levels.length) levels += mutable.ArrayBuffer.empty[Double]
      levels(i + 1) ++= promoted
    }

    def mergeWith(o: Sketch): Sketch = {
      if (k == 0) k = o.k
      n += o.n
      compactions += o.compactions
      if (o.lo < lo) lo = o.lo
      if (o.hi > hi) hi = o.hi
      while (levels.length < o.levels.length)
        levels += mutable.ArrayBuffer.empty[Double]
      for (i <- o.levels.indices) levels(i) ++= o.levels(i)
      while (size > budget) compress()
      this
    }

    /** Empirical CDF at `v`: the weight fraction of items ≤ v. */
    def rankOf(v: Double): Double = {
      if (n == 0) return 0.0
      var cum = 0L
      var total = 0L
      for (i <- levels.indices; x <- levels(i)) {
        val w = 1L << i
        total += w
        if (x <= v) cum += w
      }
      cum.toDouble / total
    }

    /** Rank-nearest quantiles: smallest item whose cumulative weight
      * reaches ⌈q·n⌉ over the weight-sorted item multiset. */
    def quantiles(probs: Seq[Double]): Seq[Double] = {
      if (n == 0) return probs.map(_ => Double.NaN)
      val items = (for {
        i <- levels.indices.iterator
        v <- levels(i).iterator
      } yield (v, 1L << i)).toArray.sortBy(_._1)
      val total = items.iterator.map(_._2).sum
      probs.map { q =>
        val target = math.max(1L, math.ceil(q * total).toLong)
        var cum = 0L
        var ans = items.last._1
        val it = items.iterator
        var found = false
        while (it.hasNext && !found) {
          val (v, w) = it.next(); cum += w
          if (cum >= target) { ans = v; found = true }
        }
        // the exact extremes bound every true quantile; p=1 IS the
        // max, and symmetrically rank 1 (q ≤ 1/n) IS the tracked min
        // — the smallest RETAINED item can sit above the true min by
        // the rank error, but `lo` is exact.
        if (target >= total) hi
        else if (target <= 1L) lo
        else math.min(math.max(ans, lo), hi)
      }
    }
  }

  def toData(s: Sketch): KllData =
    KllData(s.k, s.n, s.compactions, s.lo, s.hi,
      s.levels.iterator.zipWithIndex.collect {
        case (l, i) if l.nonEmpty => LevelData(i, l.toSeq)
      }.toSeq)

  def fromData(d: KllData): Sketch = {
    val s = new Sketch(d.k)
    s.n = d.n
    s.compactions = d.compactions
    s.lo = d.lo
    s.hi = d.hi
    val maxLevel = if (d.levels.isEmpty) 0 else d.levels.map(_.level).max
    while (s.levels.length <= maxLevel)
      s.levels += mutable.ArrayBuffer.empty[Double]
    d.levels.foreach(l => s.levels(l.level) ++= l.values)
    s
  }

  private def buildAgg(k: Int): Aggregator[Double, Sketch, KllData] =
    new Aggregator[Double, Sketch, KllData] {
      def zero: Sketch = new Sketch(k)
      def reduce(b: Sketch, a: Double): Sketch = b.add(a)
      def merge(a: Sketch, b: Sketch): Sketch = a.mergeWith(b)
      def finish(r: Sketch): KllData = toData(r)
      def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
      def outputEncoder: Encoder[KllData] = Encoders.product[KllData]
    }

  private def mergeAgg(probs: Seq[Double]): Aggregator[KllData, Sketch, Seq[Double]] =
    new Aggregator[KllData, Sketch, Seq[Double]] {
      def zero: Sketch = new Sketch(0) // adopts k from the first input
      def reduce(b: Sketch, a: KllData): Sketch = b.mergeWith(fromData(a))
      def merge(a: Sketch, b: Sketch): Sketch = a.mergeWith(b)
      def finish(r: Sketch): Seq[Double] = r.quantiles(probs)
      def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** One KLL sketch per group: what the shuffle carries is a bounded
    * sketch per (group, partition), never the values. */
  def sketch(c: Column, k: Int = 200): Column =
    udaf(buildAgg(k), Encoders.scalaDouble)(c.cast("double"))

  /** Grid-Kolmogorov-Smirnov distance between two sketches: the max
    * CDF gap evaluated over both sketches' stored support points (the
    * finest grid either sketch can distinguish). Within each sketch's
    * rank error of the true KS statistic. */
  def ksDistance(a: KllData, b: KllData): Double = {
    val sa = fromData(a)
    val sb = fromData(b)
    if (sa.n == 0 || sb.n == 0) return if (sa.n == sb.n) 0.0 else 1.0
    val grid = (a.levels.flatMap(_.values) ++ b.levels.flatMap(_.values)).distinct
    grid.iterator.map(v => math.abs(sa.rankOf(v) - sb.rankOf(v))).max
  }

  /** Distribution-drift monitor — the data-quality check a long-lived
    * ingest pipeline runs on every batch: does today's metric
    * distribution still look like the reference cohort's? Each cohort
    * aggregates to ONE sketch row per group (what moves is sketches,
    * never values); the drift statistic is [[ksDistance]] computed in
    * a typed map over the joined sketch rows — one row per group end
    * to end, no collect. Output: group columns + `ks_bp` (basis
    * points, 0–10000). Gate on e.g. ks_bp > 500 to quarantine a
    * batch. */
  def drift(cohortA: DataFrame, cohortB: DataFrame, valueCol: String,
      groupCols: Seq[String], k: Int = 200): DataFrame = {
    import org.apache.spark.sql.Row
    def sk(df: DataFrame, name: String): DataFrame =
      df.groupBy(groupCols.map(col): _*)
        .agg(sketch(col(valueCol), k).as(name))
    // FULL OUTER, deliberately: a group present in one cohort and
    // absent from the other is the strongest drift signal a quality
    // gate can surface — an inner join would silently drop exactly
    // those groups (ksDistance's n==0 → 1.0 branch is unreachable
    // through sketch rows, since an empty group produces no row).
    // Spark coalesces the using-columns for full_outer, so the group
    // keys survive whichever side is missing. Missing side → KS = 1
    // (every distribution is maximally far from "no data").
    val joined = sk(cohortA, "sk_a").join(sk(cohortB, "sk_b"), groupCols,
      "full_outer")
    val enc = Encoders.row(org.apache.spark.sql.types.StructType(
      joined.schema.fields.filter(f => groupCols.contains(f.name)) :+
        org.apache.spark.sql.types.StructField("ks_bp",
          org.apache.spark.sql.types.LongType, nullable = false)))
    joined.map { r =>
      val ia = r.fieldIndex("sk_a")
      val ib = r.fieldIndex("sk_b")
      val ks =
        if (r.isNullAt(ia) || r.isNullAt(ib)) 1.0
        else ksDistance(kllOfRow(r.getStruct(ia)), kllOfRow(r.getStruct(ib)))
      Row.fromSeq(groupCols.map(c => r.get(r.fieldIndex(c))) :+
        math.floor(ks * 10000).toLong)
    }(enc)
  }

  /** ORACLE-EXACT grid twin of [[drift]]: exact Kolmogorov–Smirnov
    * distance between the two cohorts' distributions QUANTIZED to a
    * declared bounded grid — values floor once to integer cents, then
    * map onto `nBins` equi-width bins over the global [lo, hi]; the
    * binned empirical CDFs are exact integer counts, and the KS gap is
    * the max integer cross-multiplied difference (never a float
    * quotient), released in basis points via DECIMAL(38,0) floor-div.
    * The drift DECISION this feeds is therefore engine-replayable even
    * though the KLL sketch itself is not.
    *
    * Scale shape: one global min/max broadcast, one (group, bin) hash
    * aggregate, then a cumulative window over AT MOST `nBins` rows per
    * group — bounded by the declared grid, not the data (the
    * legitimate bounded-frame window class, unlike an unbounded
    * low-cardinality window). Missing-side groups surface with
    * ks_bp = 10000 (the [[drift]] full-outer contract). */
  def driftGrid(cohortA: DataFrame, cohortB: DataFrame, valueCol: String,
      groupCols: Seq[String], nBins: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // internal columns carry a __ prefix so no caller group column
    // (e.g. a column literally named "g" or "v") can collide
    val gCols = groupCols.map(col)
    def prep(df: DataFrame, aFlag: Int) =
      df.select(gCols :+
        floor(col(valueCol).cast("double") * 100).cast("long").as("__v") :+
        lit(aFlag.toLong).as("__isa"): _*)
    val all = prep(cohortA, 1).unionByName(prep(cohortB, 0))
    val mm = all.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val cells = all.crossJoin(broadcast(mm))
      .withColumn("__bin",
        expr(s"(__v - __lo) * ${nBins - 1}L div greatest(__hi - __lo, 1L)"))
      .groupBy(gCols :+ col("__bin"): _*)
      .agg(sum(col("__isa")).as("__na"),
        sum(lit(1L) - col("__isa")).as("__nb"))
    val w = Window.partitionBy(gCols: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("__ca", sum(col("__na")).over(w))
      .withColumn("__cb", sum(col("__nb")).over(w))
    val tot = cells.groupBy(gCols: _*)
      .agg(sum(col("__na")).as("n_a"), sum(col("__nb")).as("n_b"))
    cum.join(tot, groupCols)
      .groupBy(gCols: _*)
      .agg(max(abs(col("__ca") * col("n_b") - col("__cb") * col("n_a")))
          .as("__gap"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .select(gCols :+ col("n_a") :+ col("n_b") :+
        when(col("n_a") === 0 || col("n_b") === 0, lit(10000L))
          .otherwise(expr(
            """CAST(CAST(__gap AS DECIMAL(38,0)) * 10000
              |  div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""
              .stripMargin)).as("ks_bp"): _*)
  }

  /** ORACLE-EXACT mergeable-quantile twin of the KLL [[rollup]]:
    * fixed-grid histogram grains. Values floor once to integer cents
    * and map onto `nBins` equi-width bins over the global span (the
    * [[driftGrid]] binning); a GRAIN is the ≤ `nBins`-row bin-count
    * frame — grains merge by SUMMING counts (exact integers, any
    * order), and a quantile reads off the merged CDF as the first bin
    * whose cumulative count reaches the ⌈p·n⌉ rank (p as an integer
    * rational, ceil via (num·n + den − 1) div den — no floats
    * anywhere). Released per prob: the bin index and its lower edge
    * in cents — deterministic declared semantics with value error
    * bounded by one bin width, rank error zero at bin granularity.
    * The KLL tier stays the unknown-range production path; this twin
    * is the known-span engine-replayable one.
    *
    * @return (grainCols..., bin, c) plus one (lo, hi, w-implied) pair
    *         carried on every row for the downstream quantile read. */
  def gridHistogram(df: DataFrame, grainCols: Seq[String],
      valueCol: String, nBins: Int = 4096): DataFrame = {
    val vals = df.select(grainCols.map(col) :+
      floor(col(valueCol).cast("double") * 100).cast("long").as("__v"): _*)
    val mm = vals.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    vals.crossJoin(broadcast(mm))
      .withColumn("bin",
        expr(s"(__v - __lo) * ${nBins - 1}L div greatest(__hi - __lo, 1L)"))
      .groupBy(grainCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("c"),
        max(col("__lo")).as("lo"), max(col("__hi")).as("hi"))
  }

  /** Merge histogram grains down to `residualCols` and release the
    * rank-exact grid quantiles for `probsBp` (basis points, e.g.
    * 5000 = p50): (residualCols..., p_bp, q_bin, q_value_cent). */
  def gridQuantileRollup(hist: DataFrame, residualCols: Seq[String],
      probsBp: Seq[Int], nBins: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rCols = residualCols.map(col)
    val merged = hist.groupBy(rCols :+ col("bin"): _*)
      .agg(sum(col("c")).as("c"), max(col("lo")).as("lo"),
        max(col("hi")).as("hi"))
    val w = Window.partitionBy(rCols: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged.withColumn("__cum", sum(col("c")).over(w))
    val tot =
      if (residualCols.isEmpty) cum.agg(sum(col("c")).as("__n"))
      else cum.groupBy(rCols: _*).agg(sum(col("c")).as("__n"))
    val joined =
      (if (residualCols.isEmpty) cum.crossJoin(broadcast(tot))
       else cum.join(tot, residualCols))
    probsBp.map { p =>
      // rank = ceil(p/10000 · n) in pure integers
      val withRank = joined.withColumn("__r",
        expr(s"($p * __n + 9999) div 10000"))
      val grouped =
        if (residualCols.isEmpty) withRank.groupBy()
        else withRank.groupBy(rCols: _*)
      grouped
        .agg(min(when(col("__cum") >= col("__r"), col("bin"))).as("q_bin"),
          max(col("lo")).as("__lo"), max(col("hi")).as("__hi"))
        .select(rCols :+ lit(p.toLong).as("p_bp") :+ col("q_bin") :+
          expr(s"__lo + q_bin * (__hi - __lo) div ${nBins - 1}L")
            .as("q_value_cent"): _*)
    }.reduce(_ unionByName _)
  }

  /** Rebuild a [[KllData]] from its struct-column Row form. */
  def kllOfRow(r: org.apache.spark.sql.Row): KllData = KllData(
    r.getInt(r.fieldIndex("k")), r.getLong(r.fieldIndex("n")),
    r.getLong(r.fieldIndex("compactions")),
    r.getDouble(r.fieldIndex("lo")), r.getDouble(r.fieldIndex("hi")),
    r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("levels")).map(l =>
      LevelData(l.getInt(0), l.getSeq[Double](1))))

  /** Merge persisted sketch rows (optionally pre-filtered to a range)
    * into quantile estimates per residual group. */
  def rollup(sketchDf: DataFrame, residualCols: Seq[String],
      probs: Seq[Double], sketchCol: String = "sketch"): DataFrame = {
    val u = udaf(mergeAgg(probs), Encoders.product[KllData])
    // a product input encoder flattens to one udaf parameter per
    // case-class field — pass the struct's fields, not the struct
    val est = u(col(s"$sketchCol.k"), col(s"$sketchCol.n"),
      col(s"$sketchCol.compactions"), col(s"$sketchCol.lo"),
      col(s"$sketchCol.hi"), col(s"$sketchCol.levels")).as("qs")
    val base =
      if (residualCols.isEmpty) sketchDf.agg(est)
      else sketchDf.groupBy(residualCols.map(col): _*).agg(est)
    // Column names in BASIS POINTS (p5000bp = median): percent-rounded
    // names collide for sub-percent tails (0.999 and 1.0 both → "p100")
    // and cannot express p99.9 at all.
    probs.zipWithIndex.foldLeft(base) { case (df, (p, i)) =>
      df.withColumn(s"p${math.round(p * 10000)}bp",
        element_at(col("qs"), i + 1))
    }.drop("qs")
  }
}
