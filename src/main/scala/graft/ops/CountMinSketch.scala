package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications",
  * J. Algorithms 2005) as a typed `Aggregator` — the mergeable
  * POINT-FREQUENCY summary that completes the sketch-column family:
  * HLL answers "how many distinct" ([[SketchRollup]]), Space-Saving
  * answers "which items are heavy" ([[HeavyHitters]]), KLL answers
  * "what is p99" ([[QuantileSketch]]); CMS answers "about how often
  * does THIS item occur" for arbitrary items fixed after the fact —
  * the query Space-Saving cannot serve (it only tracks its retained
  * top-m) without re-scanning the corpus.
  *
  * Structure: d hash rows × w counters; an item adds 1 to one counter
  * per row (index = hash_i(item) mod w); the estimate is the MINIMUM
  * over its d counters. Guarantees (one-sided): estimate ≥ true
  * count always, and estimate ≤ true + εN with probability ≥ 1−δ for
  * ε = e/w, δ = e^−d. Merge = elementwise counter sum — exact, order-
  * independent, associative: grain sketches roll up like the other
  * three.
  *
  * Hashing: ONE md5 per item; hash row i parses hex chars
  * [6i, 6i+6) of the digest (24 independent bits per row, d ≤ 5)
  * mod w — deterministic across JVMs and partitionings, so unlike
  * the HLL/KLL estimates a CMS sketch is BIT-IDENTICAL for any
  * partitioning of the same multiset (counter sums commute exactly).
  * The md5-substring rows are also SQL-replayable —
  * `('0x' || substring(md5(t), 1+6*i, 6))::INT % w` reproduces every
  * counter AND every probe estimate in DuckDB, which is what lets
  * q_cms_freq run as a hash-exact oracle query rather than rows-only
  * (use power-of-2 w ≤ 2^24: 2^24 mod w = 0, so the fold is
  * bias-free).
  */
object CountMinSketch {

  /** Encoder-visible persistable form (public — the private-case-
    * class codegen trap): flattened row-major counters. */
  final case class CmsData(d: Int, w: Int, n: Long, counters: Seq[Long])

  final class Sketch(val d: Int, val w: Int) extends Serializable {
    require(d <= 5, s"md5-substring rows support d <= 5, got $d")
    var n: Long = 0L
    val counters: Array[Long] = new Array[Long](d * w)

    @transient private lazy val md5 =
      java.security.MessageDigest.getInstance("MD5")

    /** All d buckets from ONE digest: row i = hex[6i, 6i+6) mod w
      * (see class doc — SQL-replayable by construction). */
    private def buckets(item: String): Array[Int] = {
      val dig = md5.digest(item.getBytes("UTF-8"))
      Array.tabulate(d) { i =>
        // hex chars [6i, 6i+6) = 24 bits from byte offset 3i
        val v = ((dig(3 * i) & 0xff) << 16) |
          ((dig(3 * i + 1) & 0xff) << 8) | (dig(3 * i + 2) & 0xff)
        v % w
      }
    }

    def add(item: String, count: Long = 1L): Sketch = {
      val bs = buckets(item)
      var i = 0
      while (i < d) {
        counters(i * w + bs(i)) += count
        i += 1
      }
      n += count
      this
    }

    def estimate(item: String): Long = {
      if (d == 0) return 0L
      val bs = buckets(item)
      var best = Long.MaxValue
      var i = 0
      while (i < d) {
        val c = counters(i * w + bs(i))
        if (c < best) best = c
        i += 1
      }
      if (best == Long.MaxValue) 0L else best
    }

    /** Elementwise sum — exact merge. Adopts the other's shape when
      * this sketch is the empty zero (w == 0). */
    def mergeWith(o: Sketch): Sketch = {
      if (o.w == 0) return this
      if (w == 0) return o.mergeWith(this)
      require(d == o.d && w == o.w, s"shape mismatch: ${d}x$w vs ${o.d}x${o.w}")
      var i = 0
      while (i < counters.length) { counters(i) += o.counters(i); i += 1 }
      n += o.n
      this
    }
  }

  /** CM inner-product estimate of Σ_k cA(k)·cB(k) — the equi-join
    * cardinality of the two sketched key multisets (Cormode &
    * Muthukrishnan 2005 §4.2): per hash row the counter dot product
    * over-counts only by colliding key pairs, so the MINIMUM over
    * rows is always ≥ the true join size and ≤ true + (e/w)·nA·nB
    * with probability ≥ 1 − e^−d. Exact when no row has a cross-key
    * collision. */
  def innerProduct(a: Sketch, b: Sketch): Long = {
    require(a.d == b.d && a.w == b.w,
      s"shape mismatch: ${a.d}x${a.w} vs ${b.d}x${b.w}")
    var best = Long.MaxValue
    var i = 0
    while (i < a.d) {
      var s = 0L
      var j = 0
      while (j < a.w) {
        s += a.counters(i * a.w + j) * b.counters(i * a.w + j)
        j += 1
      }
      if (s < best) best = s
      i += 1
    }
    if (best == Long.MaxValue) 0L else best
  }

  def toData(s: Sketch): CmsData = CmsData(s.d, s.w, s.n, s.counters.toSeq)

  def fromData(x: CmsData): Sketch = {
    val s = new Sketch(x.d, x.w)
    s.n = x.n
    x.counters.copyToArray(s.counters)
    s
  }

  private def buildAgg(d: Int, w: Int): Aggregator[String, Sketch, CmsData] =
    new Aggregator[String, Sketch, CmsData] {
      def zero: Sketch = new Sketch(d, w)
      def reduce(b: Sketch, a: String): Sketch =
        if (a == null) b else b.add(a)
      def merge(a: Sketch, b: Sketch): Sketch = a.mergeWith(b)
      def finish(r: Sketch): CmsData = toData(r)
      def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
      def outputEncoder: Encoder[CmsData] = Encoders.product[CmsData]
    }

  private def mergeAgg(probes: Seq[String])
      : Aggregator[CmsData, Sketch, Seq[Long]] =
    new Aggregator[CmsData, Sketch, Seq[Long]] {
      def zero: Sketch = new Sketch(0, 0) // adopts shape on first merge
      def reduce(b: Sketch, a: CmsData): Sketch = b.mergeWith(fromData(a))
      def merge(a: Sketch, b: Sketch): Sketch = a.mergeWith(b)
      def finish(r: Sketch): Seq[Long] = probes.map(r.estimate)
      def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** Aggregate a string column into one CMS struct per group.
    * Defaults: d=5 (δ≈0.7%), w=2048 (ε≈0.13% of N). */
  def sketch(c: Column, d: Int = 5, w: Int = 2048): Column =
    udaf(buildAgg(d, w), Encoders.STRING)(c.cast("string"))

  /** One CMS per group: (groupCols..., sketch STRUCT). */
  def sketches(df: DataFrame, groupCols: Seq[String], itemCol: String,
      d: Int = 5, w: Int = 2048): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(sketch(col(itemCol), d, w).as("cms"))

  /** Merge sketch rows (optionally pre-filtered) per residual group
    * and answer the probe items: output one `est_<i>` column per
    * probe plus the merged total n. */
  def rollup(sketchDf: DataFrame, residualCols: Seq[String],
      probes: Seq[String]): DataFrame = {
    val m = udaf(mergeAgg(probes), Encoders.product[CmsData])
    // udaf over a struct column flattens to one param per field
    val applied = m(col("cms.d"), col("cms.w"), col("cms.n"),
      col("cms.counters")).as("ests")
    val grouped =
      if (residualCols.isEmpty) sketchDf.agg(applied)
      else sketchDf.groupBy(residualCols.map(col): _*).agg(applied)
    probes.zipWithIndex.foldLeft(grouped) { case (df, (p, i)) =>
      df.withColumn(s"est_${i + 1}", element_at(col("ests"), i + 1))
    }.drop("ests")
  }
}
