package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated by any other
  * row, maximizing an integer band column and minimizing a value
  * column. Dominance: `a` dominates `b` iff `a.band >= b.band` and
  * `a.value <= b.value` with at least one strict; ties on both axes
  * are mutually non-dominating and all survive.
  *
  * Scale shape (the reason this is an operator and not a NOT EXISTS
  * anti-join): the naive form is a quadratic broadcast-nested-loop
  * self-join, and the window form (`min(value) OVER (ORDER BY band
  * DESC)`) is a single-reducer global sort. Instead the frontier is
  * fully determined by the per-band minimum value — one map-side
  * partial aggregate to `|distinct bands|` rows, a bounded driver
  * collect, a suffix-min sweep over bands descending, and ONE
  * filter pass over the corpus against two literal maps. Zero joins,
  * zero windows, corpus scanned once.
  *
  * Contract: `bandCol` must be integral with bounded cardinality
  * (band/bucket/grade-like — the collect is one row per distinct
  * value); rows with a null band or value are not frontier
  * candidates and are dropped.
  */
object Skyline {

  /** Hard cap on distinct bands: the per-band frontier rides to the
    * driver and back as two literal maps, so a miscall on a
    * high-cardinality column (a raw price as band) must fail loudly,
    * not OOM the driver. 100k long->double entries ≈ a few MB. */
  val MaxBands: Int = 100000

  def frontier2D(df: DataFrame, bandCol: String, valCol: String): DataFrame = {
    val in = df.where(col(bandCol).isNotNull && col(valCol).isNotNull)
    val bandRows = in
      .groupBy(col(bandCol).cast("long").as("_band"))
      .agg(min(col(valCol).cast("double")).as("_min_v"))
      .limit(MaxBands + 1)
      .collect()
    require(bandRows.length <= MaxBands,
      s"Skyline.frontier2D: band column '$bandCol' has more than " +
        s"$MaxBands distinct values — the per-band frontier is collected " +
        "to the driver, so the band must be a bounded-cardinality " +
        "dimension (bucket or coarsen it first)")
    val bands = bandRows
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(-_._1)
    // Suffix-min over strictly larger bands: walking bands descending,
    // the running min BEFORE including a band is exactly
    // min(value | band' > band).
    var run = Double.PositiveInfinity
    val strictlyLarger = Map.newBuilder[Long, Double]
    val sameBand = Map.newBuilder[Long, Double]
    bands.foreach { case (b, v) =>
      if (run != Double.PositiveInfinity) strictlyLarger += (b -> run)
      sameBand += (b -> v)
      if (v < run) run = v
    }
    val sl = typedLit(strictlyLarger.result())
    val sm = typedLit(sameBand.result())
    val bandKey = col(bandCol).cast("long")
    // Not dominated iff (no strictly larger band reaches this value)
    // and (this row holds its band's minimum — equal-value ties all
    // qualify, matching the strict-in-one dominance rule).
    in.where(
      col(valCol).cast("double") === try_element_at(sm, bandKey) &&
        (try_element_at(sl, bandKey).isNull ||
          col(valCol).cast("double") < try_element_at(sl, bandKey)))
  }
}
