package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight data-quality observation via Spark's `Dataset.observe` —
  * the metrics ride the SAME job that materializes the frame (an
  * accumulator-backed aggregate evaluated as rows stream past), so a
  * pipeline stage reports row counts, null rates, and
  * contract-violation counts with ZERO additional scans. At 100 TB
  * that is the difference between "quality checks doubled the read
  * bill" and free telemetry on every write.
  *
  * Contrast with `ops.DqChecks`-style assertion queries (q_dq_checks):
  * those are standalone audits with their own plan; this instruments
  * an EXISTING flow. Works identically on streaming frames (each
  * micro-batch's metrics arrive in `QueryProgressEvent
  * .observedMetrics`), since `observe` is a CollectMetrics node, not
  * an action.
  */
object Observe {

  /** Attach quality metrics to `df` under `name`:
    *   rows            — rows that flowed through
    *   null_keys       — rows with ANY null among `keyCols`
    *   violations      — rows where `violation` is true
    * Returns the instrumented frame and the [[Observation]] handle;
    * read `obs.get` AFTER an action has materialized the frame. */
  def quality(df: DataFrame, name: String, keyCols: Seq[String],
      violation: Column): (DataFrame, Observation) = {
    val obs = Observation(name)
    val nullKey = keyCols.map(col(_).isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    val instrumented = df.observe(obs,
      count(lit(1)).as("rows"),
      sum(when(nullKey, 1L).otherwise(0L)).as("null_keys"),
      sum(when(violation, 1L).otherwise(0L)).as("violations"))
    (instrumented, obs)
  }
}
