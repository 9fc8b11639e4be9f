package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query implementations live in graft.queries.*; each module maps one
  * slice of SURVEY.md §2's operator inventory (plus the pipeline
  * extensions) onto the testdata tables, with DuckDB oracles where the
  * semantics are SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_totals")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queries_.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] = queries_.oracle

  private object queries_ {
    import graft.queries._
    val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
      Seq(
        (Relational.queries, Relational.oracle),
        (Events.queries, Events.oracle),
        (Pipeline.queries, Pipeline.oracle),
        (Extended.queries, Extended.oracle),
        (Analytics.queries, Analytics.oracle),
        (Diagnostics.queries, Diagnostics.oracle))
    val queries: Map[String, (SparkSession, String) => DataFrame] =
      modules.map(_._1).reduce(_ ++ _)
    val oracle: Map[String, String] = modules.map(_._2).reduce(_ ++ _)
  }
}
