package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* modules; this object aggregates them. */
object SparkEntry {

  private def modules: Seq[Q] =
    Relational.all ++ PipelineQueries.all ++ CpcInline.all ++ Advanced.all ++ SqlSurface.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the 6-table star join with broadcast dims (q05). */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (hash-function-dependent sketches) → driver records rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline queries timed by graft.Bench. */
  def benchQueries: Seq[String] = modules.filter(_.bench).map(_.name)
}
