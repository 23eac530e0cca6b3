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

  /** Bench-only drives: operators whose production cost has no registered
    * query row shaped like it (the register keeps oracle-checkable forms;
    * these time the full-scale form). Timed by graft.Bench alongside
    * [[benchQueries]]; NOT part of the correctness register. Names are
    * prefixed x_ so a bench reader can't mistake them for q-rows. */
  def benchExtras: Map[String, (SparkSession, String) => Unit] = Map(
    // q102's registered row proves ONE merge against the oracle; the
    // production cost is the full multi-merge train loop (30 rounds over
    // the vocab-sized word table).
    "x_bpe_train30" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val merges = graft.operators.Bpe.train(docs, numMerges = 30)
      require(merges.nonEmpty)
    })
  )
}
