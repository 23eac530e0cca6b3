package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* modules; this object aggregates them. */
object SparkEntry {

  private def modules: Seq[Q] =
    Relational.all ++ PipelineQueries.all ++ CpcInline.all ++ Advanced.all ++
      SqlSurface.all ++ WebIngest.all

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
    }),
    // BucketingSpec proves the exchange-free join at fixture scale; this
    // times it at bench scale. The UNTIMED warmup pass builds the bucketed
    // orders/lineitem pair (session-catalog check: tables are built once
    // per JVM), so the measured samples time ONLY the co-located join —
    // the repeated-fact-join shape bucketing exists for at 100 TB. The
    // plan is asserted exchange-free on the join keys every run, so a
    // regression to a shuffling plan fails the bench rather than quietly
    // timing a different query.
    "x_bucketed_join" -> ((s, dir) => {
      val db = "graft_bench_bucketed"
      if (!s.catalog.databaseExists(db)) {
        // the session catalog is in-memory per JVM but the warehouse dir is
        // not: a killed prior run leaves orphan table locations that make
        // saveAsTable refuse (LOCATION_ALREADY_EXISTS). Clear them first.
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), s"$db.db")
        wh.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wh, true)
        s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
        s.read.parquet(s"$dir/orders.parquet")
          .write.mode("overwrite").bucketBy(32, "o_orderkey")
          .sortBy("o_orderkey").saveAsTable(s"$db.orders_b")
        s.read.parquet(s"$dir/lineitem.parquet")
          .write.mode("overwrite").bucketBy(32, "l_orderkey")
          .sortBy("l_orderkey").saveAsTable(s"$db.lineitem_b")
      }
      val j = s.table(s"$db.orders_b")
        .join(s.table(s"$db.lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      j.write.mode("overwrite").format("noop").save()
      val plan = j.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        "bucketed join must not shuffle its join keys")
    })
  )
}
