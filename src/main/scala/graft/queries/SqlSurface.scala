package graft.queries

import graft.operators.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL entry path: queries that run as SQL TEXT through `spark.sql`, over
  * views created with SQL DDL, exercising the engine the way a SQL user
  * hits it — parser → analyzer (temp-view catalog lookups) → the injected
  * native functions (cosine_sim; see GraftExtensions for the session-build
  * route and VectorFunctions.register for the runtime route used here,
  * since the driver owns the session).
  *
  * Plus the typed-Aggregator surface (TopK) registered as an oracle-checked
  * query.
  */
object SqlSurface {

  /** SQL-DDL view over a parquet table (`CREATE OR REPLACE TEMP VIEW …
    * AS SELECT * FROM parquet.`…``) — the path a SQL-only user takes.
    * Filter/column pushdown still reaches the scan: a temp view is just a
    * named logical plan, so Catalyst sees straight through it. */
  private def viewsFor(s: SparkSession, d: String, names: String*): Unit =
    names.foreach { n =>
      val p = s"${d.stripSuffix("/")}/$n.parquet"
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW $n AS SELECT * FROM parquet.`$p`")
    }

  private val SqlTables = Seq("customer", "orders", "lineitem", "nation", "embeddings")

  /** Which data dir each session's views currently point at. A SQL user
    * runs DDL once per session, not once per query — re-running CREATE
    * VIEW per execution charged catalog writes + parquet footer/file
    * listing (~0.5 s warm at sf0.1) to every query. Re-registers only
    * when the dir changes or a view has gone missing. WEAK keys: a strong
    * SparkSession key would pin every stopped session (and its
    * SessionState) for the life of the JVM. */
  private val registeredDir =
    new java.util.WeakHashMap[SparkSession, String]()

  private def sqlQ(s: SparkSession, d: String, text: String): DataFrame = {
    val dir = d.stripSuffix("/")
    // record the dir only AFTER registration succeeds (a failed or
    // mid-flight registration must be retried, not skipped); synchronized
    // so two threads sharing the session can't observe half-created views.
    // The dir cache alone is not sufficient to skip: a caller may have
    // dropped or replaced the temp views since, so verify they still
    // resolve in the session catalog (in-memory lookups, ~free).
    registeredDir.synchronized {
      val intact = registeredDir.get(s) == dir &&
        SqlTables.forall(n => s.catalog.tableExists(n))
      if (!intact) {
        graft.expressions.VectorFunctions.register(s)
        viewsFor(s, dir, SqlTables: _*)
        registeredDir.put(s, dir)
      }
    }
    s.sql(text)
  }

  val all: Seq[Q] = Seq(

    // ---- multi-join aggregation as pure SQL text over DDL-created views.
    Q("q54_sql_revenue",
      (s, d) => sqlQ(s, d,
        """SELECT n.n_name AS nation,
          |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
          |  CAST(count(*) AS BIGINT) AS n_items
          |FROM customer c
          |JOIN orders o ON c.c_custkey = o.o_custkey
          |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY n.n_name
          |ORDER BY nation""".stripMargin),
      Some("""SELECT n.n_name AS nation,
             |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             |  CAST(count(*) AS BIGINT) AS n_items
             |FROM customer c
             |JOIN orders o ON c.c_custkey = o.o_custkey
             |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |GROUP BY n.n_name
             |ORDER BY nation""".stripMargin),
      bench = true),

    // ---- the injected native cosine_sim expression, called FROM SQL:
    // end-to-end proof the codegen'd kernel is a first-class SQL function.
    Q("q55_sql_cosine",
      (s, d) => sqlQ(s, d,
        """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
          |SELECT e.vec_id,
          |  round(cosine_sim(e.embedding, q.qv) * 1000000.0) / 1000000.0 AS cos
          |FROM embeddings e CROSS JOIN q
          |WHERE e.vec_id <> 0
          |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
             |SELECT vec_id, (round((list_cosine_similarity(v, qv)) * 1000000.0) / 1000000.0) AS cos
             |FROM e, q WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- SQL-text window function (running revenue per customer).
    Q("q56_sql_window",
      (s, d) => sqlQ(s, d,
        """SELECT o_custkey, o_orderkey,
          |  round(sum(o_totalprice) OVER (
          |    PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS running
          |FROM orders
          |ORDER BY o_custkey, o_orderkey""".stripMargin),
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS running
             |FROM orders
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- explicit GROUPING SETS + grouping() markers (distinct from the
    // rollup/cube family of q17/q48); grouped columns coalesced in the
    // output so null-ordering defaults can't differ between engines.
    Q("q74_grouping_sets",
      (s, d) => sqlQ(s, d,
        """SELECT coalesce(o_orderpriority, '<all>') AS pri,
          |  coalesce(o_orderstatus, '<all>') AS st,
          |  CAST(grouping(o_orderpriority) AS INT) AS g_pri,
          |  CAST(grouping(o_orderstatus) AS INT) AS g_st,
          |  CAST(count(*) AS BIGINT) AS n
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
          |ORDER BY g_pri, g_st, pri, st""".stripMargin),
      Some("""SELECT coalesce(o_orderpriority, '<all>') AS pri,
             |  coalesce(o_orderstatus, '<all>') AS st,
             |  CAST(grouping(o_orderpriority) AS INT) AS g_pri,
             |  CAST(grouping(o_orderstatus) AS INT) AS g_st,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
             |ORDER BY g_pri, g_st, pri, st""".stripMargin)),

    // ---- typed per-group TopK Aggregator (custom UDAF surface): top-3
    // customers per nation by account balance. Bounded k-entry buffers with
    // partial aggregation — only k rows per group leave each map task.
    Q("q57_topk_group",
      (s, d) => {
        import s.implicits._
        Tables.t(s, d, "customer")
          .select(col("c_nationkey").cast("int"), col("c_acctbal").cast("double"),
            col("c_custkey").cast("long"))
          .as[(Int, Double, Long)]
          .groupByKey(_._1)
          .mapValues { case (_, bal, key) => (bal, key) }
          .agg(TopK.topKByScore(3).toColumn)
          .flatMap { case (nation, ids) =>
            ids.zipWithIndex.map { case (id, r) => (nation, r + 1L, id) }
          }
          .toDF("nationkey", "rk", "custkey")
          .orderBy("nationkey", "rk")
      },
      Some("""SELECT CAST(c_nationkey AS INT) AS nationkey, CAST(rk AS BIGINT) AS rk,
             |  CAST(c_custkey AS BIGINT) AS custkey
             |FROM (SELECT c_nationkey, c_custkey, row_number() OVER (
             |        PARTITION BY c_nationkey
             |        ORDER BY c_acctbal DESC, c_custkey) AS rk
             |      FROM customer)
             |WHERE rk <= 3
             |ORDER BY nationkey, rk""".stripMargin)),

    // ---- persistent catalog DDL: CREATE TABLE ... USING parquet (CTAS)
    // materializes a durable table — parquet files at a real location,
    // metadata in the shared external catalog — and the SELECT runs from a
    // FRESH session (newSession(): fresh session state, no temp views),
    // proving the table outlives the session that created it. This is the
    // durable-artifact analog of the reference's published parquet table
    // (reference: main.py:110-121), beyond the session-scoped temp views
    // the rest of the SQL surface uses.
    Q("q79_catalog_table",
      (s, d) => {
        val dir = d.stripSuffix("/")
        // FIXED per-dataset location, replaced wholesale on every run:
        // repeated executions leave disk usage flat (DROP on an external
        // table keeps the files, so a fresh temp dir per run would leak
        // both the dir and the previous table's parquet). The global
        // table name + location assume the driver's single-threaded
        // harness — concurrent executions on one metastore would race.
        val loc = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), "graft-catalog"),
          java.lang.Integer.toHexString(dir.hashCode) + "/nation_orders")
        s.sql("DROP TABLE IF EXISTS graft_nation_orders")
        def rmTree(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rmTree)
          f.delete(); ()
        }
        if (loc.exists()) rmTree(loc)
        s.sql(
          s"""CREATE TABLE graft_nation_orders USING parquet LOCATION '$loc' AS
             |SELECT n.n_name AS nation, o.o_orderstatus AS st,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  round(sum(o.o_totalprice), 2) AS total
             |FROM parquet.`$dir/orders.parquet` o
             |JOIN parquet.`$dir/customer.parquet` c ON o.o_custkey = c.c_custkey
             |JOIN parquet.`$dir/nation.parquet` n ON c.c_nationkey = n.n_nationkey
             |GROUP BY 1, 2""".stripMargin)
        s.newSession().sql(
          """SELECT nation, st, n_orders, total
            |FROM graft_nation_orders
            |ORDER BY nation, st""".stripMargin)
      },
      Some("""SELECT n.n_name AS nation, o.o_orderstatus AS st,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  round(sum(o.o_totalprice), 2) AS total
             |FROM orders o
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |GROUP BY 1, 2
             |ORDER BY nation, st""".stripMargin)),

    // ---- manifest-committed table end-to-end: seed a partitioned table
    // through ManifestCommit (immutable txn dirs + create-if-absent
    // versioned manifest — the object-store-safe commit), keyed-upsert a
    // second txn touching ONE partition (updates + inserts, last-writer-
    // wins: reference validator.py:96-98), then read the stitched
    // snapshot. The read spans TWO live txn generations — untouched
    // segments resolve to the seed txn, BUILDING to the upsert txn — so
    // this row drives manifest resolution, per-generation scans, and the
    // unionByName stitch against a DuckDB oracle, complementing
    // ManifestCommitSpec's crash/race/retention coverage.
    // Fixed per-dataset location wiped per run (the q79 argument): disk
    // usage stays flat across repeated harness executions.
    Q("q91_manifest_upsert",
      (s, d) => readManifestDemo(
        manifestDemoTable(s, d, "cust_by_seg"), s, version = None),
      Some(ManifestMergedOracle)),

    // ---- manifest TIME TRAVEL: after the upsert published version 2,
    // version 1 must still read back byte-identical to the seed — the
    // published manifest file is immutable and vacuum hasn't retired its
    // txn dirs. Oracle = the plain base projection, so any leakage of the
    // v2 txn into a v1 read (or any mutation of seed files during the
    // upsert) flips the hash. Own location: query registry order is
    // undefined, so no row may depend on another's side effects.
    Q("q93_manifest_time_travel",
      (s, d) => readManifestDemo(
        manifestDemoTable(s, d, "cust_by_seg_tt"), s, version = Some(1L)),
      Some("""SELECT CAST(c_custkey AS BIGINT) AS custkey,
             |  round(c_acctbal, 2) AS bal, c_mktsegment AS seg
             |FROM customer ORDER BY custkey""".stripMargin)),

    // ---- manifest COMPACTION: collapse the two live txn generations into
    // one (the public formats' OPTIMIZE — replaceAll manifest pointing
    // every partition at a fresh rewritten txn) and prove the visible
    // table is unchanged: same oracle as q91. Also asserts the collapse
    // actually happened, so the row can't silently degrade into a no-op.
    Q("q94_manifest_compact",
      (s, d) => {
        val loc = manifestDemoTable(s, d, "cust_by_seg_cp")
        val snap = graft.sources.ManifestCommit.compactManifested(
          s, loc, Seq("seg"))
        require(snap.entries.values.toSet.size == 1,
          s"compaction left ${snap.entries.values.toSet.size} txn generations")
        readManifestDemo(loc, s, version = None)
      },
      Some(ManifestMergedOracle)),

    // ---- manifest DATA SKIPPING: commit with statCols (footer min/max
    // sidecar), range-clustered files (sortWithinPartitions + small
    // maxRecordsPerFile), then read through readManifestedPruned — files
    // whose custkey range misses [100, 400] are never opened. The require
    // keeps the row honest: if pruning ever stops cutting files, the row
    // errors rather than silently degrading to a full scan. Values are
    // oracled against the plain range filter, proving skipping changes
    // WHICH FILES are read, never the answer.
    Q("q100_manifest_pruned",
      (s, d) => {
        val dir = d.stripSuffix("/")
        val loc = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), "graft-manifest"),
          java.lang.Integer.toHexString(dir.hashCode) + "/cust_pruned")
        def rmTree(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rmTree)
          f.delete(); ()
        }
        if (loc.exists()) rmTree(loc)
        val base = s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey").cast("long").as("custkey"),
            round(col("c_acctbal"), 2).as("bal"),
            col("c_mktsegment").as("seg"))
        graft.sources.ManifestCommit.overwriteViaManifest(s, loc.toString,
          Seq("seg"), replaceAll = true, statCols = Seq("custkey")) { txn =>
          base.repartition(col("seg")).sortWithinPartitions("custkey")
            .write.option("maxRecordsPerFile", 20)
            .partitionBy("seg").parquet(txn)
        }
        val (df, scanned, total) = graft.sources.ManifestCommit
          .readManifestedPruned(s, loc.toString, "custkey", 100L, 400L)
        require(scanned < total,
          s"data skipping must cut the scan, read $scanned of $total files")
        df.where(col("custkey").between(100L, 400L))
          .select(col("custkey").cast("long"), col("bal"),
            col("seg").cast("string"))
          .orderBy("custkey")
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS custkey,
             |  round(c_acctbal, 2) AS bal, c_mktsegment AS seg
             |FROM customer WHERE c_custkey BETWEEN 100 AND 400
             |ORDER BY custkey""".stripMargin)),

    // ---- manifest COUNT(*) pushdown: the row count comes from the
    // `.stats` sidecars' per-file `_rows` lines (parquet footer row
    // counts) — no data file opened, no job run (ManifestCommitSpec
    // asserts the no-job property; this row drives the VALUE against the
    // DuckDB count). Coverage is checked per live file; a stats-less
    // commit would fall back to a real distributed count.
    Q("q104_manifest_count",
      (s, d) => {
        import s.implicits._
        val dir = d.stripSuffix("/")
        val loc = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), "graft-manifest"),
          java.lang.Integer.toHexString(dir.hashCode) + "/cust_counted")
        def rmTree(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rmTree)
          f.delete(); ()
        }
        if (loc.exists()) rmTree(loc)
        val base = s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey").cast("long").as("custkey"),
            col("c_mktsegment").as("seg"))
        graft.sources.ManifestCommit.overwriteViaManifest(s, loc.toString,
          Seq("seg"), replaceAll = true, statCols = Seq("custkey")) { txn =>
          base.write.option("maxRecordsPerFile", 200)
            .partitionBy("seg").parquet(txn)
        }
        Seq(graft.sources.ManifestCommit.countManifested(s, loc.toString))
          .toDF("total_rows")
      },
      Some("SELECT CAST(count(*) AS BIGINT) AS total_rows FROM customer")),

    // ---- LATERAL correlated subquery as SQL text: per-order top-2
    // lineitems via an ORDER BY ... LIMIT subquery referencing the
    // outer row — the SQL-user spelling of the q57 per-group top-k
    // (Catalyst rewrites it to the same window/limit machinery).
    Q("q281_sql_lateral",
      (s, d) => sqlQ(s, d,
        """SELECT o.o_orderkey, l.l_linenumber, l.l_quantity AS qty
          |FROM orders o
          |JOIN LATERAL (
          |  SELECT l_linenumber, l_quantity FROM lineitem
          |  WHERE l_orderkey = o.o_orderkey
          |  ORDER BY l_quantity DESC, l_linenumber LIMIT 2) l
          |WHERE o.o_orderkey % 500 = 0
          |ORDER BY o.o_orderkey, l.l_linenumber""".stripMargin),
      Some("""SELECT o.o_orderkey, l.l_linenumber, l.l_quantity AS qty
             |FROM orders o
             |JOIN LATERAL (
             |  SELECT l_linenumber, l_quantity FROM lineitem
             |  WHERE l_orderkey = o.o_orderkey
             |  ORDER BY l_quantity DESC, l_linenumber LIMIT 2) l ON true
             |WHERE o.o_orderkey % 500 = 0
             |ORDER BY o.o_orderkey, l.l_linenumber""".stripMargin)))

  /** Seeds a manifest-committed customer-by-segment table at a fixed
    * per-(dataset,suffix) location (wiped per run — disk-flat across
    * harness executions), then keyed-upserts a second txn touching only
    * the BUILDING partition (updates + inserts). Returns the table path;
    * the resulting table has TWO live txn generations. */
  private def manifestDemoTable(s: SparkSession, d: String,
      suffix: String): String = {
    val dir = d.stripSuffix("/")
    val loc = new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft-manifest"),
      java.lang.Integer.toHexString(dir.hashCode) + "/" + suffix)
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(); ()
    }
    if (loc.exists()) rmTree(loc)
    val base = s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long").as("custkey"),
        round(col("c_acctbal"), 2).as("bal"),
        col("c_mktsegment").as("seg"))
    graft.sources.ManifestCommit.overwriteViaManifest(s, loc.toString,
      Seq("seg"), replaceAll = true) { txn =>
      base.write.partitionBy("seg").parquet(txn)
    }
    val upd = base
      .filter(col("seg") === "BUILDING" && col("custkey") % 10 === 0)
      .withColumn("bal", round(col("bal") + lit(1000), 2))
    val ins = upd.select((col("custkey") + 1000000L).as("custkey"),
      lit(0.0).as("bal"), col("seg"))
    graft.sources.ManifestCommit.upsertManifested(s, loc.toString,
      upd.unionByName(ins), Seq("custkey"), Seq("seg"))
    loc.toString
  }

  private def readManifestDemo(loc: String, s: SparkSession,
      version: Option[Long]): DataFrame =
    graft.sources.ManifestCommit.readManifested(s, loc, version)
      .select(col("custkey").cast("long"), col("bal"),
        col("seg").cast("string"))
      .orderBy("custkey")

  /** Last-writer-wins merge of the seed + the BUILDING upsert, in DuckDB
    * terms (reference semantics: validator.py:96-98). A `def`: `all` is
    * built during object init, which runs top-to-bottom — a later `val`
    * would still be null when the Q rows capture it. */
  private def ManifestMergedOracle =
    """WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS custkey,
      |         round(c_acctbal, 2) AS bal, c_mktsegment AS seg
      |       FROM customer),
      |     upd AS (SELECT custkey, round(bal + 1000, 2) AS bal, seg
      |       FROM base WHERE seg = 'BUILDING' AND custkey % 10 = 0)
      |SELECT custkey, bal, seg FROM base
      |WHERE NOT (seg = 'BUILDING' AND custkey % 10 = 0)
      |UNION ALL SELECT custkey, bal, seg FROM upd
      |UNION ALL SELECT custkey + 1000000 AS custkey, 0.0 AS bal, seg
      |FROM upd
      |ORDER BY custkey""".stripMargin
}
