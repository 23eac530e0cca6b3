package graft.queries

import graft.operators.{AsofJoin, Hierarchy}
import graft.queries.Tables.t
import org.apache.spark.sql.functions._

/** Advanced operators: as-of join (time-series), exact/approx quantiles,
  * approximate distinct sketches, and recursive hierarchy closure. */
object Advanced {

  private val valEdges = Seq(
    ("A01", "A"), ("A01B", "A01"), ("A01B1/00", "A01B"), ("A01B1/02", "A01B1/00"),
    ("Y02E", "Y02"), ("Y02", "Y"))

  val all: Seq[Q] = Seq(

    // ---- backward as-of join: each purchase matched to the latest
    // at-or-before click of the same user (DuckDB: native ASOF JOIN; here:
    // union + running last() window — SURVEY §2.5 "compose existing ops").
    Q("q19_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val p = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"), col("ts"))
        // rts drives the join; cts is a payload copy (the operator's output
        // excludes the right key/ts columns themselves)
        val c = ev.where(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("event_id").as("cid"),
            col("ts").as("cts"), col("ts").as("rts"))
        // native custom physical operator (graft.plans.AsOfJoinExec);
        // AdvancedOpsSpec proves it equal to the composed union+window form
        graft.plans.NativeAsOf.backward(p, c, "user_id", "cu", "ts", "rts")
          // µs, not ns: DuckDB coerces TIMESTAMP_NS to µs on read, so the
          // oracle can only see microsecond precision
          .select(col("user_id"), col("pid"), col("cid"),
            (expr("ts div 1000") - expr("cts div 1000")).as("gap_us"))
          .orderBy("pid")
      },
      Some("""WITH p AS (SELECT user_id, event_id AS pid, ts FROM events
             |           WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, event_id AS cid, ts FROM events
             |      WHERE event_type = 'click')
             |SELECT p.user_id, pid, cid, epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
             |ORDER BY pid""".stripMargin),
      bench = true),

    // ---- exact interpolated quantiles (type-7, both engines).
    Q("q32_quantiles",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          (round((expr("percentile(l_quantity, 0.5)")) * 10000.0) / 10000.0).as("median_qty"),
          (round((expr("percentile(l_extendedprice, 0.9)")) * 10000.0) / 10000.0).as("p90_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  (round((quantile_cont(l_quantity, 0.5)) * 10000.0) / 10000.0) AS median_qty,
             |  (round((quantile_cont(l_extendedprice, 0.9)) * 10000.0) / 10000.0) AS p90_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- approximate distinct (HLL++). Sketch VALUES are
    // engine-specific, so the row is contracted on the estimator's
    // ERROR-BOUND INVARIANT, which IS oracle-expressible: the exact
    // per-group distinct counts (portable) ride along with booleans
    // asserting |estimate − exact| / exact ≤ 0.15 — 1.7× the worst
    // relative error measured across both gate scales (8.6%, vs the
    // sketch's nominal 5% rsd), so the bound is tight enough to catch a
    // broken register path yet safe against tail wobble. The oracle
    // emits the exact counts and TRUE: an estimator drifting past the
    // bound hash-fails. (q64's KMV carries the exact-valued portable
    // sketch twin.)
    Q("q33_approx_distinct",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("ap"),
          approx_count_distinct(col("l_orderkey")).as("ao"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")).cast("double")
            / col("exact_parts").cast("double") <= 0.15)
            .as("parts_within_eps"),
          (abs(col("ao") - col("exact_orders")).cast("double")
            / col("exact_orders").cast("double") <= 0.15)
            .as("orders_within_eps"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             |  TRUE AS parts_within_eps, TRUE AS orders_within_eps
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- KMV distinct-count sketch (typed Aggregator, bounded k-long
    // buffer, partial-agg mergeable). Unlike HLL, the k smallest distinct
    // 60-bit md5 hashes are a pure function of the input set — merge-order
    // and engine independent — so the DuckDB oracle reproduces the exact
    // estimate (graft.operators.Sketches).
    Q("q64_kmv_distinct",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .select(col("l_returnflag"),
            graft.expressions.PortableHash.md5Hash60(col("l_partkey")).as("h"))
          .as[(String, Long)]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(graft.operators.Sketches.kmvDistinct(64).toColumn)
          .toDF("l_returnflag", "est")
          .select(col("l_returnflag"),
            (round(col("est") * 1000000.0) / 1000000.0).as("kmv_parts"))
          .orderBy("l_returnflag")
      },
      Some("""WITH h AS (SELECT DISTINCT l_returnflag,
             |  CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
             |  FROM lineitem),
             |s AS (SELECT l_returnflag, count(*) AS n, list_sort(list(h)) AS hs
             |      FROM h GROUP BY l_returnflag)
             |SELECT l_returnflag,
             |  round((CASE WHEN n < 64 THEN n::DOUBLE
             |         ELSE 63.0 * 1152921504606846976.0 / hs[64] END) * 1000000.0) / 1000000.0
             |    AS kmv_parts
             |FROM s ORDER BY l_returnflag""".stripMargin)),

    // ---- range (interval) join: facts against inline date ranges. Spark
    // plans dim-range joins as broadcast nested loop — right-sized when the
    // range table is a true dimension.
    Q("q34_range_join",
      (s, d) => {
        import s.implicits._
        val eras = Seq(
          ("era1", "1995-01-01", "1997-01-01"),
          ("era2", "1997-01-01", "1999-01-01"),
          ("era3", "1999-01-01", "2002-01-01")).toDF("era", "lo", "hi")
          .select(col("era"), col("lo").cast("timestamp"), col("hi").cast("timestamp"))
        t(s, d, "orders").join(broadcast(eras),
            col("o_orderdate") >= col("lo") && col("o_orderdate") < col("hi"))
          .groupBy("era")
          .agg(count(lit(1)).as("n"), (round((sum("o_totalprice")) * 100.0) / 100.0).as("total"))
          .orderBy("era")
      },
      Some("""WITH eras(era, lo, hi) AS (VALUES
             |  ('era1', TIMESTAMP '1995-01-01', TIMESTAMP '1997-01-01'),
             |  ('era2', TIMESTAMP '1997-01-01', TIMESTAMP '1999-01-01'),
             |  ('era3', TIMESTAMP '1999-01-01', TIMESTAMP '2002-01-01'))
             |SELECT era, count(*) AS n, (round((sum(o_totalprice)) * 100.0) / 100.0) AS total
             |FROM orders JOIN eras ON o_orderdate >= lo AND o_orderdate < hi
             |GROUP BY era ORDER BY era""".stripMargin)),

    // ---- pivot (wide conditional aggregation).
    Q("q35_pivot",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  count(*) FILTER (event_type = 'click') AS click,
             |  count(*) FILTER (event_type = 'view') AS view,
             |  count(*) FILTER (event_type = 'purchase') AS purchase,
             |  count(*) FILTER (event_type = 'signup') AS signup,
             |  count(*) FILTER (event_type = 'error') AS error
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- correlated-aggregate semantics: orders above their customer's
    // average, decorrelated as an aggregate join.
    Q("q37_above_avg",
      (s, d) => {
        val o = t(s, d, "orders")
        val avgs = o.groupBy("o_custkey").agg(avg("o_totalprice").as("cavg"))
        o.join(avgs, "o_custkey")
          .where(col("o_totalprice") > col("cavg") * 1.5)
          // cust_avg itself is NOT output: averages of money values land on
          // exact .xxxx5 round-ties where engines' ulp-different sums round
          // apart (observed at sf0.01)
          .select(col("o_orderkey"), col("o_custkey"),
            (round((col("o_totalprice")) * 100.0) / 100.0).as("price"))
          .orderBy("o_orderkey")
      },
      Some("""WITH avgs AS (SELECT o_custkey, avg(o_totalprice) AS cavg
             |              FROM orders GROUP BY o_custkey)
             |SELECT o_orderkey, orders.o_custkey, (round((o_totalprice) * 100.0) / 100.0) AS price
             |FROM orders JOIN avgs ON orders.o_custkey = avgs.o_custkey
             |WHERE o_totalprice > cavg * 1.5 ORDER BY o_orderkey""".stripMargin)),

    // ---- ordered string aggregation.
    Q("q38_string_agg",
      (s, d) => t(s, d, "nation")
        .join(t(s, d, "supplier"), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("suppliers"))
        .orderBy("n_name"),
      Some("""SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
             |FROM nation JOIN supplier ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ---- incremental aggregate maintenance: per-customer order stats
    // maintained as mergeable states — merge(state(hist), state(delta))
    // must equal the full recompute the oracle runs. Money sums run in
    // DECIMAL so summation is exact and ASSOCIATIVE (double partial sums
    // differ from the full recompute in the last ulp, which flips
    // round() at .xx5 boundaries); converted to double only for output.
    Q("q72_incr_agg",
      (s, d) => {
        import graft.operators.Incremental
        val orders = t(s, d, "orders")
          .withColumn("o_totalprice", col("o_totalprice").cast("decimal(18,2)"))
        val hist = orders.where(col("o_orderkey") % 10 =!= 0)
        val delta = orders.where(col("o_orderkey") % 10 === 0)
        val merged = Incremental.mergeStates(
          Incremental.aggState(hist, Seq("o_custkey"), Seq("o_totalprice")),
          Incremental.aggState(delta, Seq("o_custkey"), Seq("o_totalprice")),
          Seq("o_custkey"))
        // output only the EXACT state columns (count + decimal sum as
        // 2dp double); averages are derivable (Incremental.finish — its
        // algebra is spec-checked) and their .xxx5 half-point rounding
        // differs between engines
        merged.select(col("o_custkey"), col("n"),
            round(col("sum_o_totalprice").cast("double"), 2).as("total"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // ---- snapshot diff (CDC): classify keys across two deterministic
    // versions of the customer table as insert / delete / update.
    Q("q73_snapshot_diff",
      (s, d) => {
        val c = t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val old = c.where(col("c_custkey") % 7 =!= 0)
        val neu = c.where(col("c_custkey") % 11 =!= 0)
          .withColumn("c_acctbal",
            when(col("c_custkey") % 5 === 0, round(col("c_acctbal") + 10.0, 2))
              .otherwise(col("c_acctbal")))
        graft.operators.Incremental.snapshotDiff(old, neu, Seq("c_custkey"))
          .select(col("c_custkey"), col("change"), col("c_acctbal"))
          .orderBy("c_custkey")
      },
      Some("""WITH c AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
             |o AS (SELECT * FROM c WHERE c_custkey % 7 <> 0),
             |n AS (SELECT c_custkey, c_name,
             |        CASE WHEN c_custkey % 5 = 0 THEN round(c_acctbal + 10.0, 2)
             |             ELSE c_acctbal END AS c_acctbal
             |      FROM c WHERE c_custkey % 11 <> 0)
             |SELECT coalesce(n.c_custkey, o.c_custkey) AS c_custkey,
             |  CASE WHEN o.c_custkey IS NULL THEN 'insert'
             |       WHEN n.c_custkey IS NULL THEN 'delete'
             |       WHEN o.c_name IS DISTINCT FROM n.c_name
             |         OR o.c_acctbal IS DISTINCT FROM n.c_acctbal THEN 'update' END AS change,
             |  n.c_acctbal
             |FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey
             |WHERE (CASE WHEN o.c_custkey IS NULL THEN 'insert'
             |       WHEN n.c_custkey IS NULL THEN 'delete'
             |       WHEN o.c_name IS DISTINCT FROM n.c_name
             |         OR o.c_acctbal IS DISTINCT FROM n.c_acctbal THEN 'update' END) IS NOT NULL
             |ORDER BY c_custkey""".stripMargin)),

    // ---- RANGE-frame window (value-based frame, distinct from the ROWS
    // frames of q16/q52): trailing-7-day average order value per customer.
    // The frame key is epoch DAYS (integer) so the range arithmetic is
    // identical in both engines.
    Q("q70_window_range_frame",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy(col("d"))
          .rangeBetween(-6, Window.currentRow)
        t(s, d, "orders").where(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("d"),
            col("o_totalprice"))
          .withColumn("avg7d", round(avg(col("o_totalprice")).over(w), 4))
          .select("o_custkey", "o_orderkey", "d", "avg7d")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS d,
             |  round(avg(o_totalprice) OVER (
             |    PARTITION BY o_custkey
             |    ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg7d
             |FROM orders WHERE o_custkey < 100
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- full ranking-window battery: rank / dense_rank / ntile / lag /
    // lead over one partitioned frame.
    Q("q44_window_ranks",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders").where(col("o_custkey") < 50)
          .select(col("o_custkey"), col("o_orderkey"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"),
            lag(col("o_orderkey"), 1).over(w).as("prev_ok"),
            lead(col("o_orderkey"), 1).over(w).as("next_ok"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(rank() OVER w AS INT) AS rnk,
             |  CAST(dense_rank() OVER w AS INT) AS drnk,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  lag(o_orderkey, 1) OVER w AS prev_ok,
             |  lead(o_orderkey, 1) OVER w AS next_ok
             |FROM orders WHERE o_custkey < 50
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- null semantics: null group keys, count(col) vs count(*), nullif.
    Q("q45_null_semantics",
      (s, d) => {
        val o = t(s, d, "orders")
          .withColumn("bucket", when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")) // else NULL
        o.groupBy(col("bucket")) // null forms its own group in both engines
          .agg(count(lit(1)).as("n_rows"), count(col("bucket")).as("n_nonnull"),
            count(nullif(col("o_orderstatus"), lit("O"))).as("n_not_open"))
          .select(coalesce(col("bucket"), lit("(none)")).as("bucket"),
            col("n_rows"), col("n_nonnull"), col("n_not_open"))
          .orderBy("bucket")
      },
      Some("""SELECT coalesce(bucket, '(none)') AS bucket, count(*) AS n_rows,
             |  count(bucket) AS n_nonnull,
             |  count(nullif(o_orderstatus, 'O')) AS n_not_open
             |FROM (SELECT CASE WHEN o_totalprice > 200000 THEN 'big'
             |                  WHEN o_totalprice > 100000 THEN 'mid' END AS bucket,
             |             o_orderstatus
             |      FROM orders)
             |GROUP BY bucket ORDER BY coalesce(bucket, '(none)')""".stripMargin)),

    // ---- array-function battery over the embedding column.
    Q("q46_array_funcs",
      (s, d) => {
        val v = col("embedding").cast("array<double>")
        t(s, d, "embeddings")
          .select(col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            (round((element_at(v, 1)) * 1000000.0) / 1000000.0).as("first_el"),
            (round((aggregate(slice(v, 1, 8), lit(0.0), (a, x) => a + x)) * 1000000.0) / 1000000.0).as("head_sum"),
            (round((array_max(v)) * 1000000.0) / 1000000.0).as("vmax"),
            (round((array_min(v)) * 1000000.0) / 1000000.0).as("vmin"))
          .orderBy("vec_id")
      },
      Some("""SELECT vec_id,
             |  CAST(len(embedding) AS BIGINT) AS dim,
             |  (round((embedding[1]::DOUBLE) * 1000000.0) / 1000000.0) AS first_el,
             |  (round((list_sum((embedding::DOUBLE[])[1:8])) * 1000000.0) / 1000000.0) AS head_sum,
             |  (round((list_max(embedding::DOUBLE[])) * 1000000.0) / 1000000.0) AS vmax,
             |  (round((list_min(embedding::DOUBLE[])) * 1000000.0) / 1000000.0) AS vmin
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ---- CUBE grouping sets (all four combinations).
    Q("q48_cube",
      (s, d) => t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"))
        .orderBy("rf", "ls"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |  coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin)),

    // ---- aggregate + HAVING (post-aggregation filter).
    Q("q50_having",
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg((round((sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) * 100.0) / 100.0).as("revenue"),
          count(lit(1)).as("n"))
        .where(col("n") > 550)
        .orderBy("s_name"),
      Some("""SELECT s_name,
             |  (round((sum(l_extendedprice * (1.0 - l_discount))) * 100.0) / 100.0) AS revenue,
             |  count(*) AS n
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_name HAVING count(*) > 550 ORDER BY s_name""".stripMargin)),

    // ---- date/time function battery over order dates.
    Q("q51_date_funcs",
      (s, d) => t(s, d, "orders").where(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).cast("long").as("days_since"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS d,
             |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |  CAST(extract(day FROM o_orderdate) AS BIGINT) AS dom,
             |  CAST(extract(dow FROM o_orderdate) + 1 AS BIGINT) AS dow,
             |  CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
             |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since
             |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),

    // ---- the canonical window() tumbling aggregation (15-min, epoch-aligned).
    Q("q52_window_fn",
      (s, d) => Tables.events(s, d)
        .withColumn("tts", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("tts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("wstart"),
          col("event_type"), col("n"))
        .orderBy("wstart", "event_type"),
      Some("""SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS wstart,
             |  event_type, count(*) AS n
             |FROM events GROUP BY wstart, event_type
             |ORDER BY wstart, event_type""".stripMargin)),

    // ---- recursive hierarchy closure: iterative self-join vs DuckDB
    // WITH RECURSIVE over the same inline edges.
    Q("q43_cpc_ancestors",
      (s, _) => {
        import s.implicits._
        Hierarchy.ancestors(valEdges.toDF("symbol", "parent_symbol"))
          .orderBy("symbol", "depth")
      },
      Some(s"""WITH RECURSIVE ed(symbol, parent_symbol) AS (
              |  VALUES ${valEdges.map(p => s"('${p._1}', '${p._2}')").mkString(", ")}),
              |anc AS (
              |  SELECT symbol, parent_symbol AS ancestor, CAST(1 AS BIGINT) AS depth FROM ed
              |  UNION ALL
              |  SELECT a.symbol, e.parent_symbol, a.depth + 1
              |  FROM anc a JOIN ed e ON a.ancestor = e.symbol)
              |SELECT symbol, ancestor, depth FROM anc ORDER BY symbol, depth""".stripMargin)),

    // ---- NATIVE recursive SQL: Spark 4's WITH RECURSIVE executes the
    // SAME text DuckDB runs as the oracle — one SQL string, two engines,
    // hash-equal. The q92 pattern (SQL route of an operator row) applied
    // to q43's closure: the iterative-self-join operator
    // (Hierarchy.ancestors, checkpoint-per-level) stays the 100 TB path
    // for unbounded depth; this row proves the SQL surface itself now
    // covers recursion (parity with engines whose users write recursive
    // CTEs directly).
    {
      val recSql =
        s"""WITH RECURSIVE ed(symbol, parent_symbol) AS (
           |  VALUES ${valEdges.map(p => s"('${p._1}', '${p._2}')").mkString(", ")}),
           |anc AS (
           |  SELECT symbol, parent_symbol AS ancestor, CAST(1 AS BIGINT) AS depth FROM ed
           |  UNION ALL
           |  SELECT a.symbol, e.parent_symbol, a.depth + 1
           |  FROM anc a JOIN ed e ON a.ancestor = e.symbol)
           |SELECT symbol, ancestor, depth FROM anc ORDER BY symbol, depth""".stripMargin
      Q("q167_recursive_sql_ancestors", (s, _) => s.sql(recSql), Some(recSql))
    },

    // ---- Z-order (Morton) clustering key — the data-layout primitive
    // behind Layout.zOrderedWrite (Delta/Iceberg OPTIMIZE ZORDER BY,
    // from plain Spark ops). Pure integer bit arithmetic, bit-identical
    // cross-engine; LayoutSpec proves the 2-D file-pruning win.
    Q("q86_zorder",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"), col("p_size"),
          graft.operators.Layout.zValue(col("p_partkey"), col("p_size")).as("zkey"))
        .orderBy("zkey", "p_partkey"),
      Some(s"""SELECT p_partkey, p_size,
              |  ${graft.operators.Layout.zValueSql("p_partkey", "p_size")} AS zkey
              |FROM part ORDER BY zkey, p_partkey""".stripMargin),
      bench = true),

    // ---- Z-order key on HIGH-bit inputs: TPC-H p_size never sets bit 15,
    // so q86 alone could hide an overflowing `1 << 31` in a 32-bit oracle
    // engine. Both dimensions here are offset past 2^15, proving the
    // BIGINT-cast parity of zValue/zValueSql over the full 16-bit domain.
    Q("q87_zorder_wide",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          (col("p_partkey") + lit(32768)).as("a"),
          (col("p_size") + lit(32768)).as("b"))
        .select(col("p_partkey"), col("a"), col("b"),
          graft.operators.Layout.zValue(col("a"), col("b")).as("zkey"))
        .orderBy("zkey", "p_partkey"),
      Some(s"""SELECT p_partkey, a, b,
              |  ${graft.operators.Layout.zValueSql("a", "b")} AS zkey
              |FROM (SELECT p_partkey, p_partkey + 32768 AS a,
              |        p_size + 32768 AS b FROM part)
              |ORDER BY zkey, p_partkey""".stripMargin)),

    // ---- the z-order WRITE path end-to-end: range-sample + sort + parquet
    // write via Layout.zOrderedWrite, then read the files back — the
    // roundtrip must lose nothing (oracle = source projection). Bench-
    // flagged: this is the suite's only timed WRITE operator, so a
    // regression in the layout path (a lost partial sort, a skewed range
    // sample, parquet writer conf drift) shows up in BENCH_r*.json rather
    // than only in LayoutSpec's pruning assertions. Fixed per-dataset
    // location, overwritten per run — disk-flat across executions.
    Q("q95_zorder_roundtrip",
      (s, d) => {
        val loc = Tables.roundtripLoc(d, "zorder")
        graft.operators.Layout.zOrderedWrite(
          t(s, d, "part").select("p_partkey", "p_size"),
          "p_partkey", "p_size", loc, nFiles = 8)
        s.read.parquet(loc).orderBy("p_partkey")
      },
      Some("SELECT p_partkey, p_size FROM part ORDER BY p_partkey"),
      bench = true),

    // ---- SCD Type-2 dimension build: the events change log collapsed
    // into per-user validity intervals (runs of the same event_type →
    // [valid_from, valid_to), version, is_current). Two window passes
    // over one key-partitioning; timestamps compared at µs (q117
    // convention: DuckDB reads TIMESTAMP(NANOS) parquet at µs).
    Q("q169_scd2_intervals",
      (s, d) => graft.operators.EventOps.scdType2(
          Tables.events(s, d), "user_id", "event_type", "ts", "event_id")
        .select(col("user_id"), col("version"), col("event_type"),
          expr("valid_from div 1000").as("valid_from"),
          expr("valid_to div 1000").as("valid_to"), col("is_current"))
        .orderBy("user_id", "version"),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns, event_id FROM events),
             |g AS (SELECT user_id, event_type, tns, event_id,
             |        lag(event_type) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS prev
             |      FROM e),
             |r AS (SELECT user_id, event_type, tns, event_id FROM g
             |      WHERE prev IS NULL OR prev <> event_type),
             |v AS (SELECT user_id, event_type, tns,
             |        row_number() OVER w AS version,
             |        lead(tns) OVER w AS vto
             |      FROM r WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id))
             |SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
             |  CAST(tns // 1000 AS BIGINT) AS valid_from,
             |  CAST(vto // 1000 AS BIGINT) AS valid_to,
             |  (vto IS NULL) AS is_current
             |FROM v ORDER BY user_id, version""".stripMargin)))
}
