package graft.queries

import graft.queries.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator battery over the TPC-H-ish synthetic star schema
  * (SURVEY §2.3-2.8 scaled up: projections, filters, all join shapes,
  * aggregates, windows, rollup, set ops, sort/limit).
  *
  * SCALE notes are per query; the common rules: fact-fact joins shuffle on
  * their keys (AQE re-plans skew), true dimensions (region/nation/customer/
  * supplier/part at fixed row counts) are explicitly broadcast so the
  * lineitem/orders stream never shuffles for them, filters/projections sit
  * directly over the parquet scan for pushdown, and partial aggregation is
  * map-side by construction (groupBy on Catalyst built-ins).
  */
object Relational {

  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val all: Seq[Q] = Seq(

    // ---- q01: full-scan aggregate (TPC-H Q1 flavor). Map-side partial agg;
    // one shuffle of 6 grouped rows. Scan prunes to 7 of 11 columns.
    Q("q01_pricing_summary",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (round((sum("l_quantity")) * 100.0) / 100.0).as("sum_qty"),
          (round((sum("l_extendedprice")) * 100.0) / 100.0).as("sum_base_price"),
          (round((sum(revenue)) * 100.0) / 100.0).as("sum_disc_price"),
          (round((avg("l_quantity")) * 10000.0) / 10000.0).as("avg_qty"),
          (round((avg("l_discount")) * 10000.0) / 10000.0).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  (round((sum(l_quantity)) * 100.0) / 100.0) AS sum_qty,
             |  (round((sum(l_extendedprice)) * 100.0) / 100.0) AS sum_base_price,
             |  (round((sum(l_extendedprice * (1.0 - l_discount))) * 100.0) / 100.0) AS sum_disc_price,
             |  (round((avg(l_quantity)) * 10000.0) / 10000.0) AS avg_qty,
             |  (round((avg(l_discount)) * 10000.0) / 10000.0) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // ---- q02: selective filter + narrow projection — exercises parquet
    // predicate pushdown and column pruning (ReadSchema should show 6 cols).
    Q("q02_filter_project",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-02-01").cast("timestamp") &&
          col("l_discount") >= 0.08)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), (round((revenue) * 100.0) / 100.0).as("rev"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |  (round((l_extendedprice * (1.0 - l_discount)) * 100.0) / 100.0) AS rev
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-02-01' AND l_discount >= 0.08
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      bench = true),

    // ---- q03: dim->fact->fact join + top-N (TPC-H Q3 flavor). customer is
    // a true dim -> broadcast; orders⋈lineitem shuffles on orderkey. TopN is
    // TakeOrderedAndProject (no global sort materialization).
    Q("q03_segment_topn",
      (s, d) => {
        val c = broadcast(t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
          .select("c_custkey"))
        val o = t(s, d, "orders")
        val l = t(s, d, "lineitem")
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg((round((sum(revenue)) * 100.0) / 100.0).as("revenue"))
          .select(col("o_orderkey"), col("revenue"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             |  (round((sum(l_extendedprice * (1.0 - l_discount))) * 100.0) / 100.0) AS revenue,
             |  strftime(o_orderdate, '%Y-%m-%d') AS odate
             |FROM customer
             |JOIN orders ON o_custkey = c_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      bench = true),

    // ---- q04: left-semi join (EXISTS) — no payload from the right side,
    // so the build side carries keys only.
    Q("q04_semijoin_exists",
      (s, d) => {
        val heavy = t(s, d, "lineitem").where(col("l_quantity") > 45)
          .select(col("l_orderkey"))
        t(s, d, "orders").join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      bench = true),

    // ---- q05: 6-table star join (TPC-H Q5 flavor). region/nation/customer/
    // supplier broadcast; the single shuffle pairs lineitem with orders.
    Q("q05_nation_revenue",
      (s, d) => {
        val r = t(s, d, "region").where(col("r_name") === "ASIA")
        val n = t(s, d, "nation")
        val c = t(s, d, "customer")
        val sup = t(s, d, "supplier")
        val o = t(s, d, "orders")
        val l = t(s, d, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg((round((sum(revenue)) * 100.0) / 100.0).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name, (round((sum(l_extendedprice * (1.0 - l_discount))) * 100.0) / 100.0) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      bench = true),

    // ---- q06: left-anti join (NOT EXISTS): customers with no open orders.
    Q("q06_antijoin",
      (s, d) => {
        val open = t(s, d, "orders").where(col("o_orderstatus") === "P")
          .select("o_custkey")
        t(s, d, "customer").join(open, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- q07: left outer join + coalesce default (SURVEY J2 analog at
    // fact scale: absent dim row -> sentinel value).
    Q("q07_outer_coalesce",
      (s, d) => {
        val rich = t(s, d, "customer").where(col("c_acctbal") > 5000)
          .select(col("c_custkey"), col("c_mktsegment"))
        t(s, d, "orders").join(broadcast(rich), col("o_custkey") === col("c_custkey"), "left")
          .select(coalesce(col("c_mktsegment"), lit("NONE")).as("seg"), col("o_totalprice"))
          .groupBy("seg")
          .agg(count(lit(1)).as("n"), (round((sum("o_totalprice")) * 100.0) / 100.0).as("total"))
          .orderBy("seg")
      },
      Some("""SELECT coalesce(c_mktsegment, 'NONE') AS seg, count(*) AS n,
             |  (round((sum(o_totalprice)) * 100.0) / 100.0) AS total
             |FROM orders LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
             |                       WHERE c_acctbal > 5000) c
             |  ON o_custkey = c_custkey
             |GROUP BY seg ORDER BY seg""".stripMargin)),

    // ---- q08: group-wise latest (SURVEY A5/J4 analog): row_number window,
    // keep rn=1. One shuffle on user_id.
    Q("q08_latest_per_key",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, d).withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_type, event_id FROM (
             |  SELECT user_id, event_type, event_id,
             |    row_number() OVER (PARTITION BY user_id
             |                       ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- q09: global top-N (TakeOrderedAndProject — never a full sort).
    Q("q09_topn",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), (round((col("o_totalprice")) * 100.0) / 100.0).as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, (round((o_totalprice) * 100.0) / 100.0) AS price FROM orders
             |ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---- q10: set operations (INTERSECT / EXCEPT distinct semantics).
    Q("q10_setops",
      (s, d) => {
        val n = t(s, d, "nation")
        val custN = n.join(t(s, d, "customer"), col("c_nationkey") === col("n_nationkey"))
          .select("n_name")
        val supN = n.join(t(s, d, "supplier"), col("s_nationkey") === col("n_nationkey"))
          .select("n_name")
        custN.intersect(supN).select(lit("both").as("tag"), col("n_name"))
          .union(custN.except(supN).select(lit("cust_only").as("tag"), col("n_name")))
          .orderBy("tag", "n_name")
      },
      Some("""WITH custN AS (SELECT n_name FROM nation
             |               JOIN customer ON c_nationkey = n_nationkey),
             |     supN AS (SELECT n_name FROM nation
             |              JOIN supplier ON s_nationkey = n_nationkey)
             |SELECT 'both' AS tag, n_name FROM (SELECT * FROM custN INTERSECT SELECT * FROM supN)
             |UNION ALL
             |SELECT 'cust_only' AS tag, n_name FROM (SELECT * FROM custN EXCEPT SELECT * FROM supN)
             |ORDER BY tag, n_name""".stripMargin)),

    // ---- q11: conditional aggregation (SURVEY A3 at scale).
    Q("q11_conditional_agg",
      (s, d) => t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
          (round((sum(when(col("o_orderpriority").startsWith("1"), col("o_totalprice"))
            .otherwise(0.0))) * 100.0) / 100.0).as("urgent_total"))
        .orderBy("y"),
      Some("""SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
             |  count(*) AS n,
             |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
             |  (round((sum(CASE WHEN o_orderpriority LIKE '1%' THEN o_totalprice ELSE 0.0 END)) * 100.0) / 100.0) AS urgent_total
             |FROM orders GROUP BY y ORDER BY y""".stripMargin)),

    // ---- q12: scalar string/regex battery (SURVEY §2.9 at scale).
    Q("q12_string_funcs",
      (s, d) => t(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          substring(col("p_type"), 1, 4).as("type4"),
          col("p_name").contains("widget").as("is_widget"),
          length(col("p_name")).cast("long").as("name_len"),
          element_at(split(col("p_name"), " "), -1).as("last_word"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
             |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
             |  substring(p_type, 1, 4) AS type4,
             |  contains(p_name, 'widget') AS is_widget,
             |  CAST(length(p_name) AS BIGINT) AS name_len,
             |  string_split(p_name, ' ')[-1] AS last_word
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ---- q13: JSON extraction over the events props column.
    Q("q13_json_extract",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          (round((avg(get_json_object(col("props"), "$.k").cast("double"))) * 10000.0) / 10000.0).as("avg_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |  (round((avg(CAST(json_extract_string(props, '$.k') AS DOUBLE))) * 10000.0) / 10000.0) AS avg_k,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- q14: event-time tumbling bucket (batch twin of the streaming
    // windowed agg; epoch math keeps the oracle timestamp-free).
    Q("q14_time_bucket",
      // ts is long nanos (Tables.events) -> exact integer bucket math
      (s, d) => Tables.events(s, d)
        .groupBy((expr(s"ts div ${3600L * Tables.NanosPerSecond}") * 3600).as("bucket"))
        .agg(count(lit(1)).as("n"), (round((sum("value")) * 100.0) / 100.0).as("v"))
        .orderBy("bucket"),
      Some("""SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
             |  count(*) AS n, (round((sum(value)) * 100.0) / 100.0) AS v
             |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin),
      bench = true),

    // ---- q15: exact distinct counts (expand + two-phase agg under AQE).
    Q("q15_count_distinct",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_partkey) AS distinct_parts,
             |  count(DISTINCT l_suppkey) AS distinct_supps,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- q16: running window aggregate over a partitioned frame.
    Q("q16_window_running",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders").where(col("o_custkey") % 10 === 0)
          .select(col("o_custkey"), col("o_orderkey"),
            (round((sum(col("o_totalprice")).over(w)) * 100.0) / 100.0).as("running"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  (round((sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0) / 100.0) AS running
             |FROM orders WHERE o_custkey % 10 = 0
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- q17: rollup / grouping sets (absent in the reference, free in
    // Spark — SURVEY §2.6 gap closure).
    Q("q17_rollup",
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg((round((sum("l_quantity")) * 100.0) / 100.0).as("qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("qty"), col("n"))
        .orderBy("rf", "ls"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |  coalesce(l_linestatus, 'ALL') AS ls,
             |  (round((sum(l_quantity)) * 100.0) / 100.0) AS qty, count(*) AS n
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin)),

    // ---- q18: gap-based sessionization (streaming-state analog expressed
    // as two windows; 30-min inactivity gap).
    Q("q18_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val ev = Tables.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              (col("ts") - col("prev_ts")) > 1800L * Tables.NanosPerSecond, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(byUser))
        ev.groupBy("user_id")
          .agg(countDistinct(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
             |  FROM g)
             |SELECT user_id, count(DISTINCT sess_id) AS n_sessions, count(*) AS n_events
             |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin),
      bench = true),

    // ---- native session_window API (vs q18's hand-built gap windows):
    // gap-merged sessions per user. session_window merges STRICTLY-inside
    // gaps (next.ts < end), so the oracle starts a new session at gap >=
    // 30 min — comparisons run at the µs precision the timestamp cast
    // keeps.
    Q("q75_session_window",
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("tss", timestamp_micros(expr("ts div 1000")))
        ev.groupBy(col("user_id"), session_window(col("tss"), "30 minutes"))
          .agg(count(lit(1)).as("n"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"), sum("n").cast("long").as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR (epoch_ns(ts) // 1000 - epoch_ns(lag(ts) OVER w) // 1000)
             |              >= 1800000000 THEN 1 ELSE 0 END AS new_sess
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
             |  count(*) AS n_events
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- manual hot-key salting (SkewUtils.saltedJoin): the fact side is
    // salted 8 ways and the dimension replicated 8x, turning one hot-key
    // straggler task into 8 parallel tasks — for the skew cases AQE can't
    // fix (hot key inside a broadcast-too-big dim join). Salting must be
    // RESULT-INVISIBLE, which is exactly what the oracle (a plain join)
    // checks.
    Q("q82_salted_join",
      (s, d) => {
        val o = t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        val c = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
          .withColumnRenamed("c_custkey", "o_custkey")
        graft.operators.SkewUtils.saltedJoin(o, c, "o_custkey", 8)
          .groupBy(col("c_name"))
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("c_name")
      },
      Some("""SELECT c_name, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_name ORDER BY c_name""".stripMargin)))
}
