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
        val c = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("cid"),
            col("ts").as("cts"))
        AsofJoin.backward(p, c, Seq("user_id"), "ts", Seq("cid", "cts"))
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
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
             |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- approximate distinct (HLL++). Sketch estimates are
    // engine-specific -> no oracle; AdvancedOpsSpec bounds the error vs
    // exact counts.
    Q("q33_approx_distinct",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"))
        .orderBy("l_returnflag"),
      None),

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
              |SELECT symbol, ancestor, depth FROM anc ORDER BY symbol, depth""".stripMargin)))
}
