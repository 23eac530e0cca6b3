package graft

import graft.operators.DistributedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared two-phase prefix sum vs its window twins: bit-equality at
  * several partition counts, keyed and global, inclusive and exclusive,
  * multi-value, totals, and the no-Window plan assertion — the contract
  * every routed call site (packBins, Mann–Whitney, perplexity bands,
  * ksDrift, weighted quantiles, Spearman) leans on. */
class DistributedRankSpec extends GraftSpec {
  import spark.implicits._

  private lazy val byV = {
    // distinct-value relation with ties and a deterministic shape
    val rows = (1 to 500).map { i =>
      (i.toLong % 97, (i % 7).toLong + 1, (i % 13).toLong)
    }
    rows.toDF("v", "c1", "c2").groupBy("v")
      .agg(sum("c1").as("c1"), sum("c2").as("c2"))
  }

  test("global inclusive+exclusive multi-value prefix == window twin at partitions 1/3/32") {
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wx = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val twin = byV
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("pre2", coalesce(sum(col("c2")).over(wx), lit(0L)))
      .collect().map(_.toSeq).toSet
    Seq(1, 3, 32).foreach { p =>
      val inc = DistributedRank.prefixSum(byV, Nil, Seq(col("v")),
        Seq("c1" -> "cum1"), inclusive = true, partitions = p)
      val got = DistributedRank.prefixSum(inc, Nil, Seq(col("v")),
        Seq("c2" -> "pre2"), inclusive = false, partitions = p)
        .select("v", "c1", "c2", "cum1", "pre2")
      assert(!got.queryExecution.executedPlan.toString.contains("Window"),
        "prefixSum must never plan a window")
      assert(got.collect().map(_.toSeq).toSet == twin, s"partitions=$p")
    }
  }

  test("keyed prefix + totals == partitioned-window twin, null keys included") {
    val g = (1 to 300).map { i =>
      (if (i % 5 == 0) null else s"g${i % 3}", i.toLong % 41, (i % 9).toLong + 1)
    }.toDF("k", "v", "c").groupBy("k", "v").agg(sum("c").as("c"))
    val w = Window.partitionBy("k").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tw = Window.partitionBy("k")
    val twin = g.withColumn("cum", sum(col("c")).over(w))
      .withColumn("tot", sum(col("c")).over(tw))
      .collect().map(_.toSeq).toSet
    Seq(1, 4, 32).foreach { p =>
      val got = DistributedRank.prefixSum(g, Seq("k"), Seq(col("v")),
        Seq("c" -> "cum"), inclusive = true, totals = Seq("c" -> "tot"),
        partitions = p)
      assert(got.collect().map(_.toSeq).toSet == twin, s"partitions=$p")
    }
  }

  test("count-rank via lit(1) == row_number twin; desc order keys") {
    val df = (1 to 200).map(i => (i.toLong, (i * 37 % 211).toLong))
      .toDF("id", "score").withColumn("one", lit(1L))
    val w = Window.orderBy(col("score").desc, col("id"))
    val twin = df.withColumn("rk", row_number().over(w).cast("long") - 1L)
      .select("id", "score", "rk").collect().map(_.toSeq).toSet
    val got = DistributedRank.prefixSum(df, Nil,
        Seq(col("score").desc, col("id")), Seq("one" -> "rk"),
        inclusive = false, partitions = 7)
      .select("id", "score", "rk")
    assert(got.collect().map(_.toSeq).toSet == twin)
  }

  test("prepare: offsets short-circuit contract and grand total") {
    val df = (1L to 100L).map(i => (i, 2L)).toDF("id", "w")
    val p = DistributedRank.prepare(df, Nil, Seq(col("id")), Seq("w"),
      partitions = 8)
    assert(p.total(0) == 200L)
    // offsets are exclusive and non-decreasing in partition order
    val offs = (0 until 8).flatMap(pid =>
      p.bc.value.offsets.get((pid, Nil)).map(o => (pid, o(0))))
    assert(offs.map(_._2) == offs.map(_._2).sorted)
    assert(offs.map(_._2).forall(o => o >= 0L && o < 200L))
  }

  test("empty input: no rows, no crash, total 0") {
    val df = Seq.empty[(Long, Long)].toDF("v", "c")
    val got = DistributedRank.prefixSum(df, Nil, Seq(col("v")),
      Seq("c" -> "cum"), inclusive = true)
    assert(got.count() == 0L)
    val p = DistributedRank.prepare(df, Nil, Seq(col("v")), Seq("c"))
    assert(p.total(0) == 0L)
  }

  test("prefixMax == running-max window twin; exclusive first row reports the MinValue sentinel") {
    // non-monotone values so the running max actually moves and stalls;
    // negatives included so 0 is not an accidental identity
    val df = (1 to 150)
      .map(i => (i.toLong, ((i * 53) % 97 - 48).toLong)).toDF("k", "v")
    val w = Window.orderBy("k")
    val twinIncl = df.withColumn("m", max(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val gotIncl = DistributedRank.prefixMax(df, Nil, Seq(col("k")),
        Seq("v" -> "m"), inclusive = true, partitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(gotIncl == twinIncl)
    val twinExcl = df.withColumn("m", max(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).toSet
    val gotExcl = DistributedRank.prefixMax(df, Nil, Seq(col("k")),
        Seq("v" -> "m"), inclusive = false, partitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(gotExcl == twinExcl,
      "exclusive prefixMax must equal the 1-PRECEDING window with NULL -> MinValue")
  }

  test("keyed prefixMax: per-key running max with a hot key spanning partitions") {
    val df = (1 to 120).map { i =>
      val key = if (i % 4 == 0) "cold" else "hot" // 3:1 skew
      (key, i.toLong, ((i * 31) % 59).toLong)
    }.toDF("g", "k", "v")
    val w = Window.partitionBy("g").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, 0)
    val twin = df.withColumn("m", max(col("v")).over(w))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val got = DistributedRank.prefixMax(df, Seq("g"), Seq(col("k")),
        Seq("v" -> "m"), inclusive = true, partitions = 9)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == twin)
  }
}
