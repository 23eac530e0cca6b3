package graft

import graft.operators.TopK
import graft.sources.TableWriters
import graft.streaming.EventsStream
import java.nio.file.Files
import org.apache.spark.sql.functions._

class WritersSpec extends GraftSpec {
  import spark.implicits._

  test("partitioned parquet round-trip + partition pruning in the plan") {
    val out = Files.createTempDirectory("writers").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("y", year(col("o_orderdate")))
    TableWriters.parquetPartitioned(orders, s"$out/orders_by_year", Seq("y"))
    val back = TableWriters.readParquet(spark, s"$out/orders_by_year")
    assert(back.count() == orders.count())
    val pruned = back.where(col("y") === 1997)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("1997"), scan)
    assert(pruned.count() ==
      orders.where(year(col("o_orderdate")) === 1997).count())
  }

  test("csv and json round-trips preserve values") {
    val out = Files.createTempDirectory("writers2").toString
    val nation = spark.read.parquet(s"$sf0001/nation.parquet")
    TableWriters.csv(nation, s"$out/nation_csv")
    TableWriters.json(nation, s"$out/nation_json")
    val fromCsv = TableWriters.readCsv(spark, s"$out/nation_csv")
      .select(col("n_nationkey").cast("int"), col("n_name"), col("n_regionkey").cast("int"))
    val fromJson = TableWriters.readJson(spark, s"$out/nation_json")
      .select(col("n_nationkey").cast("int"), col("n_name"), col("n_regionkey").cast("int"))
    val want = nation.collect().map(_.toSeq).toSet
    assert(fromCsv.collect().map(_.toSeq).toSet == want)
    assert(fromJson.collect().map(_.toSeq).toSet == want)
  }

  test("orc round-trip preserves values and schema") {
    val out = Files.createTempDirectory("writers_orc").toString + "/nation_orc"
    val nation = spark.read.parquet(s"$sf0001/nation.parquet")
    nation.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == nation.schema)
    assert(back.collect().map(_.toSeq).toSet == nation.collect().map(_.toSeq).toSet)
    // predicate pushdown + column pruning reach the ORC stripe reader —
    // what qualifies ORC inputs for the hot path (vs CSV/JSON)
    val plan = back.where(col("n_nationkey") === 7).select("n_name")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,7)]"), plan)
    assert(plan.contains("ReadSchema: struct<n_nationkey:int,n_name:string>"), plan)
  }

  test("keyed upsert rewrites only touched partitions, last-writer-wins") {
    val out = Files.createTempDirectory("writers3").toString + "/t"
    val base = Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 20), (4L, "d", 20))
      .toDF("k", "v", "p")
    TableWriters.parquetPartitioned(base, out, Seq("p"))
    def filesIn(p: Int) = new java.io.File(s"$out/p=$p").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val before20 = filesIn(20)
    // update key 1 (existing), insert key 9 — both in partition 10 only
    val updates = Seq((1L, "A2", 10), (9L, "z", 10)).toDF("k", "v", "p")
    TableWriters.upsertParquet(spark, out, updates, Seq("k"), Seq("p"))
    val back = spark.read.parquet(out)
    assert(back.count() == 5)
    assert(back.where(col("k") === 1).select("v").as[String].head() == "A2")
    assert(back.where(col("k") === 9).count() == 1)
    assert(back.where(col("p") === 20).count() == 2)
    // untouched partition's files were not rewritten
    assert(filesIn(20) == before20)

    // duplicate keys within one update batch: deterministic winner
    // (lexicographically smallest row), stable across replays
    val dup = Seq((2L, "B9", 10), (2L, "B1", 10)).toDF("k", "v", "p")
    TableWriters.upsertParquet(spark, out, dup, Seq("k"), Seq("p"))
    val v1 = spark.read.parquet(out).where(col("k") === 2).select("v").as[String].head()
    TableWriters.upsertParquet(spark, out, dup, Seq("k"), Seq("p"))
    val v2 = spark.read.parquet(out).where(col("k") === 2).select("v").as[String].head()
    assert(v1 == "B1" && v2 == "B1")
    assert(spark.read.parquet(out).where(col("k") === 2).count() == 1)
  }

  test("stale staging leftovers are swept (age-gated) and never corrupt an upsert") {
    val root = Files.createTempDirectory("writers5")
    val out = root.toString + "/t"
    val base = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "p")
    TableWriters.parquetPartitioned(base, out, Seq("p"))
    // a crashed predecessor's staging dir with garbage partition data,
    // old enough to clear the sweep's age gate
    val stale = new java.io.File(root.toFile, ".t.staging-deadbeef")
    new java.io.File(stale, "p=10").mkdirs()
    Files.write(stale.toPath.resolve("p=10/part-junk.parquet"), Array[Byte](1, 2))
    stale.setLastModified(System.currentTimeMillis() - 2 * TableWriters.StagingSweepAgeMs)
    // a FRESH staging dir (a concurrent writer's, if the single-writer
    // contract were violated) must SURVIVE the sweep
    val live = new java.io.File(root.toFile, ".t.staging-11112222-3333-4444-5555-666677778888")
    live.mkdirs()
    TableWriters.upsertParquet(spark, out,
      Seq((1L, "a2", 10)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    assert(!stale.exists(), "stale staging dir must be swept")
    assert(live.exists(), "fresh staging dir must survive the age-gated sweep")
    live.delete()
    assert(root.toFile.listFiles().map(_.getName).toSet == Set("t"),
      "no staging residue after a successful swap")
    val back = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(back == Map(1L -> "a2", 2L -> "b"))
  }

  test("crash between aside-rename and swap-in: old partition restored, replay converges") {
    val root = Files.createTempDirectory("writers6")
    val out = root.toString + "/t"
    val base = Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 20)).toDF("k", "v", "p")
    TableWriters.parquetPartitioned(base, out, Seq("p"))
    // manufacture the exact on-disk state of a writer killed between the
    // aside rename and the swap-in of partition p=10: the old partition
    // lives only under its aside name, the replacement only in staging
    val txn = java.util.UUID.randomUUID().toString
    val old10 = new java.io.File(s"$out/p=10")
    val aside = new java.io.File(s"$out/.graft-old-$txn-p=10")
    assert(old10.renameTo(aside))
    val staging = s"$root/.t.staging-$txn"
    Seq((1L, "A2", 10), (9L, "z", 10)).toDF("k", "v", "p")
      .write.partitionBy("p").parquet(staging)
    // the table still READS complete-old for every present partition, and
    // recovery restores the absent one from its aside before any merge runs
    TableWriters.upsertParquet(spark, out,
      Seq((1L, "A2", 10), (9L, "z", 10)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    val back = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(back == Map(1L -> "A2", 2L -> "b", 3L -> "c", 9L -> "z"),
      s"pre-merge row k=2 must survive the crash+replay, got $back")
    assert(!aside.exists(), "aside healed away")
    // replaying the SAME upsert converges (idempotent)
    TableWriters.upsertParquet(spark, out,
      Seq((1L, "A2", 10), (9L, "z", 10)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    val again = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(again == back)
  }

  test("crash after swap-in before aside delete: superseded aside cleaned, new data kept") {
    val root = Files.createTempDirectory("writers7")
    val out = root.toString + "/t"
    val base = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "p")
    TableWriters.parquetPartitioned(base, out, Seq("p"))
    TableWriters.upsertParquet(spark, out,
      Seq((1L, "a2", 10)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    // manufacture a crash AFTER p=10's swap-in: the superseded old copy
    // still sits under its aside name next to the committed new partition
    val txn = java.util.UUID.randomUUID().toString
    val aside = new java.io.File(s"$out/.graft-old-$txn-p=10")
    new java.io.File(aside, "x").mkdirs()
    Files.write(aside.toPath.resolve("x/part-old.parquet"), Array[Byte](9))
    TableWriters.recoverPartitionedTable(spark, out, Seq("p"))
    assert(!aside.exists(), "superseded aside must be deleted, not restored")
    val back = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(back == Map(1L -> "a2", 2L -> "b"))
  }

  test("recovery does not touch sibling tables' asides") {
    val root = Files.createTempDirectory("writers8")
    val out = root.toString + "/t"
    val base = Seq((1L, "a", 10)).toDF("k", "v", "p")
    TableWriters.parquetPartitioned(base, out, Seq("p"))
    // a sibling table's root-level aside in the same parent dir
    val txn = java.util.UUID.randomUUID().toString
    val other = new java.io.File(root.toFile, s".graft-old-$txn-other_table")
    other.mkdirs()
    TableWriters.recoverPartitionedTable(spark, out, Seq("p"))
    assert(other.exists(), "another table's aside is not ours to heal")
  }

  test("compaction shrinks file count, preserves content and partitioning") {
    val out = Files.createTempDirectory("writers4").toString + "/t"
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("y", year(col("o_orderdate")))
    // simulate many small incremental appends
    (1 to 5).foreach { _ =>
      orders.repartition(8).write.mode("append").partitionBy("y").parquet(out)
    }
    def nFiles = new java.io.File(out).listFiles().filter(_.getName.startsWith("y="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    val before = nFiles
    val wantCnt = spark.read.parquet(out).count()
    val wantSum = spark.read.parquet(out).agg(sum("o_orderkey")).as[Long].head()
    TableWriters.compactParquet(spark, out, Seq("y"))
    assert(nFiles < before, s"$nFiles vs $before")
    assert(spark.read.parquet(out).count() == wantCnt)
    assert(spark.read.parquet(out).agg(sum("o_orderkey")).as[Long].head() == wantSum)
    val scan = spark.read.parquet(out).where(col("y") === 1997)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)

    // predicate-scoped compaction: untouched partitions keep their files
    (1 to 3).foreach { _ =>
      orders.where(col("y") === 1996).repartition(6)
        .write.mode("append").partitionBy("y").parquet(out)
    }
    def filesIn(y: Int) = new java.io.File(s"$out/y=$y").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val f1997 = filesIn(1997)
    val n1996 = filesIn(1996).size
    TableWriters.compactParquet(spark, out, Seq("y"),
      partitionPredicate = Some(col("y") === 1996))
    assert(filesIn(1996).size < n1996)
    assert(filesIn(1997) == f1997)
    assert(spark.read.parquet(out).count() == wantCnt + 3 * orders.where(col("y") === 1996).count())
  }

  test("typed top-k aggregator matches the window-function answer") {
    val ev = graft.queries.Tables.events(spark, sf0001)
    val byAgg = ev.select(col("user_id"), col("value"), col("event_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TopK.topKByScore(3).toColumn.name("top3"))
      .collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val byWindow = ev.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .groupBy("user_id").agg(collect_list("event_id").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(byAgg.keySet == byWindow.keySet)
    byAgg.foreach { case (u, ids) => assert(ids == byWindow(u), s"user $u") }
  }

  test("stream-stream interval join: purchases enriched with preceding clicks") {
    val stream = EventsStream.readEvents(spark, sf0001)
    val got = EventsStream.runToMemory(spark,
      EventsStream.purchaseClickJoin(stream), "ssjoin")
    assert(got.count() > 0)
    // every joined row respects the interval bound
    val bad = got.where(col("cts") > col("pts") ||
      col("cts") < col("pts") - expr("INTERVAL 1 HOUR")).count()
    assert(bad == 0)
    // batch twin on the same µs precision the stream uses
    val evl = graft.queries.Tables.events(spark, sf0001)
      .withColumn("tus", expr("ts div 1000"))
    val p = evl.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("tus").as("pts"))
    val c = evl.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("cid"), col("tus").as("cts"))
    val batchN = p.join(c, col("user_id") === col("cu") &&
      col("cts") <= col("pts") &&
      col("cts") >= col("pts") - lit(3600L * 1000000L)).count()
    assert(got.count() == batchN)
  }
}
