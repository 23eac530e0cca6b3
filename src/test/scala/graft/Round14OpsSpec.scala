package graft

import graft.operators.{GraphOps, Layout, TrainingPrep}
import org.apache.spark.sql.functions._

/** Round-14 operators: Hilbert layout keys, k-core peeling, and
  * content-defined chunking. */
class Round14OpsSpec extends GraftSpec {
  import spark.implicits._

  /** Reference Hilbert xy→d (the classic bit-level walk), driver-side. */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbertKey matches the reference walk on the full 32x32 grid and is bijective") {
    val bits = 5
    val got = spark.range(1024)
      .select((col("id") % 32).as("x"), expr("id div 32").as("y"))
      .withColumn("k", Layout.hilbertKey(col("x"), col("y"), bits))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, k) =>
      assert(k == xy2d(bits, x, y), s"($x,$y): $k != ${xy2d(bits, x, y)}")
    }
    assert(got.map(_._3).sorted.toSeq == (0L until 1024L),
      "hilbert keys must be a bijection onto [0, n^2)")
  }

  test("hilbert locality: consecutive keys are always 4-adjacent cells; morton is not") {
    val bits = 5
    val cells = spark.range(1024)
      .select((col("id") % 32).as("x"), expr("id div 32").as("y"))
    val byKey = cells
      .withColumn("k", Layout.hilbertKey(col("x"), col("y"), bits))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    byKey.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"hilbert jumped: ($x1,$y1)->($x2,$y2)")
    }
    val mByKey = cells
      .withColumn("k", Layout.zValue(col("x"), col("y"), bits))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val mJumps = mByKey.sliding(2).count { case Array((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1 }
    assert(mJumps > 0, "morton should jump at quadrant seams")
  }

  test("withHilbertKey (projection-per-level) == hilbertKey (single Column)") {
    val cells = spark.range(1024)
      .select((col("id") % 32).as("x"), expr("id div 32").as("y"))
    val a = Layout.withHilbertKey(cells, col("x"), col("y"), "k", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = cells.withColumn("k", Layout.hilbertKey(col("x"), col("y"), 5))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b, "the two forms must agree cell-for-cell")
  }

  test("kCore: hand graph peels the tail, keeps the clique, converges") {
    // K4 clique {1,2,3,4} + a pendant path 4-5-6: the 3-core is exactly
    // the clique (peeling 6 drops 5's degree to 1, then 5 drops)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = GraphOps.kCore(edges, k = 3, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
    // k larger than any degree -> empty core
    assert(GraphOps.kCore(edges, k = 5, rounds = 5).count() == 0L)
  }

  test("kCore on the register's trade graph: 8 rounds == 10 rounds (fixpoint reached)") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val or = spark.read.parquet(s"$sf001/orders.parquet")
    val edges = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (lit(1000000L) + col("l_suppkey")).as("dst"))
    val r8 = GraphOps.kCore(edges, k = 3, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r10 = GraphOps.kCore(edges, k = 3, rounds = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r8 == r10, "the register's 8 peel rounds must be a fixpoint")
    assert(r8.nonEmpty)
    // every surviving node really has core degree >= k
    assert(r8.forall(_._2 >= 3L))
  }

  test("cdcChunks: boundaries are content-defined — an inserted prefix " +
      "shifts only the first chunk, fixed windows shift everything") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu one two three four"
    val docs = Seq((1L, base), (2L, "INSERTED " + base))
      .toDF("doc_id", "text")
    val ch = TrainingPrep.cdcChunks(docs, divisor = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val h1 = ch.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val h2 = ch.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    assert(h1.nonEmpty && h2.nonEmpty)
    // all but the edited first chunk re-align: the tail chunk sequences
    // must share a long common suffix (the CDC property)
    val common = h1.reverse.zip(h2.reverse).takeWhile { case (a, b) => a == b }
    assert(common.length >= h1.length - 2,
      s"CDC must re-align after the edit: ${h1.toSeq} vs ${h2.toSeq}")
    assert(h1.toSeq != h2.toSeq, "the edited chunk itself must differ")
  }

  test("cdcChunks covers every word exactly once, in order") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(50)
    val nWords = docs.select(sum(size(split(col("text"), " "))))
      .head().getLong(0)
    val ch = TrainingPrep.cdcChunks(docs, divisor = 8)
    assert(ch.agg(sum("n_words")).head().getLong(0) == nWords,
      "chunk word counts must partition the corpus")
    // per-doc chunk indexes are contiguous from 0
    val idx = ch.groupBy("doc_id")
      .agg(min("chunk_idx").as("mn"), max("chunk_idx").as("mx"),
        count(lit(1)).as("c"))
      .where(col("mn") =!= 0L || col("mx") =!= col("c") - 1)
    assert(idx.count() == 0L, "chunk_idx must be dense per doc")
  }

  test("absorbingSteps: a dead-end state is NULL and contributes nothing upstream") {
    import graft.operators.EventOps
    // u1: view -> purchase; u2: view -> signup (journey dies at signup,
    // which has NO outgoing transitions). view's truncated expectation
    // must count only the absorbing branch: 1 + 0.5·0 = 1.0 — NOT 1.5
    // (which would treat the dead end as absorbing one step later).
    val events = Seq(
      (1L, 1L, 1L, "view"), (2L, 2L, 1L, "purchase"),
      (3L, 1L, 2L, "view"), (4L, 2L, 2L, "signup"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.absorbingSteps(events).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(2)))).toMap
    assert(got("signup").isEmpty, s"dead end must be NULL: $got")
    assert(got("view").contains(1.0),
      s"dead-end branch must contribute zero upstream: $got")
  }

  test("conversionAttribution rejects the all-direct case (undefined shares)") {
    import graft.operators.EventOps
    // only journeys: direct purchase, and a channel that never converts
    // -> removing any channel changes nothing; shares would be 0/0
    val events = Seq(
      (1L, 1L, 1L, "purchase"), (2L, 1L, 2L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val e = intercept[IllegalArgumentException] {
      EventOps.conversionAttribution(events).collect()
    }
    assert(e.getMessage.contains("direct"), e.getMessage)
  }

  test("conversionAttribution: hand journeys give the closed-form removal effects") {
    import graft.operators.EventOps
    // u1: click -> purchase (converts through click); u2: view (dies).
    // Chain: START->click .5, START->view .5; click->CONV 1; view->NULL.
    // Baseline B = .5; removing click kills all conversion (re = 1.0),
    // removing view changes nothing (re = 0) -> attribution 1.0 / 0.0.
    val events = Seq(
      (1L, 1L, 1L, "click"), (2L, 2L, 1L, "purchase"),
      (3L, 1L, 2L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.conversionAttribution(events)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == Set("click", "view"))
    assert(got("click") == ((0.5, 1.0, 1.0)), s"click: ${got("click")}")
    assert(got("view") == ((0.5, 0.0, 0.0)), s"view: ${got("view")}")
  }

  test("conversionAttribution: journeys truncate at the FIRST purchase") {
    import graft.operators.EventOps
    // everything after u1's first purchase must be invisible: the
    // trailing 'error' may not create an error channel row
    val events = Seq(
      (1L, 1L, 1L, "click"), (2L, 2L, 1L, "purchase"),
      (3L, 3L, 1L, "error"), (4L, 4L, 1L, "purchase"),
      (5L, 1L, 2L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val rows = EventOps.conversionAttribution(events).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("click"),
      "post-conversion events must not register as channels")
  }

  test("holtWinters: a constant series fits exactly (zero error, flat state)") {
    import graft.operators.EventOps
    // 3 events per day for 21 days -> level = 3, trend = seasonal = 0,
    // one-step-ahead error exactly 0 from day 8 on (integer midpoint
    // updates are exact on the constant path)
    val dayNs = 86400L * 1000000000L
    val events = (for (d <- 0 until 21; k <- 0 until 3)
      yield (d * 3L + k, d * dayNs + k * 1000L, 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.holtWinters(events).collect()
    assert(got.length == 14, s"rows from day 8 through 21: ${got.length}")
    got.foreach { r =>
      assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 3.0, s"fit/level: $r")
      assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0, s"trend/seasonal: $r")
      assert(r.getDouble(6) == 0.0, s"constant series must have zero error: $r")
    }
  }

  test("holtWinters: weekly season + linear trend are learned (errors shrink)") {
    import graft.operators.EventOps
    val dayNs = 86400L * 1000000000L
    // weekday pattern PLUS a weekly step (the cold start has zero
    // trend, so the early one-step errors are real and must shrink as
    // the trend state converges; a season-only fixture is already
    // solved exactly by the week-1 residual init)
    val events = (for (d <- 0 until 56; k <- 0 until (d % 7 + 1 + d / 7))
      yield (d * 100L + k, d * dayNs + k * 1000L, 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.holtWinters(events).collect()
      .map(r => r.getLong(0) -> r.getDouble(6)).sortBy(_._1)
    val firstWeek = got.take(7).map(_._2).sum
    val lastWeek = got.takeRight(7).map(_._2).sum
    assert(firstWeek > 0.0, "cold-start errors must be nonzero here")
    assert(lastWeek < firstWeek / 2.0,
      s"trend must be learned: first=$firstWeek last=$lastWeek")
  }

  test("seasonalDecompose: components add back to the series; a pure weekly " +
      "pattern lands in seasonal with ~zero remainder") {
    import graft.operators.EventOps
    val dayNs = 86400L * 1000000000L
    val events = (for (d <- 0 until 28; k <- 0 until (d % 7 + 2))
      yield (d * 100L + k, d * dayNs + k * 1000L, 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val rows = EventOps.seasonalDecompose(events).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 22, s"interior days: ${rows.length}")
    rows.foreach { case (n, t, s0, rem) =>
      // identity holds exactly in quantized space; displayed columns are
      // each rounded once, so the sum re-lands within 3 display quanta
      assert(math.abs(t + s0 + rem - n) <= 3e-6, s"identity: $n vs ${t + s0 + rem}")
    }
    // the ±3-centered MA of a 7-periodic series is the constant mean, so
    // the weekly pattern sits in seasonal and remainders stay tiny
    assert(rows.map(_._4).map(math.abs).max < 1.0,
      s"remainder should be small: ${rows.map(_._4).toSeq}")
    val seasonalSpread = rows.map(_._3).max - rows.map(_._3).min
    assert(seasonalSpread > 4.0, s"weekly amplitude must appear: $seasonalSpread")
  }

  test("scd2Apply: versions chain correctly and re-applying a batch is idempotent") {
    import graft.operators.Incremental
    val dim = Seq((1L, "A", 1L, Option.empty[Long], true),
      (2L, "B", 1L, Option.empty[Long], true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val staged = Seq((1L, "A"), (2L, "B2"), (3L, "C")).toDF("k", "seg")
    val v2 = Incremental.scd2Apply(dim, staged, Seq("k"), batchId = 2L)
      .localCheckpoint()
    val rows = v2.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(rows == Set(
      (1L, "A", 1L, -1L, true),   // unchanged: untouched
      (2L, "B", 1L, 2L, false),   // changed: closed at batch 2
      (2L, "B2", 2L, -1L, true),  // ... and re-opened
      (3L, "C", 2L, -1L, true)),  // new key opened
      s"got $rows")
    // idempotence: the same snapshot at batch 3 changes nothing
    val v3 = Incremental.scd2Apply(v2, staged, Seq("k"), batchId = 3L)
    assert(v3.collect().map(_.toSeq).toSet ==
      v2.collect().map(_.toSeq).toSet, "re-apply must be a no-op")
    // a delete closes without reopening
    val v4 = Incremental.scd2Apply(v2, staged.where(col("k") =!= 3L),
      Seq("k"), batchId = 4L)
    val k3 = v4.where(col("k") === 3L).collect()
      .map(r => (r.getLong(2), r.isNullAt(3), r.getBoolean(4))).toSet
    assert(k3 == Set((2L, false, false)), s"delete must close k=3: $k3")
  }

  test("cdcDedupSavings: duplicated docs are fully redundant at chunk level") {
    val docs = Seq((1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")
    val r = TrainingPrep.cdcDedupSavings(docs, divisor = 4).head()
    assert(r.getLong(0) == 2 * r.getLong(1), "every chunk appears twice")
    assert(r.getLong(2) == 2 * r.getLong(3))
    assert(r.getDouble(4) == 0.5, s"savings must be exactly half: $r")
  }
}
