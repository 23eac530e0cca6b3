package graft

import graft.operators.{EventOps, Profiling, QualityClassifier, Ranking, Sketches, TextAnalysis, TrainingPrep}
import org.apache.spark.sql.functions._

/** Behavioral checks for the statistical-analysis operators (χ² feature
  * selection, KS drift) on planted frames — the DuckDB oracle rows
  * (q200/q201) prove cross-engine equivalence; these prove the
  * statistics behave as the definitions demand. */
class StatsOpsSpec extends GraftSpec {
  import spark.implicits._

  test("chi2: a perfectly label-separating token dominates; universal tokens are excluded") {
    val docs = Seq(
      (1L, "alpha zz common", 1L), (2L, "beta zz common", 1L),
      (3L, "gamma zz common", 1L), (4L, "delta common", 0L),
      (5L, "epsilon common", 0L), (6L, "zeta common", 0L))
      .toDF("doc_id", "text", "y")
    val out = TrainingPrep.chiSquaredTokens(docs, col("y") === 1L, topK = 10)
      .collect()
    assert(out.head.getString(0) == "zz", "separator token must rank first")
    assert(out.head.getDouble(3) == 6.0, "perfect 3/3-vs-0/3 split: chi2 = N")
    assert(!out.map(_.getString(0)).contains("common"),
      "a token in every doc has an empty complement cell and is excluded")
  }

  test("chi2: independent token scores zero") {
    val docs = Seq(
      (1L, "tok filler1", 1L), (2L, "tok filler2", 0L),
      (3L, "other filler3", 1L), (4L, "other filler4", 0L))
      .toDF("doc_id", "text", "y")
    val row = TrainingPrep.chiSquaredTokens(docs, col("y") === 1L, topK = 10)
      .where(col("token") === "tok").collect().head
    assert(row.getDouble(3) == 0.0, "balanced 1/1-vs-1/1 token: chi2 = 0")
  }

  test("ksDrift: identical distributions give D = 0") {
    val df = (1 to 50).flatMap(v => Seq((v.toLong, 0L), (v.toLong, 1L)))
      .toDF("x", "g")
    val d = Profiling.ksDrift(df, "x", col("g") === 1L).collect().head
    assert(d.getAs[Double]("d_stat") == 0.0)
  }

  test("ksDrift: disjoint supports give D = 1 at the boundary value") {
    val df = ((1 to 30).map(v => (v.toLong, 1L)) ++
      (31 to 60).map(v => (v.toLong, 0L))).toDF("x", "g")
    val d = Profiling.ksDrift(df, "x", col("g") === 1L).collect().head
    assert(d.getAs[Double]("d_stat") == 1.0)
    assert(d.getAs[Long]("at_value") == 30L,
      "max ECDF gap sits at the end of group 1's support")
  }

  test("wilsonIntervals: interval brackets the rate and respects [0, 1]") {
    val rates = Seq((0L, 100L, 30L, 0.3), (1L, 10L, 0L, 0.0))
      .toDF("variant", "n", "k", "rate")
    val out = EventOps.wilsonIntervals(rates).collect()
      .map(r => r.getLong(0) -> r).toMap
    val v0 = out(0L)
    assert(v0.getAs[Double]("lo95") < 0.3 && v0.getAs[Double]("hi95") > 0.3)
    val v1 = out(1L)
    assert(v1.getAs[Double]("lo95") == 0.0,
      "k = 0 pins the lower bound at 0")
    assert(v1.getAs[Double]("hi95") > 0.0 && v1.getAs[Double]("hi95") < 0.5,
      "Wilson upper bound stays informative at k = 0 where the normal CI collapses")
  }

  test("retrievalEval: a corpus where BM25 finds the graded docs scores ndcg 1") {
    // rel-3 doc, rel-1 doc, noise: BM25 orders them exactly like the
    // ideal rel ordering, so NDCG@10 = 1 and the top hit is relevant
    val docs = (Seq(
      (1L, "spark window vector spark window vector filler"),
      (2L, "spark only here with plain filler words now")) ++
      (3L to 30L).map(i => (i, s"noise$i padding$i words$i here$i")))
      .toDF("doc_id", "text")
    val r = TrainingPrep.retrievalEval(docs,
      Seq("spark", "window", "vector"), atK = 10).collect().head
    assert(r.getAs[Double]("ndcg_at_k") == 1.0)
    assert(r.getAs[Double]("mrr") == 1.0)
    assert(r.getAs[Long]("first_rel") == 1L)
  }

  test("silhouette: tight separated blobs score near 1") {
    // two blobs far apart in 64-dim space, tiny within-blob jitter
    val mk = (base: Float, id: Long) =>
      (id, Array.tabulate(64)(j => base + (id % 3) * 0.001f + j * 0.0f), "x")
    val emb = ((0L to 9L).map(i => mk(0.0f, i)) ++
      (10L to 19L).map(i => mk(5.0f, i)))
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Clustering.silhouette(emb, k = 2, iters = 3)
      .collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getAs[Double]("mean_silhouette") > 0.95,
      s"tight blobs must approach 1, got $r"))
  }

  test("fleschReadingEase: short common words read easier than long latinate ones") {
    import graft.operators.TextAnalysis.fleschReadingEase
    val df = Seq(
      (1L, "the cat sat. the dog ran."),
      (2L, "incomprehensibility characterizes bureaucratization methodologies."))
      .toDF("id", "text")
      .select(col("id"), fleschReadingEase(col("text")).as("f")).collect()
    val byId = df.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(1L) > byId(2L),
      "simple prose must outscore polysyllabic prose")
  }

  test("rollingZScore: a planted spike scores high against its trailing baseline") {
    val day = 86400L * 1000000000L
    // baseline alternates 9/11 (mean 10, var 1); day 25 spikes to 50
    val evs = (0 until 30).flatMap { dd =>
      val c = if (dd == 25) 50 else 9 + (dd % 2) * 2
      Seq.fill(c)(Tuple1(dd * day))
    }.toDF("ts")
    val out = EventOps.rollingZScore(evs, window = 14).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out(25L).isNullAt(3) && out(25L).getAs[Double]("z") == 40.0,
      "spike of 50 vs mean 10 / std 1")
    assert(math.abs(out(20L).getAs[Double]("z")) <= 1.1,
      "in-baseline days score ~within one sigma")
    assert(!out.contains(5L), "days without a full window are absent")
  }

  test("tfidfCosinePairs: docs sharing a rare term outrank docs sharing nothing") {
    val docs = (Seq(
      (1L, "quasar filler1 padding1"), (2L, "quasar filler2 padding2"),
      (3L, "pulsar filler3 padding3"), (4L, "nebula filler4 padding4")) ++
      (5L to 30L).map(i => (i, s"noise$i other$i words$i")))
      .toDF("doc_id", "text")
    val out = TrainingPrep.tfidfCosinePairs(docs, topK = 10, maxDf = 50)
      .collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L,
      "the quasar pair is the only shared-vocabulary pair")
  }

  test("containmentPairs: a quoted doc is contained; near-miss is not") {
    val base = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, base), // contained in 2
      (2L, s"prefix words here $base suffix words there"),
      (3L, "alpha beta gamma delta zeta")) // shares a prefix, not contained
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.containmentPairs(docs).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
  }

  test("asof forward picks the earliest at-or-after match, null when none") {
    val left = Seq((1L, 10L, "c1"), (1L, 50L, "c2")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L)).toDF("k", "ts", "pay")
    val out = graft.operators.AsofJoin
      .forward(left, right, Seq("k"), "ts", Seq("pay"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.get(r.fieldIndex("pay")))).toMap
    assert(out("c1").contains(100L), "equal ts matches inclusively")
    assert(out("c2").isEmpty, "no right row at-or-after ts=50")
  }

  test("stationaryDistribution: two-state chain converges to the closed form") {
    val day = 86400L * 1000000000L
    // user chains alternating a->b->a...: P(a->b)=1, P(b->a)=1 -> period-2;
    // use a lazy chain instead: a a a b / b b b a per user gives
    // P(a->a)=2/3, P(a->b)=1/3, P(b->b)=2/3, P(b->a)=1/3 -> pi=(1/2,1/2)
    val evs = (Seq("a", "a", "a", "b").zipWithIndex.map { case (t, i) =>
      (i.toLong, 1L, t, i * day) } ++
      Seq("b", "b", "b", "a").zipWithIndex.map { case (t, i) =>
        (10L + i, 2L, t, i * day) })
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.stationaryDistribution(evs, rounds = 50).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("prob")).toMap
    assert(math.abs(out("a") - 0.5) < 1e-3 && math.abs(out("b") - 0.5) < 1e-3)
  }

  test("theilSenTrend: immune to one flood day that bends OLS") {
    val day = 86400L * 1000000000L
    // counts 1,2,3,...,20 per day (slope 1), except day 10 floods to 500
    val evs = (0 until 20).flatMap { dd =>
      val c = if (dd == 10) 500 else dd + 1
      Seq.fill(c)(Tuple1(dd * day))
    }.toDF("ts")
    val r = EventOps.theilSenTrend(evs).collect().head
    assert(math.abs(r.getAs[Double]("slope") - 1.0) < 0.2,
      s"robust slope must stay ~1, got ${r.getAs[Double]("slope")}")
  }

  test("vocabJaccard: identical vocab 1.0, disjoint vocab pair absent") {
    val docs = Seq((1L, "s1", "a b c"), (2L, "s2", "a b c"),
      (3L, "s3", "x y z")).toDF("doc_id", "source", "text")
    val out = TrainingPrep.vocabJaccard(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("jaccard")).toMap
    assert(out(("s1", "s2")) == 1.0)
    assert(!out.contains(("s1", "s3")),
      "zero-overlap pairs emit no row by the inner join")
  }

  test("anisotropyProfile: identical vectors ratio 1, symmetric pair ratio 0") {
    val one = Array.fill(64)(0.5f)
    val neg = one.map(-_)
    val emb = (Seq.fill(5)(("same", one)) ++
      Seq(("sym", one), ("sym", neg))).zipWithIndex
      .map { case ((l, v), i) => (i.toLong, v, l) }
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.anisotropyProfile(emb)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("anisotropy")).toMap
    assert(out("same") == 1.0)
    assert(out("sym") == 0.0)
  }

  test("crossPerplexity: the matching model wins its own slice (diagonal minimum)") {
    val docs = ((1L to 20L).map(i => (i, "aa", "red blue green red blue")) ++
      (21L to 40L).map(i => (i, "bb", "vert bleu rouge vert bleu")))
      .toDF("doc_id", "lang", "text")
    val out = TrainingPrep.crossPerplexity(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("bits_per_tok")).toMap
    assert(out(("aa", "aa")) < out(("aa", "bb")))
    assert(out(("bb", "bb")) < out(("bb", "aa")))
  }

  test("rollingActiveUsers: window accumulates then forgets") {
    val day = 86400L * 1000000000L
    // user 1 on day 0 only; user 2 on day 10 only
    val evs = Seq((1L, 1L, 0L), (2L, 2L, 10L * day))
      .toDF("event_id", "user_id", "ts")
    val out = EventOps.rollingActiveUsers(evs, windowDays = 7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 1L && out(6L) == 1L, "user 1 counts for 7 days")
    assert(!out.contains(7L), "days with an empty window emit nothing")
    assert(out(10L) == 1L)
  }

  test("kaplanMeier: textbook hand-computed curve with censoring") {
    val day = 86400L * 1000000000L
    // u1: view d0, purchase d1 (event at 1). u2: view d0, last seen d2
    // (censored at 2). u3: view d0, purchase d3 (event at 3).
    val evs = Seq(
      (1L, 1L, "view", 0L), (2L, 1L, "purchase", 1L * day),
      (3L, 2L, "view", 0L), (4L, 2L, "click", 2L * day),
      (5L, 3L, "view", 0L), (6L, 3L, "purchase", 3L * day))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.kaplanMeier(evs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // d1: risk 3, 1 event -> S = 2/3; d2: censored only -> S stays 2/3;
    // d3: risk 1, 1 event -> S = 0 (absorbing)
    assert(out(1L).getAs[Long]("n_risk") == 3L)
    assert(math.abs(out(1L).getAs[Double]("survival") - 2.0 / 3.0) < 1e-6)
    assert(math.abs(out(2L).getAs[Double]("survival") - 2.0 / 3.0) < 1e-6)
    assert(out(3L).getAs[Double]("survival") == 0.0)
  }

  test("weightedQuantiles: weight mass relocates the median away from the row median") {
    // 9 rows of x=10 with weight 1, 1 row of x=100 with weight 91
    val df = ((1 to 9).map(_ => ("g", 10L, 1L)) :+ (("g", 100L, 91L)))
      .toDF("g", "x", "w")
    val r = Profiling.weightedQuantiles(df, "g", "x", "w", Seq(0.5))
      .collect().head
    assert(r.getAs[Long]("total_weight") == 100L)
    assert(r.getAs[Long]("wp50") == 100L,
      "91% of the weight sits at x=100, so the weighted median is 100")
  }

  test("gainsTable: a perfect scorer captures all positives in the top deciles") {
    val scored = (1L to 100L).map(i =>
      (i, if (i <= 20) 1L else 0L, 1.0 - i.toDouble / 100.0))
      .toDF("doc_id", "y", "score")
    val out = Profiling.gainsTable(scored).collect()
    assert(out.length == 10)
    assert(out.head.getAs[Double]("rate") == 1.0)
    assert(out(1).getAs[Double]("cum_capture") == 1.0,
      "all 20 positives live in deciles 1-2")
    assert(out.map(_.getAs[Long]("n")).forall(_ == 10L))
  }

  test("sourceSignatures: a source-exclusive heavy term tops its source") {
    val docs = ((1L to 10L).map(i => (i, "sA", "quark quark shared words")) ++
      (11L to 20L).map(i => (i, "sB", "gluon shared words here")))
      .toDF("doc_id", "source", "text")
    val out = TrainingPrep.sourceSignatures(docs, perSource = 2).collect()
    val top = out.filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(top("sA") == "quark" && top("sB") == "gluon")
    assert(out.filter(r => r.getString(2) == "shared")
      .forall(_.getAs[Double]("score") == 0.0),
      "a term in every source has ln(S/df) = 0")
  }

  test("stickiness and newVsReturning: identities on a planted two-week log") {
    val day = 86400L * 1000000000L
    // week 0: users 1,2 active every day of a 7-day span; week 1: user 1 only, 1 day
    val evs = ((0 until 7).flatMap(dd => Seq((1L, dd * day), (2L, dd * day))) ++
      Seq((1L, 7L * day)))
      .zipWithIndex.map { case ((u, ts), i) => (i.toLong, u, ts) }
      .toDF("event_id", "user_id", "ts")
    val st = EventOps.stickiness(evs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(st(0L).getAs[Long]("wau") == 2L)
    assert(st(0L).getAs[Double]("stickiness") == 1.0,
      "both users active all 7 days")
    val nr = EventOps.newVsReturning(evs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(nr(0L).getAs[Long]("new_users") == 2L)
    assert(nr(1L).getAs[Long]("returning_users") == 1L &&
      nr(1L).getAs[Long]("new_users") == 0L)
  }

  test("cohenKappa: perfect agreement is 1; independent raters near 0") {
    val perfect = (1 to 100).map(i => (s"l${i % 4}", s"l${i % 4}"))
      .toDF("a", "b")
    assert(Profiling.cohenKappa(perfect, col("a"), col("b"))
      .collect().head.getAs[Double]("kappa") == 1.0)
    val indep = (0 until 400).map(i => (s"l${i % 2}", s"l${(i / 2) % 2}"))
      .toDF("a", "b")
    val k = Profiling.cohenKappa(indep, col("a"), col("b"))
      .collect().head.getAs[Double]("kappa")
    assert(math.abs(k) < 1e-9, s"chance-level agreement must score ~0, got $k")
  }

  test("cooccurrencePairs: planted always-together pair tops the list with max lift") {
    val rows = (1L to 30L).flatMap(g => Seq((g, "x"), (g, "y"))) ++
      (1L to 30L).map(g => (g, s"z${g % 10}"))
    val out = Ranking.cooccurrencePairs(rows.toDF("g", "i"),
      col("g"), col("i"), topK = 5).collect()
    assert(out.head.getString(0) == "x" && out.head.getString(1) == "y")
    assert(out.head.getAs[Long]("n_ab") == 30L)
    assert(out.head.getAs[Double]("lift") == 1.0,
      "x and y are in every basket: lift exactly 1")
  }

  test("jsDivergenceMatrix: identical sources diverge 0, disjoint sources ln 2") {
    val docs = ((1L to 10L).map(i => (i, "s1", "alpha beta gamma")) ++
      (11L to 20L).map(i => (i, "s2", "alpha beta gamma")) ++
      (21L to 30L).map(i => (i, "s3", "delta epsilon zeta")))
      .toDF("doc_id", "source", "text")
    val out = TrainingPrep.jsDivergenceMatrix(docs, vocabK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("js")).toMap
    assert(out(("s1", "s2")) == 0.0)
    assert(math.abs(out(("s1", "s3")) - math.log(2.0)) < 1e-3,
      "disjoint supports hit the JS upper bound ln 2")
  }

  test("touchAttribution: last-touch window expires to direct; first-touch sticks") {
    val day = 86400L * 1000000000L
    val evs = Seq(
      // user 1: view then purchase next day -> last=view, first=view
      (1L, 1L, "view", 0.0, 0L), (2L, 1L, "purchase", 50.0, day),
      // user 2: click, then purchase 30 days later -> last=direct, first=click
      (3L, 2L, "click", 0.0, 0L), (4L, 2L, "purchase", 20.0, 30L * day))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = EventOps.touchAttribution(evs, windowNs = 7L * day)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("conversions"), r.getAs[Long]("cents"))).toMap
    assert(out(("last_touch", "view")) == ((1L, 5000L)))
    assert(out(("last_touch", "direct")) == ((1L, 2000L)))
    assert(out(("first_touch", "view")) == ((1L, 5000L)))
    assert(out(("first_touch", "click")) == ((1L, 2000L)))
  }

  test("charEntropy: closed-form values on degenerate and uniform strings") {
    import graft.expressions.CharEntropy.char_entropy
    val df = Seq((1L, "aaaaaaaa"), (2L, "abababab"), (3L, "abcdabcd"))
      .toDF("id", "t")
      .select(col("id"), char_entropy(col("t")).as("h")).collect()
    val byId = df.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(1L) == 0.0)
    assert(math.abs(byId(2L) - math.log(2.0)) < 1e-12)
    assert(math.abs(byId(3L) - math.log(4.0)) < 1e-12)
  }

  test("cohortLtv: cumulative cents accumulate along age within a cohort") {
    val wk = 604800L * 1000000000L
    // user 1 joins week 0, buys 100.00 in weeks 0 and 1
    val evs = Seq(
      (1L, 0L * wk, "purchase", 100.0), (1L, 1L * wk, "purchase", 100.0),
      (2L, 0L * wk, "view", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = EventOps.cohortLtv(evs).collect()
    val byAge = out.map(r => r.getLong(1) -> r).toMap
    assert(byAge(0L).getAs[Long]("cum_cents") == 10000L)
    assert(byAge(1L).getAs[Long]("cum_cents") == 20000L)
    assert(byAge(1L).getAs[Double]("ltv_cents_per_user") == 10000.0,
      "two users in the week-0 cohort")
  }

  test("heavyHitters: shares ordered, cumulative share is monotone and consistent") {
    val df = (Seq.fill(50)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 20).map(i => s"cold$i")).toDF("k")
    val out = Profiling.heavyHitters(df, "k", topK = 5).collect()
    assert(out.head.getAs[String]("key") == "hot")
    assert(out.head.getAs[Double]("share") == 0.5)
    assert(out(1).getAs[Double]("cum_share") == 0.8)
    val cums = out.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a })
  }

  test("qlDirichlet: term-bearing docs outrank same-length term-free docs") {
    val docs = ((1L to 5L).map(i => (i, "spark makes shuffles fly fast")) ++
      (6L to 10L).map(i => (i, "plain filler words sit here idle")))
      .toDF("doc_id", "text")
    val out = TrainingPrep.qlDirichlet(docs, Seq("spark"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    (1L to 5L).foreach(i => (6L to 10L).foreach(j =>
      assert(out(i) > out(j), s"doc $i must outrank $j")))
  }

  test("winsorizedStats: one extreme outlier moves the mean, not the robust means") {
    val df = (("g", 1000000L) +: Seq.fill(99)(("g", 10L))).toDF("g", "x")
    val r = Profiling.winsorizedStats(df, "g", "x").collect().head
    assert(r.getAs[Double]("mean") > 10000.0)
    assert(r.getAs[Double]("winsorized_mean") == 10.0)
    assert(r.getAs[Double]("trimmed_mean") == 10.0)
  }

  test("degreeAssortativity: star graph is perfectly disassortative") {
    // hub 0 - leaves 1..6: every edge pairs deg 6 with deg 1 -> r = -1
    val star = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    val r = graft.operators.GraphOps.degreeAssortativity(star).collect().head
    assert(r.getAs[Long]("n_directed_edges") == 12L)
    assert(r.getAs[Double]("assortativity") == -1.0)
    // a clique is degree-regular: zero variance -> null by convention
    val k4 = (for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b))
      .toDF("src", "dst")
    assert(graft.operators.GraphOps.degreeAssortativity(k4)
      .collect().head.isNullAt(1))
  }

  test("rakeKeyphrases: multi-word phrase outscores its constituent unigrams") {
    val docs = (1L to 10L)
      .map(i => (i, "deep neural networks and the gradient descent of loss"))
      .toDF("doc_id", "text")
    val out = TrainingPrep.rakeKeyphrases(docs,
      Seq("the", "a", "of", "and", "to", "is"), topK = 10).collect()
    val byPhrase = out.map(r => r.getString(0) -> r.getAs[Double]("score")).toMap
    assert(byPhrase.contains("deep neural networks"))
    assert(byPhrase("deep neural networks") == 9.0,
      "three words, each degree 3 / freq 1")
    assert(byPhrase("deep neural networks") > byPhrase("loss"))
    assert(out.forall(_.getAs[Long]("n_occ") == 10L))
  }

  test("rrfFuse: consensus ids outrank single-list winners") {
    val l1 = Seq((10L, 0.9), (20L, 0.8), (30L, 0.7)).toDF("id", "score")
    val l2 = Seq((10L, 0.5), (40L, 0.4), (20L, 0.3)).toDF("id", "score")
    val out = Ranking.rrfFuse(Seq(l1, l2), kRrf = 60, topK = 10).collect()
    assert(out.head.getLong(0) == 10L, "rank-1 in both lists wins")
    assert(out.head.getLong(1) == 2L)
    val byId = out.map(r => r.getLong(0) -> r.getAs[Double]("rrf")).toMap
    assert(math.abs(byId(10L) - (1.0 / 61 + 1.0 / 61)) < 1e-6)
    assert(byId(20L) > byId(30L) && byId(20L) > byId(40L),
      "two mid ranks beat one good rank here")
  }

  test("cusumChangepoint: finds the planted level shift") {
    val dayNs = 86400L * 1000000000L
    // 20 days at 2/day then 20 days at 10/day: split at day 19 (t=20)
    val evs = (0 until 40).flatMap(d =>
      Seq.fill(if (d < 20) 2 else 10)(Tuple1(d * dayNs))).toDF("ts")
    val r = EventOps.cusumChangepoint(evs).collect().head
    assert(r.getAs[Long]("t") == 20L)
    assert(r.getAs[Double]("mean_before") == 2.0)
    assert(r.getAs[Double]("mean_after") == 10.0)
  }

  test("sessionLift: co-occurring types lift > 1, disjoint types absent") {
    val gap = 1800L * 1000000000L
    // users 1..10: a+b in one session; users 11..20: c alone
    val evs = ((1 to 10).flatMap(u => Seq(
      (u.toLong * 2, u.toLong, "a", 0L), (u.toLong * 2 + 1, u.toLong, "b", 1000L))) ++
      (11 to 20).map(u => (u.toLong * 100, u.toLong, "c", 0L)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.sessionLift(evs, gap).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("ta") == "a" && r.getAs[String]("tb") == "b")
    assert(r.getAs[Long]("n_sessions") == 20L)
    assert(r.getAs[Double]("lift") == 2.0, "P(ab)=.5, P(a)=P(b)=.5 -> lift 2")
  }

  test("llrCollocations: a frozen collocation outranks independent co-occurrence") {
    // "hong kong" always adjacent; "the X" spread over many continuations
    val docs = ((1 to 30).map(i => (i.toLong, "hong kong is busy today")) ++
      (31 to 60).map(i => (i.toLong, s"the w${i % 10} is busy today")))
      .toDF("doc_id", "text")
    val out = TrainingPrep.llrCollocations(docs, topK = 20, minCount = 3L)
      .collect()
    val llr = out.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Double]("llr")).toMap
    val hk = llr(("hong", "kong"))
    assert(hk > 0.0)
    // every diffuse ("the", wX) pair scores below the frozen collocation
    llr.keys.filter(_._1 == "the").foreach(p => assert(llr(p) < hk))
  }

  test("benford: 9 digit rows, fractions total 1, exp matches log10(1+1/d)") {
    val vals = (1 to 2000).map(i => Tuple1(math.pow(1.01, i)))
    val out = Profiling.benford(vals.toDF("v"), col("v")).collect()
    assert(out.length == 9)
    assert(math.abs(out.map(_.getAs[Double]("obs_frac")).sum - 1.0) < 1e-4)
    val d1 = out.find(_.getLong(0) == 1L).get
    assert(math.abs(d1.getAs[Double]("exp_frac") - 0.301030) < 1e-6)
    // 1.01^i is log-uniform: empirical fractions track Benford closely
    out.foreach(r => assert(math.abs(r.getAs[Double]("deviation")) < 0.02))
  }

  test("skyline2d: matches the brute-force dominance definition and collapses duplicates") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map(i => (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = pts.toDF("id", "x", "y")
    val got = Ranking.skyline2d(df, col("id"), col("x"), col("y"), shards = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toList
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y) }
    }.map(p => (p._2, p._3)).distinct
      .sortBy { case (x, y) => (-x, -y) }
    assert(got == brute)
  }

  test("giniConcentration: 0 for uniform, (n-1)/n for total concentration") {
    val uni = (1 to 10).map(i => ("g", 100L)).toDF("g", "v")
    assert(Ranking.giniConcentration(uni, "g", "v")
      .collect().head.getAs[Double]("gini") == 0.0)
    val conc = (Seq(("h", 1000L)) ++ Seq.fill(9)(("h", 0L))).toDF("g", "v")
    assert(Ranking.giniConcentration(conc, "g", "v")
      .collect().head.getAs[Double]("gini") == 0.9)
  }

  test("stumpSplits: partition identity holds and a separating split is found") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("y",
        (TextAnalysis.qualityScore(col("text")) >= 0.9).cast("long"))
    val total = docs.count()
    val pos = docs.where(col("y") === 1).count()
    val out = QualityClassifier.stumpSplits(docs).collect()
    assert(out.nonEmpty && out.length <= 4)
    assert(out.map(_.getAs[String]("feature")).distinct.length == out.length)
    out.foreach { r =>
      assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == total)
      assert(r.getAs[Long]("pos_left") + r.getAs[Long]("pos_right") == pos)
      assert(r.getAs[Double]("gini_gain") >= 0.0,
        "a best split never increases impurity")
    }
    assert(out.exists(_.getAs[Double]("gini_gain") > 0.0),
      "at least one feature must carry signal for the quality label")
  }

  test("histogramQuantiles: estimates sit within one bin width of the exact quantiles") {
    val df = (0 until 1600).map(v => Tuple1(v.toDouble)).toDF("v")
    val bw = 1599.0 / 16.0
    val out = Sketches.histogramQuantiles(df, col("v"), 16, Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getAs[Double]("quantile_est")).toMap
    assert(math.abs(out(0.5) - 800.0) <= bw)
    assert(math.abs(out(0.9) - 1440.0) <= bw)
    assert(math.abs(out(0.99) - 1584.0) <= bw)
    assert(out(0.5) < out(0.9) && out(0.9) < out(0.99), "estimates are monotone in p")
  }

  test("pmiContingency: independent columns score ~0, aligned columns positive") {
    val ind = (0 until 400).map(i => (s"x${i % 2}", (i / 2) % 2))
      .toDF("a", "b")
    val indOut = EventOps.pmiContingency(ind, col("a"), col("b")).collect()
    assert(indOut.length == 4 && indOut.forall(r =>
      math.abs(r.getAs[Double]("mi_term")) < 1e-9))
    val dep = (0 until 400).map(i => (s"x${i % 2}", i % 2)).toDF("a", "b")
    val depOut = EventOps.pmiContingency(dep, col("a"), col("b")).collect()
    assert(depOut.length == 2 && depOut.forall(r =>
      r.getAs[Double]("mi_term") > 0.3), "x==y cells carry ln(2)/2 each")
  }

  test("dailyAcf: alternating series has acf(1) = -1, acf(2) = 1; constant series is null") {
    val dayNs = 86400L * 1000000000L
    // one event on even days, three on odd days, 40 days
    val alt = (0 until 40).flatMap(d =>
      Seq.fill(if (d % 2 == 0) 1 else 3)(Tuple1(d * dayNs))).toDF("ts")
    val acf = EventOps.dailyAcf(alt, 2).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("acf")).toMap
    assert(math.abs(acf(1L) + 1.0) < 1e-6 && math.abs(acf(2L) - 1.0) < 1e-6)
    val const = (0 until 10).map(d => Tuple1(d * dayNs)).toDF("ts")
    val c = EventOps.dailyAcf(const, 1).collect().head
    assert(c.isNullAt(2), "zero-variance series has undefined acf")
  }

  test("ksDrift: shifted distribution is detected with the textbook D") {
    // group1 uniform on 1..100, group2 uniform on 51..150: D = 0.5 at v=100
    val df = ((1 to 100).map(v => (v.toLong, 1L)) ++
      (51 to 150).map(v => (v.toLong, 0L))).toDF("x", "g")
    val d = Profiling.ksDrift(df, "x", col("g") === 1L).collect().head
    assert(d.getAs[Double]("d_stat") == 0.5)
  }

  test("mannWhitneyU: total separation gives U = 0; identity gives U = n1n2/2, z = 0") {
    val sep = Seq((1.0, 1), (2.0, 1), (3.0, 1), (4.0, 0), (5.0, 0), (6.0, 0))
      .toDF("v", "g")
    val r1 = graft.operators.Stats.mannWhitneyU(sep, col("v"), col("g") === 1)
      .collect().head
    assert(r1.getAs[Double]("u1") == 0.0 && r1.getAs[Double]("z") < -1.9)
    val same = Seq((1.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)).toDF("v", "g")
    val r2 = graft.operators.Stats.mannWhitneyU(same, col("v"), col("g") === 1)
      .collect().head
    assert(r2.getAs[Double]("u1") == 2.0, "tie-averaged ranks: U1 = n1*n2/2")
    assert(r2.getAs[Double]("z") == 0.0)
  }

  test("oneWayAnova: hand-computed two-group decomposition") {
    // a={1,2}, b={3,4}: SSB=4, SSE=1, F=(4/1)/(1/2)=8, eta^2=0.8
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val r = graft.operators.Stats.oneWayAnova(df, col("g"), col("v"))
      .collect().head
    assert(r.getAs[Long]("k_groups") == 2L && r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Double]("ssb") == 4.0 && r.getAs[Double]("sse") == 1.0)
    assert(r.getAs[Double]("f_stat") == 8.0 && r.getAs[Double]("eta_sq") == 0.8)
  }

  test("ewmaSmooth: constant series smooths to itself with zero forecast error") {
    val dayNs = 86400L * 1000000000L
    val const = (0 until 25).flatMap(d =>
      Seq.fill(2)(Tuple1(d * dayNs))).toDF("ts")
    val rows = EventOps.ewmaSmooth(const).collect()
    // conv is full-history from day 19 (lags 0..19); the forecast join
    // needs the previous day's smooth too -> emitted days are 20..24
    assert(rows.length == 5, "25 dense days emit the last 5")
    rows.foreach { r =>
      assert(r.getAs[Double]("ewma") == 2.0)
      assert(r.getAs[Double]("forecast_abs_err") == 0.0)
    }
  }

  test("kCorePeel: pendant peels off, the 4-clique survives k=3 with core degree 3") {
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("e", "a")).toDF("src", "dst")
    val core = graft.operators.GraphOps.kCorePeel(edges, k = 3, rounds = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("srmCheck: a balanced split passes; a 60/40 skew at scale is flagged") {
    val ok = (1 to 1000).map(i => Tuple2((i % 2).toLong, i.toLong))
      .toDF("v", "u")
    val r1 = graft.operators.Stats.srmCheck(ok, col("v"), col("u"))
      .collect().head
    assert(r1.getAs[Double]("chi2") == 0.0 && !r1.getAs[Boolean]("srm_flag"))
    val skew = (1 to 6000).map(i => (0L, i.toLong)) ++
      (1 to 4000).map(i => (1L, 10000L + i))
    val r2 = graft.operators.Stats.srmCheck(skew.toDF("v", "u"),
      col("v"), col("u")).collect().head
    assert(r2.getAs[Boolean]("srm_flag"), "chi2 = 400 >> the 0.001 gate")
  }

  test("eccentricity: path graph endpoints are peripheral, the middle is the center") {
    val path = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val m = graft.operators.GraphOps.eccentricity(path, depth = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Boolean]("is_center"),
          r.getAs[Boolean]("is_peripheral"))).toMap
    assert(m("b") == ((1L, true, false)))
    assert(m("a") == ((2L, false, true)) && m("c") == ((2L, false, true)))
  }

  test("chiSquaredIndependence: independence gives 0; perfect association gives V = 1") {
    val ind = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r1 = graft.operators.Stats.chiSquaredIndependence(
      ind.toDF("r", "c"), col("r"), col("c")).collect().head
    assert(r1.getAs[Double]("chi2") == 0.0 && r1.getAs[Double]("cramers_v") == 0.0)
    val dep = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))
    val r2 = graft.operators.Stats.chiSquaredIndependence(
      dep.toDF("r", "c"), col("r"), col("c")).collect().head
    assert(r2.getAs[Double]("chi2") == 20.0, "perfect 2x2 association: chi2 = N")
    assert(r2.getAs[Double]("cramers_v") == 1.0)
  }

  test("bhFdr: the planted deviant group is the discovery; conformers are not") {
    // 9 conforming groups at the corpus mean, one mild deviant: only the
    // deviant's |z| clears its BH threshold
    val rows = (1 to 9).flatMap(gi => (1 to 20).map(i =>
      (s"g$gi", 50L + (i % 3)))) ++ (1 to 20).map(i => ("dev", 52L + (i % 3)))
    val out = graft.operators.Stats.bhFdr(rows.toDF("g", "v"),
      col("g"), col("v")).collect()
    val dev = out.find(_.getString(0) == "dev").get
    assert(dev.getAs[Long]("rnk") == 1L && dev.getAs[Boolean]("discovery"))
    assert(out.count(_.getAs[Boolean]("discovery")) == 1,
      "groups sitting on the corpus mean must not be flagged")
  }

  test("sequentialPatterns: the repeated trigram dominates by occurrences") {
    val ev = Seq("a", "b", "c", "a", "b", "c").zipWithIndex.map {
      case (t, i) => (i.toLong, i.toLong * 1000L, 1L, t)
    }.toDF("event_id", "ts", "user_id", "event_type")
    val top = EventOps.sequentialPatterns(ev).collect()
    assert(top.head.getString(0) == "a>b>c")
    assert(top.head.getAs[Long]("n_occurrences") == 2L)
    assert(top.length == 3, "four trigram runs collapse to three patterns")
  }

  test("shapleyAttribution: a channel that gates conversion earns the closed-form credit") {
    // users {click->convert, click->convert, view, view}: hand-computed
    // Shapley: click 0.75, view -0.25, others 0; sums to v(full)-v(empty)
    val ev = Seq(
      (1L, 0L, 1L, "click", 0.0), (2L, 1L, 1L, "purchase", 1.0),
      (3L, 0L, 2L, "view", 0.0),
      (4L, 0L, 3L, "click", 0.0), (5L, 1L, 3L, "purchase", 1.0),
      (6L, 0L, 4L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = EventOps.shapleyAttribution(ev).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("shapley")).toMap
    assert(m("click") == 0.75 && m("view") == -0.25)
    assert(m("error") == 0.0 && m("signup") == 0.0)
  }

  test("coveredTime: overlapping intervals merge, disjoint ones add") {
    val ns = 1000000000L
    val ev = Seq((1L, 0L * ns, 7L), (2L, 100L * ns, 7L), (3L, 1000L * ns, 7L))
      .toDF("event_id", "ts", "user_id")
    val r = EventOps.coveredTime(ev).collect().head
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Double]("covered_s") == 700.0,
      "[0,400) merged from the overlap plus [1000,1300)")
  }

  test("pairwiseCohensD: unit-separated constant-variance groups give the textbook d") {
    // a ~ {10, 12}, b ~ {20, 22}: means 11/21, pooled sd 1.414..., d = -7.07
    val df = Seq(("a", 10.0), ("a", 12.0), ("b", 20.0), ("b", 22.0))
      .toDF("g", "v")
    val r = graft.operators.Stats.pairwiseCohensD(df, col("g"), col("v"))
      .collect().head
    assert(r.getAs[Double]("mean_diff") == -10.0)
    assert(math.abs(r.getAs[Double]("cohens_d") + 10.0 / math.sqrt(2.0)) < 1e-5)
  }

  test("expectations: planted violations are counted per rule; clean rules pass") {
    val df = Seq((1L, 10.0), (2L, -5.0), (2L, 20.0)).toDF("k", "v")
    val m = graft.operators.Profiling.expectations(df,
      Seq("v_positive" -> (col("v") > 0), "k_not_null" -> col("k").isNotNull),
      uniqueCols = Seq("k")).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_violations"),
        r.getAs[Boolean]("passed"))).toMap
    assert(m("v_positive") == ((1L, false)))
    assert(m("k_not_null") == ((0L, true)))
    assert(m("unique(k)") == ((1L, false)), "3 rows, 2 distinct keys")
  }

  test("betweenness: path center brokers its endpoints; star center brokers all pairs") {
    val path = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val pb = graft.operators.GraphOps.betweenness(path, depth = 3)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("betweenness")).toMap
    assert(pb == Map("a" -> 0.0, "b" -> 1.0, "c" -> 0.0))
    val star = Seq(("a", "x"), ("b", "x"), ("c", "x")).toDF("src", "dst")
    val sb = graft.operators.GraphOps.betweenness(star, depth = 3)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("betweenness")).toMap
    assert(sb("x") == 3.0 && sb("a") == 0.0)
  }

  test("seasonalityStrength: a planted weekly cycle explains nearly all variance") {
    val dayNs = 86400L * 1000000000L
    val ev = (0 until 28).flatMap { day =>
      Seq.fill(if (day % 7 == 0) 10 else 1)(Tuple1(day * dayNs))
    }.toDF("ts")
    val r = EventOps.seasonalityStrength(ev).collect().head
    assert(r.getAs[Long]("k_groups") == 7L && r.getAs[Long]("n_rows") == 28L)
    assert(r.getAs[Double]("eta_sq") == 1.0,
      "counts are a pure function of day-of-week here")
    assert(r.isNullAt(r.fieldIndex("f_stat")),
      "zero within-group variance: F undefined, NULL by contract")
  }

  test("isotonicCalibration: minimax fit equals the hand-run PAV merge") {
    // bin rates [0.1, 0.4, 0.2, 0.6] -> PAV pools bins 1,2 -> 0.3
    val rows = Seq((0.1, 1), (0.35, 4), (0.6, 2), (0.85, 6)).flatMap {
      case (s, pos) => (1 to 10).map(i => (s, i <= pos))
    }.toDF("s", "y")
    val iso = graft.operators.Stats
      .isotonicCalibration(rows, col("s"), col("y"), bins = 4)
      .orderBy("bin").collect().map(_.getAs[Double]("iso_rate"))
    assert(iso.toSeq == Seq(0.1, 0.3, 0.3, 0.6))
  }

  test("cuped: a perfectly predictive pre-period removes all variance") {
    val dayNs = 86400L * 1000000000L
    val ev = (1 to 50).flatMap { u =>
      Seq((u * 2L, 0L * dayNs, u.toLong, "view", u.toDouble),
        (u * 2L + 1, 10L * dayNs, u.toLong, "view", 2.0 * u))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventOps.cuped(ev).collect().head
    assert(r.getAs[Long]("n_users") == 50L)
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("var_adj") == 0.0)
    assert(r.getAs[Double]("reduction") == 1.0)
  }

  test("gmm em1d: a planted bimodal mixture recovers both modes") {
    val df = ((1 to 100).map(i => Tuple1(8L + (i % 5))) ++
      (1 to 100).map(i => Tuple1(98L + (i % 5)))).toDF("v")
    val r = graft.operators.Gmm.em1d(df, col("v")).collect().head
    assert(r.getAs[Long]("n_rows") == 200L)
    val (m1, m2) = (r.getAs[Double]("mu1"), r.getAs[Double]("mu2"))
    assert(m1 > 5 && m1 < 20, s"low mode, got $m1")
    assert(m2 > 90 && m2 < 105, s"high mode, got $m2")
    val p = r.getAs[Double]("pi1")
    assert(p > 0.4 && p < 0.6, s"balanced mixture, got $p")
  }

  test("entropy rate building blocks: a deterministic cycle carries zero entropy") {
    val dayNs = 86400L * 1000000000L
    val ev = (0 until 40).map { i =>
      (i.toLong, i * dayNs / 40, 1L, if (i % 2 == 0) "a" else "b", 0.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val tm = EventOps.transitionMatrix(ev).collect()
    assert(tm.forall(_.getAs[Double]("p") == 1.0),
      "strict alternation: every transition is certain")
  }

  test("spearmanRho: monotone nonlinear relation scores +1; reversal -1") {
    val up = Seq(("a", 1.0, 1.0), ("b", 2.0, 100.0), ("c", 3.0, 101.0),
      ("d", 4.0, 1000.0)).toDF("g", "x", "y")
    val r1 = graft.operators.Stats.spearmanRho(up, "g", col("x"), col("y"))
      .collect().head
    assert(r1.getAs[Double]("spearman_rho") == 1.0,
      "rank correlation ignores the nonlinearity")
    val down = Seq(("a", 1.0, 4.0), ("b", 2.0, 3.0), ("c", 3.0, 2.0),
      ("d", 4.0, 1.0)).toDF("g", "x", "y")
    val r2 = graft.operators.Stats.spearmanRho(down, "g", col("x"), col("y"))
      .collect().head
    assert(r2.getAs[Double]("spearman_rho") == -1.0)
  }

  test("kendallTauB: identical rankings give +1, reversed give -1") {
    val up = Seq(("a", 1.0, 10.0), ("b", 2.0, 20.0), ("c", 3.0, 30.0))
      .toDF("g", "x", "y")
    val r1 = graft.operators.Stats.kendallTauB(up, "g", col("x"), col("y"))
      .collect().head
    assert(r1.getAs[Double]("tau_b") == 1.0)
    val down = Seq(("a", 1.0, 30.0), ("b", 2.0, 20.0), ("c", 3.0, 10.0))
      .toDF("g", "x", "y")
    val r2 = graft.operators.Stats.kendallTauB(down, "g", col("x"), col("y"))
      .collect().head
    assert(r2.getAs[Double]("tau_b") == -1.0)
    assert(r2.getAs[Long]("discordant") == 3L)
  }

  test("poissonBootstrapMeanDiff: constant per-group data collapses onto the gap") {
    val df = ((1 to 100).map(i => (i.toLong, 10.0, true)) ++
      (1 to 100).map(i => (1000L + i, 4.0, false))).toDF("k", "v", "g")
    val r = graft.operators.Stats.poissonBootstrapMeanDiff(df, col("k"),
      col("v"), col("g")).collect().head
    assert(r.getAs[Double]("point_diff") == 6.0)
    assert(r.getAs[Double]("lo90") == 6.0 && r.getAs[Double]("hi90") == 6.0)
  }

  test("poissonBootstrapMean: constant data collapses the interval onto the mean") {
    val df = (1 to 200).map(i => (i.toLong, 42.0)).toDF("k", "v")
    val r = graft.operators.Stats.poissonBootstrapMean(df, col("k"), col("v"))
      .collect().head
    assert(r.getAs[Double]("point_mean") == 42.0)
    assert(r.getAs[Double]("lo90") == 42.0 && r.getAs[Double]("hi90") == 42.0)
    assert(r.getAs[Long]("n_boot") == 100L)
  }

  test("personalizedPageRank: the two-node cycle settles toward the seeded fixpoint") {
    // a <-> b, seed {a}: fixpoint r_a = 0.15/(1-0.7225) ~ 0.5405, r_b ~ 0.4595
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val m = graft.operators.GraphOps
      .personalizedPageRank(edges, Seq("a"), iterations = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // contraction is 0.7225 per TWO steps: 60 iters -> |err| ~ 3e-5
    assert(math.abs(m("a") - 0.15 / (1.0 - 0.85 * 0.85)) < 1e-3)
    assert(m("a") > m("b") && m("b") > 0.4,
      "teleport favors the seed; the cycle feeds the neighbor")
  }

  test("hits: a pure sink is the authority, its feeders the hubs") {
    val edges = Seq(("a", "c"), ("b", "c")).toDF("src", "dst")
    val m = graft.operators.GraphOps.hits(edges, rounds = 3).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("auth"),
        r.getAs[Double]("hub"))).toMap
    assert(m("c") == ((1.0, 0.0)))
    assert(m("a") == ((0.0, 1.0)) && m("b") == ((0.0, 1.0)))
  }

  test("adamicAdar: path endpoints score 1/ln(deg of the shared center)") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val rows = graft.operators.GraphOps.adamicAdar(edges).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "a" && r.getString(1) == "c")
    assert(r.getAs[Long]("common") == 1L)
    assert(math.abs(r.getAs[Double]("aa_score") - 1.0 / math.log(2.0)) < 1e-6)
  }
}
