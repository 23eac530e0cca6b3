package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** Trained logistic-regression quality classifier (q158/q159): exact
  * quantized features, partition-invariant GD, and actual learning. */
class QualityClassifierSpec extends GraftSpec {
  import spark.implicits._

  test("featuresQ: exact quantized features, no NaN on empty text") {
    // "the cat": n=2 tokens, 7 chars, 0 punct, 1 stopword hit ('the'),
    // meanLen = (7-2+1)/2 = 3.0
    val f = Seq((1L, "the cat")).toDF("doc_id", "text")
      .select(QualityClassifier.featuresQ(col("text")))
      .collect().head.getSeq[Long](0)
    assert(f == Seq(1000000L, math.round(math.log(3.0) * 1e6), 0L,
      500000L, 3000000L))
    // empty text: split -> [""] so n=1; zero chars must not divide-by-zero
    val e = Seq((1L, "")).toDF("doc_id", "text")
      .select(QualityClassifier.featuresQ(col("text")))
      .collect().head.getSeq[Long](0)
    assert(e == Seq(1000000L, math.round(math.log(2.0) * 1e6), 0L, 0L, 0L))
  }

  test("one GD step from zero matches the closed form (sigmoid(0) = 1/2 exact)") {
    val docs = Seq((1L, "the cat sat", 1L), (2L, "zz qq!! ##", 0L),
      (3L, "of and to is", 1L)).toDF("doc_id", "text", "y")
    val w = QualityClassifier.train(docs, iters = 1, lr = 0.25)
    val fx = docs.select(col("y"), QualityClassifier.featuresQ(col("text")))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val expected = (0 until 5).map { j =>
      val g = fx.map { case (y, x) => (500000L - y * 1000000L) * x(j) }.sum
      0.0 - 0.25 * ((g.toDouble / 1e12) / fx.length)
    }
    assert(w.toSeq == expected)
  }

  test("training is partition-invariant bit-for-bit") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("y", (col("lang") === "en").cast("long"))
    val w1 = QualityClassifier.train(docs.repartition(1), iters = 3)
    val w13 = QualityClassifier.train(docs.repartition(13), iters = 3)
    assert(w1.toSeq == w13.toSeq)
  }

  test("classifier learns: planted separable corpus classifies perfectly") {
    // y=1 docs are stopword-rich, y=0 docs stopword-free, lengths varied
    // so the boundary is on stop_ratio, not length
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "the a of and to is " * (3 + i % 5), 1L)
      else (i.toLong, "xx yy zz qq ww vv " * (3 + i % 5), 0L)
    }.toDF("doc_id", "text", "y")
    val train = docs.where(col("doc_id") < 30)
    val held = docs.where(col("doc_id") >= 30)
    val w = QualityClassifier.train(train, iters = 40, lr = 1.0)
    val scored = QualityClassifier.score(held, w)
      .join(held.select("doc_id", "y"), "doc_id").cache()
    assert(scored.where(col("keep") =!= (col("y") === 1L)).count() == 0,
      "held-out docs must classify perfectly")
    val means = scored.groupBy("y").agg(avg("score").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(means(1L) - means(0L) > 0.5,
      s"scores must separate widely: ${means(1L)} vs ${means(0L)}")
    scored.unpersist()
  }

  test("adversarial ~10^7-char unbroken word: gradient product must not " +
      "overflow Long under ANSI (decimal38 before the multiply)") {
    // meanLen feature xq_5 ≈ 1e7·1e6 = 1e13; times the residual bound
    // 1e6 the product is ~1e19 > Long.MaxValue (9.2e18) — a LongType
    // multiply would abort under ANSI. The decimal(38,0)-first contract
    // must survive and yield finite weights.
    val monster = "x" * 10000001
    val docs = Seq((1L, monster, 1L), (2L, "the cat sat", 0L))
      .toDF("doc_id", "text", "y")
    val w = QualityClassifier.train(docs, iters = 2, lr = 0.25)
    assert(w.length == 5 && w.forall(v => !v.isNaN && !v.isInfinite))
    // the monster's meanLen gradient actually moved that weight
    assert(w(4) != 0.0)
  }

  test("weightsTable rounds 6 dp symmetrically on both signs") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val t = QualityClassifier.weightsTable(docs,
      Array(0.123456789, -0.123456789, 1.25, 0.0, -2.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(t(0)._3 == 0.123457 && t(1)._3 == -0.123457)
    assert(t(2)._3 == 1.25 && t(3)._3 == 0.0 && t(4)._3 == -2.5)
    assert(t.map(_._2).toSeq == QualityClassifier.FeatureNames)
  }
}
