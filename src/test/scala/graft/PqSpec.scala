package graft

import graft.operators.{Pq, Similarity, WordPiece}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (q163/q164) + the iterative WordPiece
  * trainer (q165). */
class PqSpec extends GraftSpec {
  import spark.implicits._

  lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet").cache()
  lazy val docs = spark.read.parquet(s"$sf001/documents.parquet").cache()

  test("pqCodes: one code per subspace, all within [0, kSub)") {
    val rows = Pq.pqCodes(emb, m = 8, kSub = 16, iters = 2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 8)
      assert(codes.forall(c => c >= 0 && c < 16))
    }
  }

  test("pqCodes is partition-invariant (exact integer Lloyd state)") {
    val a = Pq.pqCodes(emb.repartition(1)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Pq.pqCodes(emb.repartition(13)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
  }

  test("pqCodes separates planted clusters perfectly") {
    // two tight blobs per subspace half: every vector of a blob must get
    // the same code word as its blob-mates once a codeword lands on each
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, (0 until 16).map(d => base + (i / 2) * 1e-4f))
    }.toDF("vec_id", "embedding")
    val codes = Pq.pqCodes(vecs, m = 4, kSub = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val even = codes.filter(_._1 % 2 == 0).values.toSet
    val odd = codes.filter(_._1 % 2 == 1).values.toSet
    assert(even.size == 1 && odd.size == 1 && even != odd)
  }

  test("ivfPqTopK recall vs brute force") {
    val exact = Similarity.bruteForceTopK(emb, 0L, 10).collect()
      .map(_.getLong(0)).toSet
    val approx = Pq.ivfPqTopK(emb, 0L, 10).collect()
      .map(_.getLong(0)).toSet
    // IVF gate (3/8 cells) + 16-word codebooks on a near-isotropic
    // corpus: demand the bulk of the exact set, not all of it
    assert((exact intersect approx).size >= 6,
      s"recall ${(exact intersect approx).size}/10")
  }

  test("ivfPqTopK with full probe + deep rerank recovers exact top-k") {
    val exact = Similarity.bruteForceTopK(emb, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val full = Pq.ivfPqTopK(emb, 0L, 10, nCells = 4, nProbe = 4,
      rerank = 2000).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.toSeq == exact.toSeq)
  }

  test("WordPiece.train: rounds advance, argmax matches scoreRound round 1") {
    val m = WordPiece.train(docs, rounds = 3)
    assert(m.map(_.round) == Seq(1, 2, 3))
    val r1 = WordPiece.scoreRound(docs, topN = 1).collect().head
    assert(m.head.lsym == r1.getString(0) && m.head.rsym == r1.getString(1)
      && m.head.score_ln == r1.getDouble(5))
    // fused piece spelling: lsym ++ rsym minus its continuation marker
    m.foreach { w =>
      assert(w.piece == w.lsym + w.rsym.stripPrefix("##"))
      assert(w.pair_cnt > 0)
    }
  }

  test("WordPiece.train picks by likelihood, not raw pair frequency") {
    // both pairs occur 6 times, but 'a' also appears as its own word, so
    // score(a,##b) = ln(6/(12*6)) < score(z,##q) = ln(6/(6*6)) — the
    // likelihood rule must prefer (z, ##q) even though the BPE
    // frequency rule would tie them
    val docs = Seq.tabulate(6)(i => (i.toLong, "zq ab a"))
      .toDF("doc_id", "text")
    val m = WordPiece.train(docs, rounds = 1)
    assert(m.head.lsym == "z" && m.head.rsym == "##q"
      && m.head.piece == "zq" && m.head.pair_cnt == 6L)
  }

  test("fuseOnce scans left-to-right non-overlapping") {
    assert(WordPiece.fuseOnce(Array("x", "x", "x"), "x", "x", "xx")
      .toSeq == Seq("xx", "x"))
    assert(WordPiece.fuseOnce(Array("a", "##b", "a", "##b"), "a", "##b", "ab")
      .toSeq == Seq("ab", "ab"))
    assert(WordPiece.fuseOnce(Array("a"), "a", "##b", "ab").toSeq == Seq("a"))
  }

  test("batched top-k agrees with the single-query form, per query") {
    val ids = Seq(0L, 7L, 23L)
    val batch = Similarity.bruteForceTopKBatch(emb, ids, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    ids.foreach { qid =>
      val single = Similarity.bruteForceTopK(emb, qid, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = batch(qid).sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(b == single, s"query $qid: batch != single")
    }
    // the plan must prune per query below the shuffle (WindowGroupLimit
    // partial phase) — the property that keeps the exchange at |Q|*k
    val plan = Similarity.bruteForceTopKBatch(emb, ids, 10)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("WindowGroupLimit"), "no WindowGroupLimit in plan")
  }

  test("segment with the trained vocab covers the training corpus") {
    val merges = WordPiece.train(docs, rounds = 3)
    // trained vocab = every single-char piece (##-form) + the fusions —
    // single chars make every word coverable, fusions are preferred by
    // MaxMatch where they apply
    val chars = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .select(explode(expr(
        """transform(sequence(1, length(w)),
          |  i -> IF(i = 1, substring(w, 1, 1),
          |          concat('##', substring(w, i, 1))))""".stripMargin)).as("p"))
      .distinct().as[String].collect().toSet
    val vocab = chars ++ merges.map(_.piece)
    val seg = WordPiece.segment(docs, vocab,
      maxPieceLen = merges.map(_.piece.length).max max 4)
    assert(seg.where(col("piece_str").contains("[UNK]")).count() == 0)
  }
}
