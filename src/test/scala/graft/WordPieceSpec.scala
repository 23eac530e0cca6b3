package graft

import graft.operators.WordPiece
import org.apache.spark.sql.functions._

/** WordPiece tokenizer family (q155–q157): likelihood-gain pair scoring,
  * data-derived `##`-form MaxMatch vocabulary, greedy longest-match-first
  * segmentation with BERT's whole-word UNK rule. */
class WordPieceSpec extends GraftSpec {
  import spark.implicits._

  test("scoreRound ranks by likelihood gain, not raw pair frequency") {
    // words: ab:2 ad:1 cb:1 -> symbols a:3 c:1 ##b:3 ##d:1
    // pairs: (a,##b) pc=2 score ln2-ln3-ln3=-1.5041
    //        (a,##d) pc=1 score  0-ln3-0  =-1.0986
    //        (c,##b) pc=1 score  0-0-ln3  =-1.0986
    // the two RARE-symbol pairs outrank the frequent pair — the defining
    // WordPiece-vs-BPE property — and the tie breaks on (lsym, rsym)
    val docs = Seq((1L, "ab ab ad"), (2L, "cb")).toDF("doc_id", "text")
    val got = WordPiece.scoreRound(docs, topN = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length == 3)
    assert(got(0) == (("a", "##d", 1L, 3L, 1L, -1.0986)))
    assert(got(1) == (("c", "##b", 1L, 1L, 3L, -1.0986)))
    assert(got(2) == (("a", "##b", 2L, 3L, 3L, -1.5041)))
  }

  test("greedyVocab: count threshold, unconditional single chars, ##-form") {
    val docs = Seq((1L, Array.fill(6)("abc").mkString(" ")), (2L, "xy"))
      .toDF("doc_id", "text")
    val got = WordPiece.greedyVocab(docs, maxPieceLen = 4, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // every substring of abc (cnt 6) survives; xy (cnt 1) keeps only its
    // single chars — word-initial plain, continuation ##-prefixed
    assert(got == Map("a" -> 6L, "ab" -> 6L, "abc" -> 6L, "##b" -> 6L,
      "##bc" -> 6L, "##c" -> 6L, "x" -> 1L, "##y" -> 1L))
  }

  test("segment: greedy longest match, whole-word UNK, true MaxMatch") {
    val v = Set("ab", "##cd", "##c", "##d", "a", "b")
    val got = WordPiece.segment(Seq((1L, "abcd ba")).toDF("doc_id", "text"), v)
      .collect().head
    // abcd -> ab ##cd (longest first); ba -> b then ##a misses -> [UNK]
    assert(got.getString(1) == "ab ##cd [UNK]" && got.getLong(2) == 3L)
    // greedy is NOT optimal: abc swallows the prefix and forces UNK even
    // though a ##b ##cd covers — asserts the BERT contract exactly
    val v2 = Set("abc", "a", "##b", "##cd")
    val g2 = WordPiece.segment(Seq((1L, "abcd")).toDF("doc_id", "text"), v2)
      .collect().head
    assert(g2.getString(1) == "[UNK]" && g2.getLong(2) == 1L)
    // empty text -> zero pieces, empty string
    val g3 = WordPiece.segment(Seq((1L, "")).toDF("doc_id", "text"), v)
      .collect().head
    assert(g3.getString(1) == "" && g3.getLong(2) == 0L)
  }

  test("trainedVocab round-trip reconstructs the training corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .limit(200).cache()
    val vocab = WordPiece.trainedVocab(docs, maxPieceLen = 4, minCount = 5L)
    assert(vocab.nonEmpty && vocab.forall(_.nonEmpty))
    val seg = WordPiece.segment(docs, vocab).cache()
    // single chars are kept unconditionally, so the training corpus is
    // always coverable: no UNK anywhere, and stripping ## + spaces from
    // the pieces reproduces each doc's own whitespace-normalized text
    assert(seg.where(col("piece_str").contains("[UNK]")).count() == 0)
    val joined = seg.join(docs, "doc_id")
      .select(col("doc_id"), col("piece_str"), col("text")).collect()
    joined.foreach { r =>
      val rebuilt = r.getString(1).replace(" ##", "").replace(" ", "")
      val orig = r.getString(2).split(" ").filter(_.nonEmpty).mkString
      assert(rebuilt == orig, s"doc ${r.getLong(0)} round-trip")
    }
    // and a multi-char piece is actually in use (vocab earns its keep)
    assert(seg.where(size(split(col("piece_str"), " ")) <
      length(regexp_replace(col("piece_str"), " |##", "")) &&
      length(col("piece_str")) > 0).count() > 0)
    seg.unpersist(); docs.unpersist()
  }
}
