package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (Rabin-Karp shape):
  * h = fold(codepoints, 0, (a, c) => (a*31 + c) mod 1e9+7).
  *
  * Codegen'd primitive loop (no UDF); iterates unicode CODEPOINTS so the
  * DuckDB oracle (`list_reduce` over `unicode(char)`) computes the identical
  * value. The modulus keeps every intermediate below 2^35, so plain long
  * arithmetic is exact in both engines. Complements the md5 canonical
  * fingerprint (TextAnalysis.fingerprint) with an order-sensitive,
  * incremental-update-friendly hash.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RollingHash.hash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RollingHash {
  /** Called from generated code. */
  def hash(s: UTF8String): Long = {
    val js = s.toString
    var h = 0L
    var i = 0
    while (i < js.length) {
      val cp = js.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % 1000000007L
    }
    h
  }

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c.cast("string"))))
}

/** Distinct word-n-gram shingles as 64-bit hashes, in one codegen'd call:
  * split on single spaces, join each n-gram with single spaces,
  * order-preserving distinct, xxhash64 (seed 42 — same family the SQL
  * `xxhash64` uses) of the shingle's UTF-8 bytes.
  *
  * This replaces the typed `flatMap` shingle pass in the dedup operators:
  * that pass cost a Deserialize/MapPartitions/Serialize break in every
  * plan that touched shingles (and ran once per consumer). As an
  * Expression the generation stays inside whole-stage codegen, shingle
  * STRINGS are never materialized into rows (only their hashes), and the
  * downstream exchanges become structurally identical — so Catalyst
  * reuses one shuffle across document-frequency counting, the prefix
  * self-join, and set verification (ReuseExchange).
  *
  * Hash-distinct vs string-distinct differ only on a 64-bit collision
  * inside one document (~1e-15 at 1e4 shingles/doc) — the same odds the
  * hashed-set verification already accepts.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  /** Called from generated code. Semantics identical to
    * `text.split(" ", -1).sliding(n).map(_.mkString(" ")).distinct` +
    * xxhash64, without building the intermediate gram strings twice. */
  def compute(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val ws = text.toString.split(" ", -1)
    if (ws.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]((ws.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= ws.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        UTF8String.fromString(sb.toString), org.apache.spark.sql.types.StringType, 42L)
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def shingle_hashes(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c.cast("string")), n))
}

/** All per-document text statistics in ONE codegen'd pass over the string:
  * `[n_tokens, hits_en, hits_de, hits_es, hits_fr, n_punct, n_chars]`.
  *
  * The declarative forms these replace — `size(split(text, " "))` per
  * metric plus a `filter(tokens, _.isin(words))` higher-order function per
  * language profile — re-split the text ~8x per row and run the HOF
  * lambdas interpreted (boxed closures per element), which made the
  * annotate stage of corpus prep the most expensive scan in the bench.
  * Semantics are bit-identical to those forms (see TextStats.compute), so
  * the derived langId / ratios / quality score keep their DuckDB oracles:
  *  - n_tokens = number of single-space-split segments (empty segments
  *    count, matching split(text, " ", -1));
  *  - hits_XX  = count of tokens string-equal to a profile word;
  *  - n_punct  = codepoints outside [A-Za-z0-9 ] (the regexp_replace
  *    length the punct ratio used);
  *  - n_chars  = codepoint count (= Spark length()).
  */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_stats"

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextStats.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextStats {
  /** THE language-marker profiles — single source of truth; the stats
    * array layout ([n_tokens, one hit count per profile in this order,
    * n_punct, n_chars]) and TextAnalysis.langId's indexing both derive
    * from it. Deliberately tiny + auditable: counts of high-frequency
    * function words per language. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  private val Words: Array[Array[String]] = Profiles.map(_._2.toArray).toArray

  private def matchSeg(s: String, a: Int, b: Int, hits: Array[Long]): Unit = {
    val n = b - a
    var p = 0
    while (p < Words.length) {
      val ws = Words(p)
      var w = 0
      while (w < ws.length) {
        val word = ws(w)
        if (word.length == n && s.regionMatches(a, word, 0, n)) hits(p) += 1
        w += 1
      }
      p += 1
    }
  }

  /** Called from generated code. One scan: UTF-16 iteration with surrogate
    * pairs counted as one codepoint (astral codepoints are never in
    * [A-Za-z0-9 ], so they count as punct). */
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = input.toString
    val hits = new Array[Long](Words.length)
    var nTokens = 1L; var punct = 0L; var chars = 0L
    var segStart = 0; var i = 0
    val len = s.length
    while (i < len) {
      val ch = s.charAt(i)
      if (ch == ' ') {
        matchSeg(s, segStart, i, hits)
        nTokens += 1
        segStart = i + 1
        chars += 1
        i += 1
      } else if (Character.isHighSurrogate(ch) && i + 1 < len &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
        chars += 1; punct += 1; i += 2
      } else {
        chars += 1
        if (!((ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z') ||
            (ch >= '0' && ch <= '9'))) punct += 1
        i += 1
      }
    }
    matchSeg(s, segStart, len, hits)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      (nTokens +: hits.toSeq :+ punct :+ chars).toArray)
  }

  def text_stats(c: Column): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(c.cast("string"))))
}

/** Deflate compression ratio of the UTF-8 text — compressed bytes / raw
  * bytes — the redundancy-based quality signal of Gopher (Rae et al. 2021,
  * doc filter "compression ratio") and RefinedWeb: templated or looping
  * text compresses far below ~0.4, natural prose sits near 0.5-0.8, random
  * strings exceed 1.0 (deflate framing overhead). Empty text → 1.0.
  *
  * Codegen'd (generated code calls the static helper, so the expression
  * stays inside whole-stage codegen); one Deflater per thread, reset per
  * row, raw mode (nowrap) at the default level 6. The VALUE depends on the
  * JVM's zlib, so this is a rows-only signal (no DuckDB oracle); its
  * oracled twin in the same signal family is q81's distinct-shingle
  * repetition ratio.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "compression_ratio"

  override def nullSafeEval(input: Any): Any =
    CompressionRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CompressionRatio.ratio($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CompressionRatio {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }

  /** Called from generated code. */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    // output is only COUNTED, so one reusable buffer per call is enough
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n.toDouble / raw.length
  }

  def compression_ratio(c: Column): Column =
    ColumnBridge.column(CompressionRatio(ColumnBridge.expression(c.cast("string"))))
}

/** Jaro-Winkler name similarity, codegen'd (no UDF). Spark ships
  * levenshtein and soundex but no Jaro family; this fills the entity-
  * resolution gap (short names with shared prefixes score far better
  * under JW than under edit distance). Semantics are pinned to DuckDB's
  * `jaro_winkler_similarity` (rapidfuzz lineage), verified empirically
  * against it on 5,000 random pairs before this was written:
  *   - match window max(⌊max(|a|,|b|)/2⌋ − 1, 0), greedy leftmost-
  *     unmatched assignment scanning the left string in order;
  *   - transpositions FLOORED: t = k/2 in integer math over the k
  *     matched-but-misordered positions (the classic formulation keeps
  *     k/2 fractional — that variant diverges from DuckDB on odd k);
  *   - Winkler prefix boost p=0.1, prefix capped at 4, applied only
  *     when jaro > 0.7;
  *   - either side empty → 0.0 (DuckDB's convention, incl. both empty).
  * Operates on UTF-16 code units — identical to DuckDB's byte-wise scan
  * on the ASCII name data this engine matches; non-BMP input would
  * diverge from a byte-level engine and callers needing that should
  * normalize first. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.JaroWinkler.sim($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinkler {
  /** Called from generated code. */
  def sim(u1: UTF8String, u2: UTF8String): Double = {
    val s1 = u1.toString
    val s2 = u2.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val w = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + w)
      var j = math.max(0, i - w)
      var unmatched = true
      while (j <= hi && unmatched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1.charAt(i) != s2.charAt(j)) k += 1
        j += 1
      }
      i += 1
    }
    val t = k / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (p < pmax && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }

  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a.cast("string")),
      ColumnBridge.expression(b.cast("string"))))
}

/** Shannon entropy (nats) of a string's character distribution in ONE
  * codegen'd pass: H = ln(n) − (Σ c·ln c)/n over codepoint counts —
  * the scan-speed randomness signal (low = repeated-char spam /
  * template runs, high = encrypted or binary-ish junk) that the
  * declarative form would need a corpus×chars explode to express.
  *
  * The count fold iterates codepoints; the float fold then iterates
  * counts in ASCENDING CODEPOINT order (TreeMap), so the double sum is
  * order-deterministic here — the DuckDB oracle sums the same terms in
  * its own group order, and the sub-ulp difference is absorbed by the
  * registered query's 4 dp rounding (the q99/q115 precedent for ln
  * folds). */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CharEntropy {
  /** Called from generated code. */
  def compute(s: UTF8String): Double = {
    val js = s.toString
    if (js.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < js.length) {
      val cp = js.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      counts.merge(cp, 1L, (a, b) => a + b)
    }
    var s1 = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      s1 += c * math.log(c)
    }
    math.log(n.toDouble) - s1 / n.toDouble
  }

  def char_entropy(c: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(c.cast("string"))))
}

/** Engine-portable hash idioms shared by the oracle-checked sketches. */
object PortableHash {
  import org.apache.spark.sql.functions.{conv, md5, substring}

  /** 60-bit hash: first 15 hex chars of md5, parsed as an integer —
    * bit-identical in Spark (`conv(substring(md5(x), 1, 15), 16, 10)`)
    * and DuckDB (`CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`). The
    * single definition behind q62 (SimHash), q64 (KMV) and q66
    * (deterministic sampling) — one place to keep in sync with the
    * oracle SQL pattern. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
}
