package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * language ID, quality scoring, fingerprinting. All pure Catalyst column
  * expressions — per-row, shuffle-free, whole-stage-codegen'd — so they
  * stream over 100 TB of documents at scan speed.
  */
object TextAnalysis {

  /** Whitespace tokens. Single-space split to match the corpus convention;
    * `tokensRegex` below is the robust variant. */
  def tokens(text: Column): Column = split(text, " ")

  /** Flesch reading-ease (Flesch 1948): 206.835 − 1.015·(words/sentences)
    * − 84.6·(syllables/words), with syllables estimated as VOWEL-GROUP
    * runs (the standard regex approximation) and sentences as
    * [.!?]-terminated spans (min 1). All three inputs are exact integer
    * counts from one regexp pass each — scan-speed, shuffle-free — and
    * the score is one fixed IEEE chain; callers display-round. */
  def fleschReadingEase(text: Column): Column = {
    val words = size(tokens(text)).cast("long")
    val sentences = greatest(
      size(regexp_extract_all(text, lit("[.!?]"), lit(0))).cast("long"),
      lit(1L))
    val syllables = greatest(
      size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
        .cast("long"), lit(1L))
    lit(206.835) -
      lit(1.015) * (words.cast("double") / sentences.cast("double")) -
      lit(84.6) * (syllables.cast("double") / words.cast("double"))
  }

  /** BPE-ish regex token count: word pieces, digit runs, single
    * punctuation — the usual pre-tokenizer shape. */
  def tokenCountRegex(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Language-marker profiles — aliased from the kernel so the stats
    * array layout and this module's indexing can never drift apart. */
  val Profiles: Seq[(String, Seq[String])] = graft.expressions.TextStats.Profiles

  /** One-pass codegen'd stats vector — every metric below derives from it,
    * and identical instances within a projection are subexpression-
    * eliminated, so annotating a document costs ONE scan of the string
    * (the HOF-filter/regexp forms it replaced re-split the text ~8x per
    * row, interpreted). Layout: [n_tokens, hits per profile..., n_punct,
    * n_chars] (graft.expressions.TextStats). */
  private def stats(text: Column): Column = graft.expressions.TextStats.text_stats(text)

  /** size(tokens(text)) as a long, off the one-pass kernel. */
  def tokenCount(text: Column): Column = element_at(stats(text), 1)

  /** Count of tokens string-equal to one of `words` — generic HOF form for
    * ad-hoc word lists; the fixed-profile counts come from [[stats]]. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(words.map(lit): _*))).cast("long")

  /** n-gram-heuristic language ID: argmax of profile hits, first-listed
    * profile wins ties, "und" (unknown) when nothing matches. */
  def langId(text: Column): Column = {
    val st = stats(text)
    val scores = Profiles.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(st, i + 2)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val cases = scores.foldLeft(when(best === 0, lit("und"))) {
      case (acc, (lang, s)) => acc.when(s === best, lit(lang))
    }
    cases.otherwise(lit("und"))
  }

  /** Ratio of non-alphanumeric, non-space codepoints. */
  def punctRatio(text: Column): Column =
    element_at(stats(text), 6).cast("double") / element_at(stats(text), 7)

  def stopwordRatio(text: Column): Column =
    element_at(stats(text), 2).cast("double") / element_at(stats(text), 1)

  /** Composite quality score in [0,1]: length sweet spot, low punctuation,
    * natural stopword density — the usual pretraining heuristics. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 50.0, lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    val stopScore = least(stopwordRatio(text) * 10.0, lit(1.0))
    (lenScore * 0.4 + punctScore * 0.4 + stopScore * 0.2)
  }

  /** Intra-document repetition ratio (the Gopher/RefinedWeb duplicate
    * n-gram quality signal): fraction of word n-grams that are repeats of
    * an earlier n-gram in the same document — high values mark boilerplate
    * loops, keyword stuffing, and degenerate generations. Pure per-row
    * columns off the codegen'd shingle kernel (distinct n-gram count /
    * total n-gram count), shuffle-free, scan-speed. Hashed-distinct
    * counting is injective in practice (collision odds within one doc's
    * ~100-shingle set ≈ 1e-15 — same argument as [[Dedup]]). */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val total = greatest(size(split(text, " ")) - (n - 1), lit(0)).cast("double")
    val distinct =
      size(graft.expressions.ShingleHashes.shingle_hashes(text, n)).cast("double")
    when(total > 0, lit(1.0) - distinct / total).otherwise(lit(0.0))
  }

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed
    * text. Stable across engines (md5 is md5), so it doubles as the
    * exact-dedup key for near-identical-after-normalization docs.
    * Whitespace is the EXPLICIT class [ \t\n\r\f] for the same reason as
    * [[normalizeText]]: Java's \s includes vertical tab (\x0B) while
    * RE2's (DuckDB's) does not, so the shorthand would silently produce
    * different fingerprints for \x0B-bearing documents across engines. */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "[ \\t\\n\\r\\f]+", " "))))

  /** Training-corpus text normalization: lowercase, mask URLs and email
    * addresses (crawl-scale PII/noise hygiene), collapse whitespace.
    * Pure regexp columns — per-row, shuffle-free, scan-speed. Whitespace
    * is the EXPLICIT class [ \t\n\r\f] rather than \s: Java's \s includes
    * vertical tab (\x0B) while RE2's does not, so the shorthand would
    * silently diverge from the DuckDB oracle on \x0B-bearing documents —
    * the explicit class is identical by construction in both engines. */
  def normalizeText(text: Column): Column = {
    val ws = "[ \\t\\n\\r\\f]"
    val lowered = lower(text)
    val urls = regexp_replace(lowered, s"https?://[^ \\t\\n\\r\\f]+", "<url>")
    val emails = regexp_replace(urls, "[a-z0-9._%+-]+@[a-z0-9.-]+", "<email>")
    trim(regexp_replace(emails, s"$ws+", " "))
  }

  /** PII redaction patterns, applied in THIS order (emails before the
    * digit patterns so an address is replaced whole; SSN before phone —
    * the group shapes 3-2-4 vs 3-3-4 cannot match the same span, but a
    * fixed order keeps the output deterministic by construction). Every
    * construct (explicit classes, bounded repetition) behaves identically
    * in Java regex and RE2, so the oracle matches bit-for-bit — same
    * portability argument as [[normalizeText]]'s whitespace class. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn" -> "\\d{3}-\\d{2}-\\d{4}",
    "phone" -> "\\d{3}-\\d{3}-\\d{4}",
    "ipv4" -> "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}")

  /** Redacts every [[PiiPatterns]] match with `<pii:kind>`. Pure regexp
    * columns — per-row, shuffle-free, scan-speed; the compliance-hygiene
    * pass every shipped training corpus runs (cf. the C4/RefinedWeb
    * cleaning stages). */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (t, (kind, p)) =>
      regexp_replace(t, p, s"<pii:$kind>")
    }

  /** Match count for one PII kind on the ORIGINAL text (counts are
    * per-pattern and independent — an audit metric, not a parse). */
  def piiCount(text: Column, kind: String): Column =
    size(regexp_extract_all(text,
      lit(PiiPatterns.toMap.apply(kind)), lit(0)))

  /** Gopher-style composite quality rules (Rae et al. 2021, App. A):
    * the standard rule battery run before any model-based quality
    * scoring — word-count band, mean-word-length band, symbol-to-word
    * ratio cap, bullet-line fraction cap, minimum stop-word presence.
    * Emits the measured statistic AND a boolean per rule (the audit
    * shape: a corpus report is one groupBy over the flags), plus the
    * conjunction `keep`.
    *
    * Rule COMPARISONS run on the unrounded doubles: every ratio is an
    * integer/integer division, identical in any IEEE engine, so the
    * booleans are cross-engine deterministic without rounding; the
    * displayed ratios round to 4 dp for presentation only. Pure column
    * arithmetic — per-row, shuffle-free, scan-speed. */
  def gopherRules(text: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      minStopwords: Int = 2): Column = {
    val w = tokens(text)
    val n = size(w).cast("long")
    val charSum = aggregate(transform(w, x => length(x).cast("long")),
      lit(0L), (a, x) => a + x)
    val meanLen = charSum.cast("double") / n.cast("double")
    val symbols = size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0)))
      .cast("long")
    val symbolRatio = symbols.cast("double") / n.cast("double")
    val lines = split(text, "\n")
    val bullets = size(filter(lines, l => l.rlike("^[ \t]*[-*•]"))).cast("long")
    val bulletFrac = bullets.cast("double") / size(lines).cast("long").cast("double")
    val stopArr = array(Profiles.toMap.apply("en").map(lit): _*)
    val stops = size(array_intersect(array_distinct(w), stopArr)).cast("long")
    val rWords = n >= minWords && n <= maxWords
    val rLen = meanLen >= minMeanLen && meanLen <= maxMeanLen
    val rSym = symbolRatio < maxSymbolRatio
    val rBullet = bulletFrac <= maxBulletFrac
    val rStop = stops >= minStopwords
    struct(
      n.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symbolRatio, 4).as("symbol_ratio"),
      round(bulletFrac, 4).as("bullet_frac"),
      stops.as("n_stopwords"),
      rWords.as("r_words"), rLen.as("r_wordlen"), rSym.as("r_symbol"),
      rBullet.as("r_bullet"), rStop.as("r_stop"),
      (rWords && rLen && rSym && rBullet && rStop).as("keep"))
  }
}
