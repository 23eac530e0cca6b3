package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Main-content extraction from raw HTML — the boilerpipe/trafilatura
  * class of web-crawl cleaning (Kohlschütter et al., WSDM 2010): the
  * first operator every crawl corpus needs, upstream of language ID,
  * quality scoring, and dedup (which all assume extracted text).
  *
  * Recipe (the published shallow-feature rule set, deterministic):
  *   1. strip non-content subtrees wholesale: <head>, <script>, <style>,
  *      <noscript>, <template>, <svg>, <iframe>, and HTML comments;
  *   2. segment the remaining markup into BLOCKS at block-level tag
  *      boundaries (p/div/h1-6/li/table cells/nav/header/footer/...);
  *   3. per block, compute shallow text features: tag-stripped
  *      entity-decoded whitespace-normalized text, word count, and
  *      LINK word count (words inside <a> anchors);
  *   4. a block is CONTENT iff words >= minWords AND link-word density
  *      <= maxLinkDensity (navigation/related-links/footer blocks are
  *      short and/or link-saturated — the two features Kohlschütter
  *      found carry nearly all the signal);
  *   5. main text = content blocks joined by '\n'.
  *
  * Everything is a pure Column expression chain — regexp splits plus
  * array higher-order functions, no UDFs — so Catalyst sees one
  * projection: the extraction runs at scan speed, columns prune, and
  * the operator composes with any source (WARC payloads, tar members,
  * parquet crawl dumps).
  *
  * SCALE: per-row only — no shuffle, no state, embarrassingly parallel
  * over whatever partitioning the crawl source landed with. The regex
  * pass is linear in page bytes; blocks materialize per row (pages are
  * KB-MB — bounded). At 100 TB this is a map stage fused into the scan.
  *
  * Heuristic limits (documented, inherent to tag-level extraction):
  * an <a> spanning a block boundary counts its words in neither block's
  * link tally; malformed nesting degrades to word-count gating only.
  */
object HtmlExtract {

  /** Tags whose entire subtree is never content. `\b` keeps `<header>`
    * from matching the `head` rule. Patterns use inline `(?is)` flags —
    * portable across Java regex and RE2. */
  private val NoiseTags =
    Seq("head", "script", "style", "noscript", "template", "svg", "iframe")

  /** Block-level segmentation boundaries (HTML5 flow-content splits). */
  private val BlockTags =
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|" +
      "article|section|header|footer|nav|aside|blockquote|pre|br|hr|" +
      "main|figure|figcaption|form|fieldset|address|summary|details"

  private val SplitPattern = s"(?i)</?(?:$BlockTags)\\b[^>]*>"

  /** Remove non-content subtrees and comments. Public so callers can
    * run the cheap sanitize pass alone (e.g. before language ID on the
    * full page). */
  def stripNoise(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    NoiseTags.foldLeft(noComments)((c, t) =>
      regexp_replace(c, s"(?is)<$t\\b[^>]*>.*?</$t>", " "))
  }

  /** Decode the entity set that survives tag stripping: the named set
    * (whose outputs contain no '&', so decoding them first cannot feed
    * the next stage), then ONE left-to-right scan over `&#NNN;`/
    * `&#xHH;` numeric references AND `&amp;` — the codegen'd
    * [[graft.expressions.DecodeHtmlNumRefs]] kernel, a single static
    * call per block instead of a split/extract_all/transform chain
    * (which measurably pushed the whole extraction projection out of
    * tight codegen), with a no-"&#"/-"&amp;" fast path inside. Every
    * entity decodes exactly once: `&amp;lt;` → `&lt;`, `&#38;lt;` →
    * `&lt;`, and `&#38;amp;` → `&amp;` — true single-pass HTML
    * semantics with no re-decoding of decoder output. */
  private def decodeEntities(c: Column): Column = {
    val pre = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&nbsp;" -> " ")
    val named = pre.foldLeft(c) { case (acc, (e, r)) =>
      replace(acc, lit(e), lit(r))
    }
    graft.expressions.DecodeHtmlNumRefs.decode_html_num_refs(named)
  }

  /** Tag-strip + entity-decode + whitespace-normalize one block. */
  private def cleanText(b: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(b, "<[^>]*>", " ")),
      "\\s+", " "))

  private def wordCount(t: Column): Column =
    when(t === "", lit(0)).otherwise(size(split(t, " ")))

  /** Words inside <a> anchors of a RAW (tags intact) block. */
  private def linkWordCount(rawBlock: Column): Column =
    aggregate(
      regexp_extract_all(rawBlock, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
      lit(0), (acc, a) => acc + wordCount(cleanText(a)))

  /** `array<struct<text, words, link_words>>` — one entry per non-empty
    * block, in document order. The scored form steps 1-3 produce.
    *
    * The whole pass is the codegen'd [[graft.expressions.ExtractBlocks]]
    * kernel — ONE static call per page. The column chain it replaced
    * (interpreted `transform` per block + nested `aggregate` per anchor
    * for the link tally) was the dominant extraction cost once the WARC
    * read went O(record); the kernel runs the same compiled regexes in
    * the same order, so semantics are pinned by construction and the
    * q480-family oracles gate it. The private helpers below remain the
    * declarative spec of each step (and `cleanText` still powers the
    * non-block surfaces). */
  def blockStats(html: Column): Column =
    graft.expressions.ExtractBlocks.extract_blocks(html)

  /** The column-chain twin of [[blockStats]] — retained as the
    * executable spec the kernel is checked against (spec suite compares
    * outputs on planted pages). */
  private[graft] def blockStatsDeclarative(html: Column): Column = {
    val stats = transform(split(stripNoise(html), SplitPattern), b => {
      val t = cleanText(b)
      struct(t.as("text"), wordCount(t).as("words"),
        linkWordCount(b).as("link_words"))
    })
    filter(stats, s => s.getField("text") =!= "")
  }

  private def isContent(s: Column, minWords: Int,
      maxLinkDensity: Double): Column =
    s.getField("words") >= minWords &&
      s.getField("link_words").cast("double") <=
        s.getField("words").cast("double") * maxLinkDensity

  /** The extracted main text: content blocks joined by '\n' ('' when
    * nothing qualifies). Defaults are the published shallow-rule
    * operating point: 10-word minimum, 1/3 link density cap. */
  def mainText(html: Column, minWords: Int = 10,
      maxLinkDensity: Double = 1.0 / 3): Column =
    array_join(
      transform(
        filter(blockStats(html), s => isContent(s, minWords, maxLinkDensity)),
        _.getField("text")),
      "\n")

  /** Whole-frame form: adds `text` (main content), `n_blocks` (content
    * blocks kept) and `n_boiler` (non-empty blocks dropped) next to the
    * input columns, dropping the raw HTML. One projection, no shuffle. */
  def extract(df: DataFrame, htmlCol: String = "html", minWords: Int = 10,
      maxLinkDensity: Double = 1.0 / 3): DataFrame = {
    val stats = blockStats(col(htmlCol))
    df.withColumn("_bs", stats)
      .withColumn("text",
        array_join(transform(
          filter(col("_bs"), s => isContent(s, minWords, maxLinkDensity)),
          _.getField("text")), "\n"))
      .withColumn("n_blocks",
        size(filter(col("_bs"), s => isContent(s, minWords, maxLinkDensity)))
          .cast("long"))
      .withColumn("n_boiler",
        size(filter(col("_bs"), s => !isContent(s, minWords, maxLinkDensity)))
          .cast("long"))
      .drop("_bs", htmlCol)
  }

  // ---------------------------------------------------------------------
  // Link graph extraction — the other thing a crawl pipeline reads off a
  // page: the outbound edges (frontier discovery, link-graph analytics).
  // ---------------------------------------------------------------------

  /** RFC 3986 §5.2.4 dot-segment removal on the PATH part of an
    * absolute http(s) URL: `/./` collapses, `seg/../` cancels, and
    * leading `/../` (an over-escaping `..`) clamps to the root — the
    * real-world "../../style.css" case. A fixed number of
    * `regexp_replace` passes reaches the fixed point for any nesting
    * depth ≤ 16 (real paths are far shallower; deeper leftovers pass
    * through unresolved rather than wrong). */
  private def removeDotSegments(u: Column): Column = {
    val head = regexp_extract(u, "^(https?://[^/?#]+)", 1)
    val tail = u.substr(length(head) + 1, lit(1 << 24))
    val path = regexp_replace(tail, "[?#].*$", "")
    val rest = tail.substr(length(path) + 1, lit(1 << 24))
    val noDot = regexp_replace(
      regexp_replace(path, "/\\.(?=/|$)", ""), "^\\./", "")
    val collapsed = (1 to 16).foldLeft(noDot)((p, _) =>
      regexp_replace(p, "/(?!\\.\\./)[^/]+/\\.\\.(?=/|$)", ""))
    val clamped = regexp_replace(collapsed, "^(/\\.\\.)+(?=/|$)", "")
    // fast path: ordinary dots (.html, .css) are not dot SEGMENTS —
    // only a "." or ".." bounded by slashes/ends engages the rewrite
    val hasDotSeg = path.rlike("(^|/)\\.\\.?(/|$)")
    when(head === "" || !hasDotSeg, u)
      .otherwise(concat(head,
        when(clamped === "" && (path =!= ""), lit("/")).otherwise(clamped),
        rest))
  }

  /** `array<struct<url, anchor, nofollow>>` of the page's anchors,
    * hrefs absolutized against the page's `<base href>` when present,
    * else `baseUrl` (RFC 3986 simplified: absolute http(s) kept;
    * `//host/...` gets the base scheme; `/path` gets the base origin;
    * other relative paths resolve against the base directory, with
    * §5.2.4 dot-segment removal; fragment-only and non-http(s)-scheme
    * hrefs — mailto:, javascript: — are dropped). `nofollow` is true
    * when the anchor's opening tag carries a `rel` attribute whose
    * token list contains `nofollow` (either attribute order) — the
    * publisher's per-link crawl opt-out a frontier must honor before
    * admission. Pure column chain, per-row only. */
  def links(html: Column, baseUrl: Column): Column = {
    val anchors = regexp_extract_all(stripNoise(html),
      lit("(?is)<a\\b[^>]*\\bhref\\s*=\\s*[\"'][^\"']*[\"'][^>]*>.*?</a>"),
      lit(0))
    // <base href> lives in <head>, which stripNoise removes — read it
    // off the RAW html; only an absolute http(s) base overrides (the
    // WHATWG fallback for anything else is the document URL)
    val baseTag = regexp_extract(html,
      "(?is)<base\\b[^>]*\\bhref\\s*=\\s*[\"'](https?://[^\"']*)[\"']", 1)
    val base = when(baseTag =!= "", baseTag).otherwise(baseUrl)
    val origin = regexp_extract(base, "^(https?://[^/?#]+)", 1)
    val scheme = regexp_extract(base, "^(https?):", 1)
    val baseDir = regexp_replace(
      regexp_replace(base, "[?#].*$", ""), "[^/]*$", "")
    // per-anchor parse (opening-tag attributes — rel= in anchor TEXT
    // cannot false-positive — href, entity-decoded anchor text) is ONE
    // compiled call: graft.expressions.ParseAnchor, the DecodeHtmlNumRefs
    // promotion pattern applied to the other per-anchor hot path. The
    // resolution when-chain below runs on short hrefs only.
    val parsed = transform(anchors,
      a => graft.expressions.ParseAnchor.parse_anchor(a))
    val resolved = transform(parsed, p => {
      val href = p.getField("href")
      val url = when(href.rlike("^https?://"), href)
        .when(href.startsWith("//"), concat(scheme, lit(":"), href))
        .when(href.startsWith("/"), removeDotSegments(concat(origin, href)))
        .when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:") || href.startsWith("#") ||
          (href === ""), lit(null).cast("string"))
        .otherwise(removeDotSegments(concat(baseDir, href)))
      struct(url.as("url"), p.getField("anchor").as("anchor"),
        p.getField("nofollow").as("nofollow"))
    })
    filter(resolved, l => l.getField("url").isNotNull)
  }

  /** `struct<title, description, lang, og_title, canonical,
    * meta_robots>` page metadata — the crawl-enrichment fields consumed
    * before/alongside extraction (title for display, description for
    * retrieval snippets, the html lang attribute as the language-ID
    * prior, og:title as the publisher's canonical title, `<link
    * rel="canonical">` as the publisher's dedup URL — the strongest
    * same-page signal a crawler gets — and `<meta name="robots">` as
    * the page-level opt-out: `noindex` excludes the page from the
    * corpus, `nofollow` suppresses ALL its outlinks before frontier
    * admission). Tag-attribute order is handled for the common
    * name-then-content form (and both orders for the canonical link
    * and robots meta); absent fields are ''. Pure column chain,
    * per-row. */
  def pageMeta(html: Column): Column = {
    val title = cleanText(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))
    def metaContent(name: String) = cleanText(regexp_extract(html,
      "(?is)<meta\\s[^>]*(?:name|property)\\s*=\\s*[\"']" + name +
        "[\"'][^>]*content\\s*=\\s*[\"']([^\"']*)[\"']", 1))
    val lang = trim(regexp_extract(html,
      "(?is)<html\\b[^>]*\\blang\\s*=\\s*[\"']([^\"']*)[\"']", 1))
    val canonFwd = regexp_extract(html,
      "(?is)<link\\s[^>]*rel\\s*=\\s*[\"']canonical[\"']" +
        "[^>]*href\\s*=\\s*[\"']([^\"']*)[\"']", 1)
    val canonRev = regexp_extract(html,
      "(?is)<link\\s[^>]*href\\s*=\\s*[\"']([^\"']*)[\"']" +
        "[^>]*rel\\s*=\\s*[\"']canonical[\"']", 1)
    val canonical = trim(when(canonFwd =!= "", canonFwd)
      .otherwise(canonRev))
    val robotsFwd = metaContent("robots")
    val robotsRev = cleanText(regexp_extract(html,
      "(?is)<meta\\s[^>]*content\\s*=\\s*[\"']([^\"']*)[\"']" +
        "[^>]*name\\s*=\\s*[\"']robots[\"']", 1))
    val metaRobots = when(robotsFwd =!= "", robotsFwd).otherwise(robotsRev)
    struct(title.as("title"), metaContent("description").as("description"),
      lang.as("lang"), metaContent("og:title").as("og_title"),
      canonical.as("canonical"), metaRobots.as("meta_robots"))
  }

  /** True when a `meta_robots` token list (comma/space separated, case-
    * insensitive) contains `directive` — `robots_meta_has(m, 'noindex')`
    * / `'nofollow'` are the two gates a crawl pipeline composes. The
    * directive is lowercased (both sides of the match fold case) and
    * regex-quoted, so `"NOINDEX"` matches and metacharacters cannot
    * rewrite the pattern. */
  def robotsMetaHas(metaRobots: Column, directive: String): Column = {
    val d = java.util.regex.Pattern.quote(directive.toLowerCase)
    lower(metaRobots).rlike(s"(^|[,\\s])$d([,\\s]|$$)")
  }

  /** Canonical URL for frontier/crawl dedup (the standard normalizer
    * rule set): drop the fragment, lowercase scheme+host, strip default
    * ports (:80 http, :443 https), strip trailing slashes off the path,
    * drop tracking parameters (utm_*, fbclid, gclid, msclkid), sort the
    * surviving query parameters. Path case is preserved (paths are
    * case-sensitive; hosts are not). Non-absolute-http(s) inputs pass
    * through with only trim + fragment-drop (nothing to normalize
    * against). Dot-segment resolution is the absolutizer's job
    * ([[links]]), not the canonicalizer's. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(trim(u), "#.*$", "")
    val head = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1)
    val headLc = lower(head)
    val headNorm = regexp_replace(
      regexp_replace(headLc, "^(http://[^/?#:]+):80$", "$1"),
      "^(https://[^/?#:]+):443$", "$1")
    val rest = noFrag.substr(length(head) + 1, lit(1 << 24))
    val path = regexp_replace(regexp_replace(rest, "\\?.*$", ""), "/+$", "")
    val query = when(noFrag.contains("?"),
      regexp_replace(rest, "^[^?]*\\?", "")).otherwise(lit(""))
    val params = array_sort(filter(split(query, "&"), p =>
      !(p.rlike("^(utm_[^=]*|fbclid|gclid|msclkid)=") || (p === ""))))
    val q = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(head === "", noFrag)
      .otherwise(concat(headNorm, path, q))
  }

  // ---------------------------------------------------------------------
  // Deterministic synthetic page builder — the oracle-able test harness
  // for the extractor (the testdata corpus is parquet text, not crawl
  // HTML, so q-rows CONSTRUCT a page from each document and assert the
  // extractor recovers exactly the analytic expectation).
  // ---------------------------------------------------------------------

  /** Chunk size for paragraphizing document text. */
  val ParaWords = 17

  /** Fixed content paragraph planted on every synthetic page: decodes
    * entities AFTER tag stripping (escaped markup must NOT be stripped),
    * 14 words so the word gate keeps it. Carries one decimal
    * (`&#8212;` em dash) and one hex (`&#x27;` apostrophe) numeric
    * reference next to the named set, so the q480-family oracles pin
    * numeric-reference decoding too. */
  val FixedParaHtml: String =
    "<p>Editorial note &#8212; don&#x27;t skip tips &amp; tricks for " +
      "&lt;html&gt; parsing in ten words</p>"
  val FixedParaText: String =
    "Editorial note — don't skip tips & tricks for <html> parsing in ten words"

  private def escapeHtml(c: Column): Column =
    replace(replace(replace(c, lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  /** A full synthetic page around `textCol`: head noise (script/style/
    * title), an inline body script + comment, a link-only nav (4 words,
    * density 1), a 24-word link-saturated "related" list (fails ONLY the
    * density rule — words pass), the fixed entity paragraph, the text as
    * [[ParaWords]]-word `<p>` chunks (escaped — round-trips through
    * entity decoding), and a 4-word footer (fails ONLY the word gate).
    * Expected extraction: [[FixedParaText]] + the chunks of >= minWords
    * words, '\n'-joined. */
  def syntheticPage(textCol: Column,
      extraHead: Column = lit("")): Column = {
    val words = split(trim(regexp_replace(textCol, "\\s+", " ")), " ")
    val nChunks = ceil(size(words).cast("double") / ParaWords).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(words, i * ParaWords + 1, lit(ParaWords)), " "))
    val paras = array_join(
      transform(chunks, c => concat(lit("<p>"), escapeHtml(c), lit("</p>"))),
      "")
    val related = (1 to 12)
      .map(i => s"""<a href="/r$i">related item</a>""").mkString(" ")
    concat(
      lit("<html><head>"), extraHead,
      lit("<title>Synthetic page</title>" +
        "<script src=\"app.js\"></script><style>.m{color:red}</style>" +
        "</head><body>"),
      lit("<script>var tracker = 1;</script><!-- analytics comment -->"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
        "<a href=\"/contact\">Contact us</a></nav>"),
      lit(s"""<div class="related">$related</div>"""),
      lit(FixedParaHtml),
      paras,
      lit("<div id=\"footer\">Copyright 2026 Example Corp</div>" +
        "</body></html>"))
  }

  /** [[syntheticPage]] plus a deterministic OUTBOUND-LINK block: three
    * anchors to docs `(id*7+k) % nDocs` (k = 1..3), one per
    * absolutization rule — site-absolute `/doc/T`, protocol-relative
    * `//example.org/doc/T`, fully absolute `https://example.org/doc/T`.
    * The block is 6 words all inside anchors, so it drops under the
    * density rule and leaves [[syntheticPage]]'s extraction expectation
    * untouched — it exists for [[links]] (q485's crawl-graph row). */
  def syntheticPageLinked(textCol: Column, idCol: Column,
      nDocs: Long): Column = {
    def t(k: Int) = pmod(idCol * 7 + k, lit(nDocs)).cast("string")
    val outbound = concat(
      lit("<div class=\"outbound\"><a href=\"/doc/"), t(1),
      lit("\">reference link</a> <a href=\"//example.org/doc/"), t(2),
      lit("\">further reading</a> <a href=\"https://example.org/doc/"), t(3),
      lit("\">related article</a></div>"))
    concat(
      regexp_replace(syntheticPage(textCol), "</body></html>$", ""),
      outbound, lit("</body></html>"))
  }

  /** [[syntheticPageLinked]] with publisher opt-outs planted — the
    * fixture for the nofollow/noindex admission tier:
    *   - the k=2 (protocol-relative) anchor carries `rel` nofollow when
    *     `id % 3 == 0`, with the attribute BEFORE href on odd ids and
    *     after on even ids (both orders in the corpus hash);
    *   - `<meta name="robots">` in the head: `id % 7 == 0` →
    *     "noindex, nofollow" (page drops AND its outlinks drop),
    *     `id % 7 == 1` → "noindex" (reversed attribute order; page
    *     drops from the corpus but still expands), else absent.
    * Extraction expectations are untouched (the meta is head-side; the
    * anchors stay inside the density-dropped outbound block). */
  def syntheticPageOptOut(textCol: Column, idCol: Column,
      nDocs: Long): Column = {
    def t(k: Int) = pmod(idCol * 7 + k, lit(nDocs)).cast("string")
    val nf = idCol % 3 === 0
    val a2 = when(nf && idCol % 2 === 0,
        concat(lit("<a href=\"//example.org/doc/"), t(2),
          lit("\" rel=\"nofollow noopener\">further reading</a>")))
      .when(nf,
        concat(lit("<a rel=\"me nofollow\" href=\"//example.org/doc/"),
          t(2), lit("\">further reading</a>")))
      .otherwise(concat(lit("<a href=\"//example.org/doc/"), t(2),
        lit("\">further reading</a>")))
    val outbound = concat(
      lit("<div class=\"outbound\"><a href=\"/doc/"), t(1),
      lit("\">reference link</a> "), a2,
      lit(" <a href=\"https://example.org/doc/"), t(3),
      lit("\">related article</a></div>"))
    val metaTag = when(idCol % 7 === 0,
        lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
      .when(idCol % 7 === 1,
        lit("<meta content=\"noindex\" name=\"robots\">"))
      .otherwise(lit(""))
    concat(
      regexp_replace(syntheticPage(textCol, metaTag), "</body></html>$", ""),
      outbound, lit("</body></html>"))
  }
}
