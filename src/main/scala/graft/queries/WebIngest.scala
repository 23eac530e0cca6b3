package graft.queries

import org.apache.spark.sql.functions._

import graft.queries.Tables.t

/** Web-crawl ingestion tier: HTML main-content extraction
  * ([[graft.operators.HtmlExtract]]) and the WARC landing source
  * ([[graft.sources.WarcSource]]) — the two stages upstream of
  * everything else in a crawl→training-data pipeline (round 18,
  * VERDICT r17 "What's missing" #1/#2) — plus the round-19
  * real-world-proofing tier: charset-aware decode (q493), the sitemap
  * discovery channel (q494), the incremental frontier (q495), zstd
  * members (q496), the crawl LOOP composition (q497), redirect
  * resolution (q498), Crawl-delay politeness (q499), and the recrawl
  * delta (q500).
  *
  * The testdata corpus is parquet text, not crawl HTML, so the q-rows
  * CONSTRUCT a deterministic page per document
  * ([[graft.operators.HtmlExtract.syntheticPage]]: head noise, inline
  * script + comment, a link-only nav, a link-saturated related list,
  * one fixed entity-bearing paragraph, the text as 17-word escaped
  * `<p>` chunks, a short footer) and the DuckDB oracle states the
  * ANALYTIC expectation — which paragraphs survive the word gate and
  * the extracted bytes — rather than replaying the engine's regexes:
  * boilerplate leaking in, content dropped, entities mis-decoded, or
  * broken WARC framing all land in the hash. */
object WebIngest {

  /** DuckDB: the analytic expectation of extracting
    * [[graft.operators.HtmlExtract.syntheticPage]] — chunks of >= 10
    * words survive, prefixed by the fixed entity paragraph; 1 + kept
    * content blocks; nav/related/footer + dropped chunks are boiler. */
  private val ExtractOracleCte =
    """d AS (SELECT doc_id, string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
      |       FROM documents),
      |c AS (SELECT doc_id, [array_to_string(w[(i*17+1):(i*17+17)], ' ')
      |        for i in range(0, CAST(ceil(len(w)/17.0) AS INT))] AS chunks FROM d),
      |k AS (SELECT doc_id, chunks,
      |        [x for x in chunks if len(string_split(x, ' ')) >= 10] AS kept FROM c),
      |e AS (SELECT doc_id, CAST(len(kept) AS BIGINT) AS nk, CAST(len(chunks) AS BIGINT) AS nc,
      |        array_to_string(list_prepend(
      |          'Editorial note ' || chr(8212) || ' don''t skip tips & tricks for <html> parsing in ten words', kept),
      |          chr(10)) AS text
      |      FROM k)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- HTML -> main text: build a full synthetic page around each
    // document (script/style/comment noise, link-only nav, a 24-word
    // link-saturated related list that passes the word gate but fails
    // the density rule, a fixed paragraph whose entities must decode
    // AFTER tag stripping, 17-word escaped <p> chunks, 4-word footer)
    // and extract. The oracle states the analytic expectation, so every
    // rule is in the hash: word gate (short tail chunks + footer drop),
    // link density (related list drops DESPITE 24 words), noise
    // stripping (script text would corrupt the text bytes), entity
    // round-trip (escape -> strip -> decode), block counts.
    Q("q480_html_extract",
      (s, d) => {
        val pages = t(s, d, "documents").select(col("doc_id"),
          graft.operators.HtmlExtract.syntheticPage(col("text")).as("html"))
        graft.operators.HtmlExtract.extract(pages, "html")
          .select(col("doc_id"), col("n_blocks"), col("n_boiler"),
            length(col("text")).cast("long").as("n_chars"), col("text"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $ExtractOracleCte
             |SELECT doc_id, nk + 1 AS n_blocks, nc - nk + 3 AS n_boiler,
             |  CAST(len(text) AS BIGINT) AS n_chars, text
             |FROM e ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- WARC landing-format roundtrip, CommonCrawl .warc.gz layout
    // (per-record gzip members): export the corpus as 8 WARC shards
    // with deterministic slotting + pinned volatile fields, re-ingest
    // with the strict framed reader, and reassemble (doc_id from the
    // target URI, shard from the filename, pos from the record
    // ordinal). The oracle re-derives shard/pos from the same md5 slot
    // function and pins the HTTP status and body bytes — a framing
    // slip, gzip member corruption, lost record, or order change all
    // hash-fail. Read-back count is checked against the corpus inline
    // (the q473 infrastructure pin).
    Q("q481_warc_roundtrip",
      (s, d) => {
        val loc = Tables.freshRoundtripDir(d, "warcrt")
        val docs = t(s, d, "documents")
        val total = docs.count()
        val n = graft.sources.WarcSource.exportWarc(docs, loc.toString,
          nShards = 8, salt = "warc1",
          bodyContentType = "text/plain; charset=utf-8", gzip = true)
        require(n == total,
          s"warc read-back found $n responses, corpus has $total")
        graft.sources.WarcSource.responseBodies(s, loc.toString)
          .select(
            regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            regexp_extract(col("file"), "shard-(\\d+)\\.warc", 1)
              .cast("long").as("shard"),
            col("record_idx").cast("long").as("pos"),
            col("status"),
            length(col("body")).cast("long").as("n_bytes"),
            col("body"))
          .orderBy("doc_id")
      },
      Some("""WITH k AS (SELECT doc_id,
             |  CAST(('0x' || substr(md5('warc1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS key
             |  FROM documents)
             |SELECT d.doc_id, key % 8 AS shard,
             |  CAST(row_number() OVER (PARTITION BY key % 8
             |    ORDER BY key, doc_id) AS BIGINT) AS pos,
             |  'HTTP/1.1 200 OK' AS status,
             |  CAST(len(d.text) AS BIGINT) AS n_bytes, d.text AS body
             |FROM documents d JOIN k USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- the full crawl landing pipeline: synthetic HTML pages ->
    // WARC response records (the exact shape a fetcher lands) -> strict
    // re-ingest -> HTML main-content extraction, one declarative chain.
    // The oracle is q480's analytic expectation: the text must survive
    // a WARC roundtrip AND extraction byte-identically.
    Q("q482_crawl_pipeline",
      (s, d) => {
        val loc = Tables.freshRoundtripDir(d, "warccrawl")
        val pages = t(s, d, "documents").select(col("doc_id"),
          graft.operators.HtmlExtract.syntheticPage(col("text")).as("html"))
        graft.sources.WarcSource.exportWarc(pages, loc.toString,
          nShards = 8, salt = "warc2", bodyCol = "html")
        val landed = graft.sources.WarcSource
          .responseBodies(s, loc.toString)
          .select(regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"), col("body").as("html"))
        graft.operators.HtmlExtract.extract(landed, "html")
          .select(col("doc_id"), col("n_blocks"),
            length(col("text")).cast("long").as("n_chars"), col("text"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $ExtractOracleCte
             |SELECT doc_id, nk + 1 AS n_blocks,
             |  CAST(len(text) AS BIGINT) AS n_chars, text
             |FROM e ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- streaming WARC ingestion (the q478 landing-zone pattern on
    // the crawl format): two waves of WARC shards land in one
    // directory; two AvailableNow runs against ONE checkpoint ingest
    // each shard exactly once. batch_id = doc_id % 2 is pinned in the
    // oracle — a re-processed shard duplicates rows AND shifts batch
    // ids, so exactly-once and the incremental boundary are both in
    // the hash.
    Q("q483_warc_stream_ingest",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.streaming.EventsStream.warcIngestDemo(s,
          Seq(docs.where(col("doc_id") % 2 === 0),
            docs.where(col("doc_id") % 2 === 1)),
          nShards = 4, salt = "warcs")
          .select(col("doc_id"), col("n_bytes"), col("body"), col("batch_id"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(len(text) AS BIGINT) AS n_bytes,
             |  text AS body, CAST(doc_id % 2 AS BIGINT) AS batch_id
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- paragraph-granularity dedup (the CCNet/NewsPlease habit:
    // paragraph level BEFORE document level): every doc gets a shared
    // header + footer, docs with doc_id % 5 == 0 a shared promo, and
    // the text as 17-word paragraphs; cross-doc repeated paragraphs
    // must survive only at their global first (doc_id, idx) occurrence
    // and docs reassemble in original order. The oracle REPLAYS the
    // whole computation (paragraph build, global winner, excision,
    // reassembly) rather than assuming which paragraphs collide — so
    // natural chunk collisions are covered too, and a wrong winner
    // rule, lost paragraph, or misordered reassembly hash-fails.
    Q("q484_paragraph_dedup",
      (s, d) => {
        val header = "Subscribe to our newsletter for updates today"
        val promo = "Limited time offer visit our store now"
        val footer = "All rights reserved contact us for details"
        val words = split(col("text"), " ")
        val nChunks = ceil(size(words).cast("double") / 17).cast("int")
        val chunks = transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(words, i * 17 + 1, lit(17)), " "))
        val ps = concat(
          array(lit(header)), chunks,
          when(col("doc_id") % 5 === 0, array(lit(promo)))
            .otherwise(typedLit(Seq.empty[String])),
          array(lit(footer)))
        val docs = t(s, d, "documents")
          .select(col("doc_id"), array_join(ps, "\n").as("text"))
        graft.operators.Dedup.paragraphDedup(docs)
          .select(col("doc_id"), col("n_kept"), col("n_dropped"),
            col("clean_text"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |par AS (SELECT doc_id,
             |    ['Subscribe to our newsletter for updates today'] ||
             |    [array_to_string(w[(i*17+1):(i*17+17)], ' ')
             |      for i in range(0, CAST(ceil(len(w)/17.0) AS INT))] ||
             |    (CASE WHEN doc_id % 5 = 0
             |      THEN ['Limited time offer visit our store now']
             |      ELSE [] END) ||
             |    ['All rights reserved contact us for details'] AS ps
             |  FROM d),
             |x AS (SELECT doc_id, unnest([{'idx': i, 'para': ps[i+1]}
             |        for i in range(0, len(ps))], recursive := true) FROM par),
             |win AS (SELECT para, min(doc_id*1000 + idx) AS wkey FROM x GROUP BY para),
             |k AS (SELECT x.doc_id, x.idx, x.para,
             |        (x.doc_id*1000 + x.idx = wkey) AS keep
             |      FROM x JOIN win USING (para))
             |SELECT doc_id,
             |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
             |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped,
             |  coalesce(array_to_string(list(para ORDER BY idx) FILTER (WHERE keep),
             |    chr(10)), '') AS clean_text
             |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- outbound link-graph extraction: each synthetic page carries
    // three anchors to docs (id*7+k) % N, one per absolutization rule
    // (site-absolute, protocol-relative, fully absolute); the nav /
    // related / footer links don't match the /doc/ shape and must not
    // leak into the edge list. The oracle states the analytic edge set
    // with anchor texts, so absolutization, href parsing, and noise
    // separation are all in the hash.
    Q("q485_link_graph",
      (s, d) => {
        val docs = t(s, d, "documents")
        val n = docs.count()
        val pages = docs.select(col("doc_id"),
          graft.operators.HtmlExtract
            .syntheticPageLinked(col("text"), col("doc_id"), n).as("html"),
          concat(lit("https://example.org/doc/"), col("doc_id")).as("url"))
        pages.select(col("doc_id").as("src"),
            explode(graft.operators.HtmlExtract
              .links(col("html"), col("url"))).as("l"))
          .select(col("src"), col("l.url").as("url"),
            col("l.anchor").as("anchor"))
          .where(col("url").rlike("^https://example\\.org/doc/\\d+$"))
          .select(col("src"),
            regexp_extract(col("url"), "/doc/(\\d+)$", 1)
              .cast("long").as("dst"),
            col("anchor"))
          .orderBy("src", "dst", "anchor")
      },
      Some("""WITH n AS (SELECT count(*) AS c FROM documents),
             |e AS (SELECT doc_id AS src, (doc_id*7 + k) % c AS dst,
             |        CASE k WHEN 1 THEN 'reference link'
             |               WHEN 2 THEN 'further reading'
             |               ELSE 'related article' END AS anchor
             |      FROM documents, n, (VALUES (1),(2),(3)) v(k))
             |SELECT src, CAST(dst AS BIGINT) AS dst, anchor
             |FROM e ORDER BY src, dst, anchor""".stripMargin)),

    // ---- URL canonicalization (frontier/crawl dedup): a messy URL per
    // doc (uppercase scheme+host, default :443 port, trailing slash,
    // tracking params out of order, fragment) must normalize to the
    // analytic canonical form, and docs sharing doc_id % 250 must
    // collapse to the same canonical (the dedup the canonicalizer
    // exists for). Path case must be PRESERVED (paths are
    // case-sensitive) while the host lowercases — both in the hash.
    Q("q486_url_canonicalize",
      (s, d) => {
        val messy = concat(lit("HTTPS://ExAmple.COM:443/Docs/Item/"),
          (col("doc_id") % 250).cast("string"),
          lit("/?utm_source=feed&b=2&fbclid=xyz&a=1#sec-"), col("doc_id"))
        val canon = t(s, d, "documents")
          .select(col("doc_id"), messy.as("url"))
          .withColumn("canon",
            graft.operators.HtmlExtract.canonicalizeUrl(col("url")))
        canon.withColumn("n_dups",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy("canon")).cast("long"))
          .select(col("doc_id"), col("canon"), col("n_dups"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  'https://example.com/Docs/Item/' || CAST(doc_id % 250 AS VARCHAR)
             |    || '?a=1&b=2' AS canon,
             |  CAST(count(*) OVER (PARTITION BY doc_id % 250) AS BIGINT) AS n_dups
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- pipeline v8: the COMPLETE crawl->training-data story in one
    // declarative chain — synthetic pages -> WARC landing (gz) ->
    // strict ingest -> HTML main-content extraction -> paragraph-level
    // dedup (the shared fixed paragraph survives only in the globally
    // first doc; chunks dedup by replay) -> min-paragraph gate ->
    // global token-budget selection (ranged prefix sum) ->
    // deterministic shard slots. One oracle hash covers every stage's
    // semantics, composed from the q480/q484/q479 proven fragments.
    Q("q487_pipeline_v8",
      (s, d) => {
        val loc = Tables.freshRoundtripDir(d, "warcv8")
        val pages = t(s, d, "documents").select(col("doc_id"),
          graft.operators.HtmlExtract.syntheticPage(col("text")).as("html"))
        graft.sources.WarcSource.exportWarc(pages, loc.toString,
          nShards = 8, salt = "v8w", bodyCol = "html", gzip = true)
        val landed = graft.sources.WarcSource
          .responseBodies(s, loc.toString)
          .select(regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"), col("body").as("html"))
        val extracted = graft.operators.HtmlExtract.extract(landed, "html")
        val deduped = graft.operators.Dedup
          .paragraphDedup(extracted.select(col("doc_id"), col("text")))
        val gated = deduped.where(col("n_kept") >= 2)
          .select(col("doc_id"), col("clean_text").as("text"),
            length(col("clean_text")).as("n_chars"))
        val sel = graft.operators.TrainingPrep
          .selectUnderBudget(gated, budgetTokens = 30000L)
        val slots = graft.operators.TrainingPrep
          .shardExport(sel.select("doc_id"), 8, "v8")
        sel.join(slots, Seq("doc_id")).orderBy("doc_id")
      },
      Some(s"""WITH $ExtractOracleCte,
             |pp AS (SELECT doc_id,
             |    ['Editorial note ' || chr(8212) || ' don''t skip tips & tricks for <html> parsing in ten words']
             |      || kept AS ps FROM k),
             |x AS (SELECT doc_id, unnest([{'idx': i, 'para': ps[i+1]}
             |        for i in range(0, len(ps))], recursive := true) FROM pp),
             |win AS (SELECT para, min(doc_id*1000 + idx) AS wkey FROM x GROUP BY para),
             |kk AS (SELECT x.doc_id, x.idx, x.para,
             |        (x.doc_id*1000 + x.idx = wkey) AS keep
             |      FROM x JOIN win USING (para)),
             |cl AS (SELECT doc_id,
             |        coalesce(array_to_string(list(para ORDER BY idx) FILTER (WHERE keep),
             |          chr(10)), '') AS text,
             |        count(*) FILTER (WHERE keep) AS n_kept
             |      FROM kk GROUP BY doc_id),
             |g AS (SELECT doc_id, text, len(text) AS n_chars FROM cl WHERE n_kept >= 2),
             |sel AS (SELECT doc_id, n_tok, cum_tok FROM (
             |    SELECT doc_id,
             |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |      CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
             |        ORDER BY n_chars DESC, doc_id
             |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
             |    FROM g)
             |  WHERE cum_tok <= 30000),
             |sl AS (SELECT doc_id,
             |  CAST(('0x' || substr(md5('v8:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS key
             |  FROM sel)
             |SELECT sel.doc_id AS doc_id, n_tok, cum_tok, key % 8 AS shard,
             |  CAST(row_number() OVER (PARTITION BY key % 8
             |    ORDER BY key, sel.doc_id) AS BIGINT) AS pos
             |FROM sel JOIN sl ON sel.doc_id = sl.doc_id
             |ORDER BY sel.doc_id""".stripMargin),
      bench = true),

    // ---- SQL-surface parity for the crawl tier: html_main_text /
    // canonical_url registered as SQL functions (the cpc_section
    // discipline — the SAME Column compositions adapted at resolution
    // time, so the planned trees match the column route exactly). The
    // query is pure SQL text over a temp view; the oracle is the q480
    // analytic + the canonical form.
    Q("q488_sql_crawl",
      (s, d) => {
        graft.functions.WebFunctions.register(s)
        t(s, d, "documents").select(col("doc_id"),
            graft.operators.HtmlExtract.syntheticPage(col("text")).as("html"),
            concat(lit("HTTPS://ExAmple.ORG:443/doc/"), col("doc_id"),
              lit("/?utm_k=v#f")).as("url"))
          .createOrReplaceTempView("crawl_pages")
        s.sql("""SELECT doc_id, html_main_text(html) AS text,
                |  canonical_url(url) AS canon
                |FROM crawl_pages ORDER BY doc_id""".stripMargin)
      },
      Some(s"""WITH $ExtractOracleCte
             |SELECT doc_id, text,
             |  'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS canon
             |FROM e ORDER BY doc_id""".stripMargin)),

    // ---- robots.txt politeness gate (RFC 9309): four hosts publish
    // robots bodies (host-dependent rule sets), rules parse ONCE per
    // host and broadcast-join to the per-doc URL stream, where the
    // decision evaluates at scan speed. Paths cycle through the five
    // planted cases: prefix disallow, longer-allow override
    // (specificity), '$'-anchored wildcard match, '$' anchor REJECTING
    // a longer suffix, and a host-dependent rule — group selection
    // (specific token over the Disallow-everything '*' group),
    // wildcard matching, anchoring, and specificity are all in the
    // hash.
    Q("q489_robots_gate",
      (s, d) => {
        val docs = t(s, d, "documents")
        val robotsText = concat(
          lit("# synthetic robots\nUser-agent: graftbot\n" +
            "Disallow: /private/\nAllow: /private/open*\n" +
            "Disallow: /tmp/*.bin$\n"),
          when(col("host") % 2 === 0,
            lit("Allow: /docs/\nDisallow: /docs/raw\n")).otherwise(lit("")),
          lit("User-agent: *\nDisallow: /\n" +
            "Sitemap: https://example.org/sitemap.xml\n"))
        val hosts = docs.select((col("doc_id") % 4).as("host")).distinct()
          .withColumn("rules",
            graft.operators.Robots.parseRobots(robotsText))
          .select("host", "rules")
        val withPath = docs.select(col("doc_id"),
          (col("doc_id") % 4).as("host"),
          when(col("doc_id") % 5 === 0,
              concat(lit("/private/x"), col("doc_id")))
            .when(col("doc_id") % 5 === 1,
              concat(lit("/private/open/x"), col("doc_id")))
            .when(col("doc_id") % 5 === 2,
              concat(lit("/tmp/f"), col("doc_id"), lit(".bin")))
            .when(col("doc_id") % 5 === 3,
              concat(lit("/tmp/f"), col("doc_id"), lit(".bind")))
            .otherwise(concat(lit("/docs/raw/"), col("doc_id")))
            .as("path"))
        withPath.join(broadcast(hosts), Seq("host"))
          .select(col("doc_id"), col("path"),
            graft.operators.Robots.robotsAllows(col("rules"),
              lit("graftbot/1.0 (+https://example.org/bot)"), col("path"))
              .cast("long").as("allowed"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE doc_id % 5
             |    WHEN 0 THEN '/private/x' || CAST(doc_id AS VARCHAR)
             |    WHEN 1 THEN '/private/open/x' || CAST(doc_id AS VARCHAR)
             |    WHEN 2 THEN '/tmp/f' || CAST(doc_id AS VARCHAR) || '.bin'
             |    WHEN 3 THEN '/tmp/f' || CAST(doc_id AS VARCHAR) || '.bind'
             |    ELSE '/docs/raw/' || CAST(doc_id AS VARCHAR) END AS path,
             |  CAST(CASE doc_id % 5
             |    WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 0 WHEN 3 THEN 1
             |    ELSE CASE WHEN (doc_id % 4) % 2 = 1 THEN 1 ELSE 0 END
             |  END AS BIGINT) AS allowed
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- crawl frontier BFS: two expansion rounds from a seed set
    // through the WHOLE politeness stack — pages' outbound anchors
    // (q485's link structure) -> absolutize -> canonicalize ->
    // robots-gate the TARGET URL (an anchored wildcard blocks ids
    // ending in 0) -> dedup against the visited set. Output is every
    // visited doc with its discovery depth; the oracle unrolls the two
    // rounds analytically, so link extraction, the robots anchor rule,
    // and the visited-set anti-joins are all in the hash.
    Q("q490_crawl_frontier",
      (s, d) => {
        val docs = t(s, d, "documents")
        val n = docs.count()
        // parse the (single, host-constant) robots body ONCE and embed
        // the rules as a literal: an aggregate-HOF over a lit() is not
        // constant-folded, so inlining parseRobots here would re-parse
        // the file per edge row (measured: ~2x the whole query)
        val rules = graft.operators.Robots.rulesLiteral(s,
          "User-agent: *\nDisallow: /doc/*0$\n")
        val edges = docs.select(col("doc_id").as("src"),
            explode(graft.operators.HtmlExtract.links(
              graft.operators.HtmlExtract
                .syntheticPageLinked(col("text"), col("doc_id"), n),
              concat(lit("https://example.org/doc/"), col("doc_id"))))
              .as("l"))
          .select(col("src"),
            graft.operators.HtmlExtract.canonicalizeUrl(col("l.url"))
              .as("url"))
          .where(col("url").rlike("^https://example\\.org/doc/\\d+$"))
          .where(graft.operators.Robots.robotsAllows(rules, lit("graftbot"),
            regexp_extract(col("url"), "^https://example\\.org(/doc/\\d+)$", 1)))
          .select(col("src"),
            regexp_extract(col("url"), "/doc/(\\d+)$", 1)
              .cast("long").as("dst"))
          // the edge list feeds BOTH expansion rounds (and each round's
          // anti-join): materialize the page-build + regex pass once
          // instead of re-running it per join (the q98 localCheckpoint
          // discipline — in a real crawl the edge list lands on disk)
          .localCheckpoint()
        val seeds = docs.where(col("doc_id") < 10)
          .select(col("doc_id"))
        def expand(frontier: org.apache.spark.sql.DataFrame) =
          edges.join(frontier.withColumnRenamed("doc_id", "src"), Seq("src"))
            .select(col("dst").as("doc_id")).distinct()
        val d1 = expand(seeds).join(seeds, Seq("doc_id"), "left_anti")
        val visited1 = seeds.union(d1)
        val d2 = expand(d1).join(visited1, Seq("doc_id"), "left_anti")
        seeds.withColumn("depth", lit(0L))
          .union(d1.withColumn("depth", lit(1L)))
          .union(d2.withColumn("depth", lit(2L)))
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT count(*) AS c FROM documents),
             |e AS (SELECT doc_id AS src, (doc_id*7 + k) % c AS dst
             |      FROM documents, n, (VALUES (1),(2),(3)) v(k)),
             |ee AS (SELECT src, dst FROM e WHERE dst % 10 <> 0),
             |s0 AS (SELECT doc_id FROM documents WHERE doc_id < 10),
             |d1 AS (SELECT DISTINCT dst AS doc_id FROM ee
             |       JOIN s0 ON ee.src = s0.doc_id
             |       WHERE dst NOT IN (SELECT doc_id FROM s0)),
             |d2 AS (SELECT DISTINCT dst AS doc_id FROM ee
             |       JOIN d1 ON ee.src = d1.doc_id
             |       WHERE dst NOT IN (SELECT doc_id FROM s0)
             |         AND dst NOT IN (SELECT doc_id FROM d1))
             |SELECT doc_id, CAST(0 AS BIGINT) AS depth FROM s0
             |UNION ALL SELECT doc_id, 1 FROM d1
             |UNION ALL SELECT doc_id, 2 FROM d2
             |ORDER BY doc_id""".stripMargin)),

    // ---- sitemap round trip: each host's URL inventory (loc carries a
    // query string with '&' — entity escaping must round-trip) is built
    // into a <urlset> body, parsed back with the sitemaps.org reader,
    // and reassembled. The oracle states the analytic inventory, so
    // the XML builder, the entry parser, entity escaping, and field
    // extraction are all in the hash.
    Q("q491_sitemap_roundtrip",
      (s, d) => {
        val docs = t(s, d, "documents")
        val urls = docs.select((col("doc_id") % 4).as("host"),
          struct(
            concat(lit("https://h"), col("doc_id") % 4,
              lit(".example.org/doc/"), col("doc_id"),
              lit("?a=1&b=2")).as("loc"),
            concat(lit("2026-01-"),
              lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"))
              .as("lastmod")).as("u"))
        val xmls = urls.groupBy("host").agg(
          graft.operators.Sitemaps.buildUrlset(
            sort_array(collect_list(col("u")))).as("xml"))
        xmls.select(explode(graft.operators.Sitemaps.entries(col("xml")))
            .as("e"))
          .select(
            regexp_extract(col("e.loc"), "/doc/(\\d+)\\?", 1)
              .cast("long").as("doc_id"),
            col("e.loc").as("loc"), col("e.lastmod").as("lastmod"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  'https://h' || CAST(doc_id % 4 AS VARCHAR) || '.example.org/doc/'
             |    || CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS loc,
             |  '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- page metadata extraction: title (whitespace-normalized),
    // meta description, the html lang attribute (the language-ID
    // prior), og:title, and the rel=canonical link (both attribute
    // orders — odd doc_ids carry href-before-rel) from a constructed
    // head — the crawl enrichment fields read alongside main-content
    // extraction.
    Q("q492_page_metadata",
      (s, d) => {
        val head5 = array_join(slice(split(col("text"), " "), 1, 5), " ")
        val canonHref = concat(lit("https://example.org/canon/"),
          (col("doc_id") % 100).cast("string"))
        val canonTag = when(col("doc_id") % 2 === 0,
            concat(lit("<link rel=\"canonical\" href=\""), canonHref,
              lit("\">")))
          .otherwise(concat(lit("<link href=\""), canonHref,
            lit("\" rel=\"canonical\">")))
        val page = concat(
          lit("<!DOCTYPE html><html lang=\""), col("lang"), lit("\"><head>"),
          lit("<title> Doc "), col("doc_id"), lit(" </title>"),
          lit("<meta name=\"description\" content=\""), head5, lit("\">"),
          canonTag,
          lit("<meta property=\"og:title\" content=\"OG Doc "),
          col("doc_id"), lit("\">"),
          lit("</head><body><p>x</p></body></html>"))
        t(s, d, "documents").select(col("doc_id"), page.as("html"))
          .select(col("doc_id"),
            graft.operators.HtmlExtract.pageMeta(col("html")).as("m"))
          .select(col("doc_id"), col("m.title").as("title"),
            col("m.description").as("description"),
            col("m.lang").as("lang"), col("m.og_title").as("og_title"),
            col("m.canonical").as("canonical"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title,
             |  array_to_string(string_split(text, ' ')[1:5], ' ') AS description,
             |  lang, 'OG Doc ' || CAST(doc_id AS VARCHAR) AS og_title,
             |  'https://example.org/canon/' || CAST(doc_id % 100 AS VARCHAR) AS canonical
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- charset-aware WARC decode (round 19 #1): bodies are BYTE-BUILT
    // in three encodings — ISO-8859-1 declared in the Content-Type
    // header, windows-1252 declared only by an in-body <meta charset>
    // (the header param is absent, so the sniff path decides; 0x80/0x97
    // are the windows-1252-ONLY euro and em dash, mojibake under any
    // other decode), and undeclared UTF-8 (the fallback). The oracle
    // states the expected decoded text analytically (chr() codepoints),
    // so header precedence, the meta sniff, the fallback, and the
    // was_transcoded flag are all in the hash.
    Q("q493_warc_charset",
      (s, d) => {
        val loc = Tables.freshRoundtripDir(d, "warccs")
        val docs = t(s, d, "documents")
        val idStr = col("doc_id").cast("string")
        val body0 = encode(
          concat(lit("café numéro "), idStr, lit(" à côté")), "ISO-8859-1")
        val body1 = concat(
          encode(lit("<meta charset=windows-1252><p>Price "), "US-ASCII"),
          lit(Array(0x80.toByte)),
          encode(lit(" and dash "), "US-ASCII"),
          lit(Array(0x97.toByte)),
          encode(concat(lit(" doc "), idStr, lit("</p>")), "US-ASCII"))
        val body2 = encode(
          concat(lit("héllo wörld doc "), idStr), "UTF-8")
        val m = col("doc_id") % 3
        val input = docs.select(col("doc_id"),
          when(m === 0, body0).when(m === 1, body1).otherwise(body2)
            .as("body"),
          when(m === 0, lit("text/html; charset=ISO-8859-1"))
            .when(m === 1, lit("text/html")).otherwise(lit("text/plain"))
            .as("ctype"))
        graft.sources.WarcSource.exportWarc(input, loc.toString,
          nShards = 4, salt = "cs19", bodyCol = "body",
          contentTypeCol = "ctype", gzip = true)
        graft.sources.WarcSource.responseBodies(s, loc.toString)
          .select(
            regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            col("charset"),
            col("was_transcoded").cast("long").as("transcoded"),
            col("body"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE CAST(doc_id % 3 AS INT)
             |    WHEN 0 THEN 'ISO-8859-1' WHEN 1 THEN 'windows-1252'
             |    ELSE 'UTF-8' END AS charset,
             |  CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE 1 END AS BIGINT) AS transcoded,
             |  CASE CAST(doc_id % 3 AS INT)
             |    WHEN 0 THEN 'café numéro ' || CAST(doc_id AS VARCHAR) || ' à côté'
             |    WHEN 1 THEN '<meta charset=windows-1252><p>Price ' || chr(8364)
             |      || ' and dash ' || chr(8212) || ' doc '
             |      || CAST(doc_id AS VARCHAR) || '</p>'
             |    ELSE 'héllo wörld doc ' || CAST(doc_id AS VARCHAR) END AS body
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- sitemap discovery composition (round 19 #4): the SECOND
    // frontier channel, end to end — robots.txt `Sitemap:` lines (CRLF
    // bodies, exercising the whitespace fix) -> sitemapindex build +
    // parse ([[Sitemaps.indexLocs]]' first CORRECTNESS row) -> child
    // urlset build + parse -> canonicalize -> union with the q485 link
    // channel, anti-joined against the seed set: one BFS round fed by
    // BOTH discovery channels. The inventory is the doc_id % 3 == 0
    // subset split across 4 hosts × 2 index parts, so a lost index
    // child, a wrong host/part join, or a canonicalization slip all
    // change the discovered set. The oracle unrolls both channels
    // analytically (the q490 convention).
    Q("q494_sitemap_discovery",
      (s, d) => {
        val docs = t(s, d, "documents")
        val n = docs.count()
        val seeds = docs.where(col("doc_id") < 10)
        val linkDiscovered = seeds.select(
            explode(graft.operators.HtmlExtract.links(
              graft.operators.HtmlExtract
                .syntheticPageLinked(col("text"), col("doc_id"), n),
              concat(lit("https://example.org/doc/"), col("doc_id"))))
              .as("l"))
          .select(graft.operators.HtmlExtract
            .canonicalizeUrl(col("l.url")).as("url"))
          .where(col("url").rlike("^https://example\\.org/doc/\\d+$"))
          .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"))
          .distinct()
        val hosts = seeds.select((col("doc_id") % 4).as("host")).distinct()
        val robotsTxt = concat(
          lit("User-agent: *\r\nDisallow:\r\nSitemap: https://h"),
          col("host"), lit(".example.org/sitemap_index.xml\r\n"))
        val idx = hosts.select(col("host"),
            explode(graft.operators.Robots.sitemaps(robotsTxt)).as("sm_url"))
          .where(col("sm_url").endsWith("/sitemap_index.xml"))
          .select(col("host"),
            graft.operators.Sitemaps.buildSitemapindex(
              transform(sequence(lit(0), lit(1)), p =>
                concat(lit("https://h"), col("host"),
                  lit(".example.org/sm/"), p, lit(".xml")))).as("ixml"))
        val children = idx.select(col("host"),
            explode(graft.operators.Sitemaps.indexLocs(col("ixml")))
              .as("child"))
          .select(col("host"),
            regexp_extract(col("child"), "/sm/(\\d)\\.xml$", 1)
              .cast("long").as("part"))
        val inv = docs.where(col("doc_id") % 3 === 0)
          .select((col("doc_id") % 4).as("host"),
            expr("(doc_id div 4) % 2").as("part"),
            struct(
              concat(lit("https://example.org/doc/"), col("doc_id"),
                lit("/?utm_x=1#frag")).as("loc"),
              lit("2026-02-01").as("lastmod")).as("u"))
        val urlsets = inv.groupBy("host", "part")
          .agg(graft.operators.Sitemaps.buildUrlset(
            sort_array(collect_list(col("u")))).as("xml"))
        val smDiscovered = children.join(urlsets, Seq("host", "part"))
          .select(explode(graft.operators.Sitemaps.entries(col("xml")))
            .as("e"))
          .select(graft.operators.HtmlExtract
            .canonicalizeUrl(col("e.loc")).as("url"))
          .where(col("url").rlike("^https://example\\.org/doc/\\d+$"))
          .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"))
          .distinct()
        linkDiscovered.withColumn("via_links", lit(1L))
          .join(smDiscovered.withColumn("via_sitemap", lit(1L)),
            Seq("doc_id"), "full_outer")
          .join(seeds.select("doc_id"), Seq("doc_id"), "left_anti")
          .select(col("doc_id"),
            coalesce(col("via_links"), lit(0L)).as("via_links"),
            coalesce(col("via_sitemap"), lit(0L)).as("via_sitemap"))
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT count(*) AS c FROM documents),
             |l AS (SELECT DISTINCT (d.doc_id*7 + k) % c AS doc_id
             |      FROM documents d, n, (VALUES (1),(2),(3)) v(k)
             |      WHERE d.doc_id < 10),
             |sm AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0)
             |SELECT coalesce(l.doc_id, sm.doc_id) AS doc_id,
             |  CAST(CASE WHEN l.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS via_links,
             |  CAST(CASE WHEN sm.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS via_sitemap
             |FROM l FULL OUTER JOIN sm ON l.doc_id = sm.doc_id
             |WHERE coalesce(l.doc_id, sm.doc_id) NOT IN
             |  (SELECT doc_id FROM documents WHERE doc_id < 10)
             |ORDER BY doc_id""".stripMargin)),

    // ---- incremental streaming frontier (round 19 #6): q490's BFS run
    // the way a real crawl runs it — waves land as files, one
    // AvailableNow run per round expands the wave in foreachBatch
    // against a VISITED table kept in ManifestCommit snapshots (the
    // q136 admission discipline), and the loop runs to CONVERGENCE
    // (depth = first-discovery round), not a fixed round count. The
    // oracle is the iterated twin: a recursive-CTE BFS taking min(depth)
    // per node, so a lost wave, a double-admitted node, or a wrong
    // anti-join all change depths or rows. Replay convergence (re-run
    // over the same root changes nothing) is spec-driven
    // (WebIngestSpec).
    Q("q495_incremental_frontier",
      (s, d) => {
        val loc = Tables.freshRoundtripDir(d, "frontier19")
        val docs = t(s, d, "documents")
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
          explode(array((1 to 3).map(k =>
            pmod(col("doc_id") * 7 + k, lit(n))): _*)).as("dst"))
        val seeds = docs.where(col("doc_id") < 10).select("doc_id")
        graft.streaming.CrawlFrontier
          .run(s, edges, seeds, loc.toString)
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE n AS (SELECT count(*) AS c FROM documents),
             |e AS (SELECT doc_id AS src, (doc_id*7 + k) % c AS dst
             |      FROM documents, n, (VALUES (1),(2),(3)) v(k)),
             |bfs(doc_id, depth) AS (
             |  SELECT doc_id, CAST(0 AS BIGINT) FROM documents WHERE doc_id < 10
             |  UNION
             |  SELECT e.dst, b.depth + 1 FROM bfs b JOIN e ON e.src = b.doc_id
             |  WHERE b.depth < 40)
             |SELECT doc_id, CAST(min(depth) AS BIGINT) AS depth
             |FROM bfs GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- .warc.zst roundtrip (round 19 #7): q481's contract on the
    // zstd member layout — one zstd FRAME per record, the emerging
    // CommonCrawl companion format — through the same strict streaming
    // walker (member-by-member decompression, O(record) memory). Same
    // oracle shape as q481: slots, order, status, and body bytes all
    // pinned.
    Q("q496_warc_zstd",
      (s, d) => {
        val loc = Tables.freshRoundtripDir(d, "warczst")
        val docs = t(s, d, "documents")
        graft.sources.WarcSource.exportWarc(docs, loc.toString,
          nShards = 8, salt = "zst1",
          bodyContentType = "text/plain; charset=utf-8", codec = "zstd",
          verify = false)
        graft.sources.WarcSource.responseBodies(s, loc.toString)
          .select(
            regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            regexp_extract(col("file"), "shard-(\\d+)\\.warc", 1)
              .cast("long").as("shard"),
            col("record_idx").cast("long").as("pos"),
            col("status"),
            length(col("body")).cast("long").as("n_bytes"))
          .orderBy("doc_id")
      },
      Some("""WITH k AS (SELECT doc_id,
             |  CAST(('0x' || substr(md5('zst1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS key
             |  FROM documents)
             |SELECT d.doc_id, key % 8 AS shard,
             |  CAST(row_number() OVER (PARTITION BY key % 8
             |    ORDER BY key, doc_id) AS BIGINT) AS pos,
             |  'HTTP/1.1 200 OK' AS status,
             |  CAST(len(d.text) AS BIGINT) AS n_bytes
             |FROM documents d JOIN k USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- pipeline v9: the COMPLETE crawl LOOP — q487 covered landing →
    // training data; this covers landing → the next fetch wave. Pages
    // land as .warc.gz, the strict reader ingests them, links extract
    // off the landed HTML (not the pristine corpus), absolutize +
    // canonicalize, the robots anchor rule gates targets, and
    // [[CrawlFrontier]] runs the frontier to CONVERGENCE against its
    // ManifestCommit visited table. One oracle hash = WARC framing +
    // extraction + absolutization + canonicalization + RFC 9309
    // matching + incremental BFS admission, composed. Depths differ
    // from q495's ungated graph wherever a blocked hop was the short
    // path, so the gate's effect on the BFS tree is itself in the hash.
    Q("q497_pipeline_v9",
      (s, d) => {
        val locW = Tables.freshRoundtripDir(d, "v9warc")
        val locF = Tables.freshRoundtripDir(d, "v9frontier")
        val docs = t(s, d, "documents")
        val n = docs.count()
        val pages = docs.select(col("doc_id"),
          graft.operators.HtmlExtract
            .syntheticPageLinked(col("text"), col("doc_id"), n).as("html"))
        graft.sources.WarcSource.exportWarc(pages, locW.toString,
          nShards = 8, salt = "v9w", bodyCol = "html", gzip = true,
          verify = false)
        val rules = graft.operators.Robots.rulesLiteral(s,
          "User-agent: *\r\nDisallow: /doc/*0$\r\n")
        val edges = graft.sources.WarcSource
          .responseBodies(s, locW.toString)
          .select(regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("src"), col("body").as("html"),
            col("uri").as("url"))
          .select(col("src"),
            explode(graft.operators.HtmlExtract
              .links(col("html"), col("url"))).as("l"))
          .select(col("src"),
            graft.operators.HtmlExtract.canonicalizeUrl(col("l.url"))
              .as("u"))
          .where(col("u").rlike("^https://example\\.org/doc/\\d+$"))
          .where(graft.operators.Robots.robotsAllows(rules, lit("graftbot"),
            regexp_extract(col("u"),
              "^https://example\\.org(/doc/\\d+)$", 1)))
          .select(col("src"),
            regexp_extract(col("u"), "/doc/(\\d+)$", 1)
              .cast("long").as("dst"))
        val seeds = docs.where(col("doc_id") < 10).select("doc_id")
        graft.streaming.CrawlFrontier
          .run(s, edges, seeds, locF.toString)
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE n AS (SELECT count(*) AS c FROM documents),
             |e AS (SELECT doc_id AS src, (doc_id*7 + k) % c AS dst
             |      FROM documents, n, (VALUES (1),(2),(3)) v(k)),
             |ee AS (SELECT src, dst FROM e WHERE dst % 10 <> 0),
             |bfs(doc_id, depth) AS (
             |  SELECT doc_id, CAST(0 AS BIGINT) FROM documents WHERE doc_id < 10
             |  UNION
             |  SELECT ee.dst, b.depth + 1 FROM bfs b JOIN ee ON ee.src = b.doc_id
             |  WHERE b.depth < 40)
             |SELECT doc_id, CAST(min(depth) AS BIGINT) AS depth
             |FROM bfs GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- HTTP redirect resolution (the third discovery input): docs
    // with id % 8 == 0 land as 301s whose RELATIVE Location points at
    // id+4, which itself is a 302 (ABSOLUTE Location) to the terminal
    // id+6 — a real two-hop chain exercising both Location
    // absolutization forms; wrap-guards keep targets in-corpus and the
    // chain analytic. The oracle states status, final target, and hop
    // count per doc, so per-row status/Location export, header parsing,
    // absolutization, and the iterative follow-join are all in the
    // hash.
    Q("q498_redirect_follow",
      (s, d) => {
        val loc = Tables.freshRoundtripDir(d, "warcredir")
        val docs = t(s, d, "documents")
        val n = docs.count()
        val isA = col("doc_id") % 8 === 0 && col("doc_id") + 6 < n
        val isB = col("doc_id") % 8 === 4 && col("doc_id") + 2 < n
        val input = docs.select(col("doc_id"), col("text"),
          when(isA, lit("301 Moved Permanently"))
            .when(isB, lit("302 Found")).otherwise(lit("200 OK"))
            .as("stat"),
          when(isA, concat(lit("/doc/"), (col("doc_id") + 4).cast("string")))
            .when(isB, concat(lit("https://example.org/doc/"),
              (col("doc_id") + 2).cast("string")))
            .otherwise(lit("")).as("loc"))
        graft.sources.WarcSource.exportWarc(input, loc.toString,
          nShards = 8, salt = "rd19",
          bodyContentType = "text/plain; charset=utf-8", gzip = true,
          statusCol = "stat", locationCol = "loc", verify = false)
        val responses = graft.sources.WarcSource
          .responseBodies(s, loc.toString)
          .select(col("uri").as("url"), col("status_code"), col("location"))
        graft.operators.Redirects.follow(responses)
          .select(
            regexp_extract(col("url"), "/doc/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            regexp_extract(col("final_url"), "/doc/(\\d+)$", 1)
              .cast("long").as("final_id"),
            col("n_hops"),
            col("resolved").cast("long").as("resolved"))
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT count(*) AS c FROM documents)
             |SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 8 = 0 AND doc_id + 6 < c THEN doc_id + 6
             |            WHEN doc_id % 8 = 4 AND doc_id + 2 < c THEN doc_id + 2
             |            ELSE doc_id END AS BIGINT) AS final_id,
             |  CAST(CASE WHEN doc_id % 8 = 0 AND doc_id + 6 < c THEN 2
             |            WHEN doc_id % 8 = 4 AND doc_id + 2 < c THEN 1
             |            ELSE 0 END AS BIGINT) AS n_hops,
             |  CAST(1 AS BIGINT) AS resolved
             |FROM documents, n ORDER BY doc_id""".stripMargin)),

    // ---- Crawl-delay politeness schedule: four hosts declare
    // host-dependent delays for the crawler's UA group (with a slower
    // '*' fallback group that must NOT be selected), and each host's
    // fetch queue is laid out on the delay grid — slot k × delay
    // seconds, FIFO by doc_id. Group selection (longest token), the
    // delay parse, and the per-host window are all in the hash.
    Q("q499_politeness_schedule",
      (s, d) => {
        val docs = t(s, d, "documents")
        val hosts = docs.select((col("doc_id") % 4).as("host")).distinct()
          .withColumn("delays", graft.operators.Robots.crawlDelays(concat(
            lit("User-agent: graftbot\r\nCrawl-delay: "),
            (col("host") + 1).cast("string"),
            lit("\r\nUser-agent: *\r\nCrawl-delay: 30\r\n"))))
          .select(col("host"),
            graft.operators.Robots.crawlDelayFor(col("delays"),
              lit("graftbot/1.0 (+https://example.org/bot)"))
              .as("delay_sec"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("host").orderBy("doc_id")
        docs.select(col("doc_id"), (col("doc_id") % 4).as("host"))
          .join(broadcast(hosts), Seq("host"))
          .withColumn("slot_sec",
            ((row_number().over(w) - 1).cast("double") * col("delay_sec")))
          .select(col("doc_id"), col("host"),
            col("delay_sec").cast("long").as("delay_sec"),
            col("slot_sec").cast("long").as("slot_sec"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, doc_id % 4 AS host,
             |  CAST(doc_id % 4 + 1 AS BIGINT) AS delay_sec,
             |  CAST((row_number() OVER (PARTITION BY doc_id % 4 ORDER BY doc_id) - 1)
             |    * (doc_id % 4 + 1) AS BIGINT) AS slot_sec
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- recrawl delta: the step that closes the crawl LIFECYCLE —
    // a freshly-fetched sitemap wave (parsed from built <urlset>
    // bodies, the q491 loop) diffed against the fetched-state table:
    // URLs absent from the state are NEW, URLs whose sitemap lastmod
    // moved past the recorded fetch date are MODIFIED, the rest are
    // skipped. State: docs with doc_id % 5 == 0 were never fetched;
    // fetch dates lag the new lastmod for doc_id % 3 == 0. The oracle
    // states the delta analytically, so sitemap parsing, the date
    // comparison, and the anti/semi membership split are all in the
    // hash.
    Q("q500_recrawl_delta",
      (s, d) => {
        val docs = t(s, d, "documents")
        // new sitemap wave: per-host urlsets with the CURRENT lastmod
        val newLastmod = concat(lit("2026-02-"),
          lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"))
        val urls = docs.select((col("doc_id") % 4).as("host"),
          struct(
            concat(lit("https://example.org/doc/"), col("doc_id")).as("loc"),
            newLastmod.as("lastmod")).as("u"))
        val xmls = urls.groupBy("host").agg(
          graft.operators.Sitemaps.buildUrlset(
            sort_array(collect_list(col("u")))).as("xml"))
        val wave = xmls
          .select(explode(graft.operators.Sitemaps.entries(col("xml")))
            .as("e"))
          .select(col("e.loc").as("loc"), col("e.lastmod").as("lastmod"))
        // fetched state: doc_id % 5 == 0 never fetched; fetch date is
        // Feb lastmod for doc_id % 3 != 0 (fresh), Jan for % 3 == 0
        // (stale -> modified)
        val state = docs.where(col("doc_id") % 5 =!= 0)
          .select(
            concat(lit("https://example.org/doc/"), col("doc_id"))
              .as("loc"),
            when(col("doc_id") % 3 === 0,
              concat(lit("2026-01-"),
                lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")))
              .otherwise(concat(lit("2026-02-"),
                lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")))
              .as("fetched"))
        val newUrls = wave.join(state, Seq("loc"), "left_anti")
          .select(col("loc"), lit("new").as("reason"))
        val modified = wave.join(state, Seq("loc"))
          .where(col("lastmod") > col("fetched"))
          .select(col("loc"), lit("modified").as("reason"))
        newUrls.union(modified)
          .select(regexp_extract(col("loc"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"), col("reason"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 5 = 0 THEN 'new' ELSE 'modified' END AS reason
             |FROM documents
             |WHERE doc_id % 5 = 0 OR doc_id % 3 = 0
             |ORDER BY doc_id""".stripMargin)),

    // ---- HTTP wire encodings (round 20 #1): real CommonCrawl WARC
    // payloads preserve the raw HTTP bytes, so compressed or chunk-
    // framed bodies must de-frame (Transfer-Encoding: chunked FIRST)
    // and decompress (Content-Encoding: gzip/deflate) BEFORE charset
    // resolution — the same silent-poison class the charset step closed
    // in r19. Five planted wire shapes per doc_id % 5: identity, gzip,
    // deflate (zlib), chunked carrying a UTF-16LE+BOM body (the BOM
    // sniff decides — a UTF-16 page defeats the ASCII meta sniff), and
    // gzip-then-chunked (the RFC 9112 layering, multi-chunk via the
    // doc's own text). The oracle states decoded text + all three audit
    // columns analytically, so de-framing order, both codecs, BOM
    // precedence, and the audit surface are all in the hash.
    Q("q501_http_encodings",
      (s, d) => {
        val loc = Tables.freshRoundtripDir(d, "warcenc")
        val docs = t(s, d, "documents")
        val idStr = col("doc_id").cast("string")
        val m = col("doc_id") % 5
        val bom = lit(Array(0xFF.toByte, 0xFE.toByte))
        val body = when(m === 0,
            encode(concat(lit("plain body doc "), idStr), "UTF-8"))
          .when(m === 1,
            encode(concat(lit("naïve café doc "), idStr), "UTF-8"))
          .when(m === 2,
            encode(concat(lit("deflate body doc "), idStr), "UTF-8"))
          .when(m === 3, concat(bom, encode(
            concat(lit("chunked utf16 café doc "), idStr, lit(" "),
              col("text")), "UTF-16LE")))
          .otherwise(encode(
            concat(lit("gzip and chunked — doc "), idStr, lit(" "),
              col("text")), "UTF-8"))
        val enc = when(m === 1, lit("gzip"))
          .when(m === 2, lit("deflate"))
          .when(m === 3, lit("chunked"))
          .when(m === 4, lit("gzip,chunked"))
          .otherwise(lit(""))
        val ctype = when(m === 3, lit("text/plain"))
          .otherwise(lit("text/plain; charset=utf-8"))
        val input = docs.select(col("doc_id"), body.as("body"),
          enc.as("enc"), ctype.as("ctype"))
        graft.sources.WarcSource.exportWarc(input, loc.toString,
          nShards = 8, salt = "enc20", bodyCol = "body",
          contentTypeCol = "ctype", encodingCol = "enc", gzip = true,
          verify = false)
        graft.sources.WarcSource.responseBodies(s, loc.toString)
          .select(
            regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            col("content_encoding"),
            col("was_chunked").cast("long").as("was_chunked"),
            col("transfer_encoding"),
            col("charset"),
            col("was_transcoded").cast("long").as("transcoded"),
            col("body"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE CAST(doc_id % 5 AS INT) WHEN 1 THEN 'gzip'
             |    WHEN 2 THEN 'deflate' WHEN 4 THEN 'gzip'
             |    ELSE '' END AS content_encoding,
             |  CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN 1 ELSE 0 END
             |    AS BIGINT) AS was_chunked,
             |  CASE WHEN doc_id % 5 IN (3, 4) THEN 'chunked' ELSE '' END
             |    AS transfer_encoding,
             |  CASE WHEN doc_id % 5 = 3 THEN 'UTF-16LE' ELSE 'UTF-8' END
             |    AS charset,
             |  CAST(CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END AS BIGINT)
             |    AS transcoded,
             |  CASE CAST(doc_id % 5 AS INT)
             |    WHEN 0 THEN 'plain body doc ' || CAST(doc_id AS VARCHAR)
             |    WHEN 1 THEN 'naïve café doc ' || CAST(doc_id AS VARCHAR)
             |    WHEN 2 THEN 'deflate body doc ' || CAST(doc_id AS VARCHAR)
             |    WHEN 3 THEN 'chunked utf16 café doc '
             |      || CAST(doc_id AS VARCHAR) || ' ' || text
             |    ELSE 'gzip and chunked ' || chr(8212) || ' doc '
             |      || CAST(doc_id AS VARCHAR) || ' ' || text
             |  END AS body
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- link/page crawl opt-outs (round 20 #2): rel=nofollow per
    // anchor (both attribute orders; a rel="noopener" decoy must NOT
    // flag) and <meta name="robots"> per page (both attribute orders).
    // Four fixed anchors per page and a doc_id % 3 meta cycle; the
    // oracle states every flag analytically, so attribute-order
    // handling, token matching (nofollow inside a rel token list), the
    // decoy, and the noindex directive parse are all in the hash.
    Q("q502_link_optouts",
      (s, d) => {
        val metaTag = when(col("doc_id") % 3 === 1,
            lit("<meta name=\"robots\" content=\"noindex\">"))
          .when(col("doc_id") % 3 === 2,
            lit("<meta content=\"noindex, nofollow\" name=\"robots\">"))
          .otherwise(lit(""))
        val page = concat(
          lit("<html><head>"), metaTag, lit("<title>x</title></head><body>"),
          lit("<a href=\"/a1\" rel=\"nofollow\">one link</a> "),
          lit("<a rel=\"me nofollow\" href=\"/a2\">two link</a> "),
          lit("<a href=\"/a3\" rel=\"noopener\">three link</a> "),
          lit("<a href=\"/a4\">four link</a>"),
          lit("</body></html>"))
        val docs = t(s, d, "documents")
          .select(col("doc_id"), page.as("html"),
            concat(lit("https://example.org/p/"), col("doc_id")).as("url"))
        docs.select(col("doc_id"),
            graft.operators.HtmlExtract.pageMeta(col("html"))
              .getField("meta_robots").as("meta_robots"),
            explode(graft.operators.HtmlExtract
              .links(col("html"), col("url"))).as("l"))
          .select(col("doc_id"), col("l.url").as("url"),
            col("l.nofollow").cast("long").as("nofollow"),
            col("meta_robots"),
            graft.operators.HtmlExtract
              .robotsMetaHas(col("meta_robots"), "noindex")
              .cast("long").as("noindex"))
          .orderBy("doc_id", "url")
      },
      Some("""SELECT doc_id, 'https://example.org/' || a.tail AS url,
             |  CAST(a.nf AS BIGINT) AS nofollow,
             |  CASE CAST(doc_id % 3 AS INT) WHEN 1 THEN 'noindex'
             |    WHEN 2 THEN 'noindex, nofollow' ELSE '' END AS meta_robots,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS BIGINT)
             |    AS noindex
             |FROM documents,
             |  (VALUES ('a1', 1), ('a2', 1), ('a3', 0), ('a4', 0))
             |    a(tail, nf)
             |ORDER BY doc_id, url""".stripMargin)),

    // ---- pipeline v10: the crawl loop with the FULL opt-out stack —
    // q497's composition (landing → links → canonicalize → RFC 9309
    // gate → incremental frontier) plus the publisher gates: an
    // anchor-level rel=nofollow drops that edge, a page-level
    // meta-robots nofollow drops ALL the page's outedges, and noindex
    // excludes the page from the indexed corpus while still expanding
    // through it (the standard crawler semantics). Depths differ from
    // q497 wherever an opted-out hop was the short path, and the
    // indexed flag is read off the LANDED pages' extracted meta — so
    // both directives' effects on the BFS tree are in the hash.
    Q("q503_pipeline_v10",
      (s, d) => {
        val locW = Tables.freshRoundtripDir(d, "v10warc")
        val locF = Tables.freshRoundtripDir(d, "v10frontier")
        val docs = t(s, d, "documents")
        val n = docs.count()
        val pages = docs.select(col("doc_id"),
          graft.operators.HtmlExtract
            .syntheticPageOptOut(col("text"), col("doc_id"), n).as("html"))
        graft.sources.WarcSource.exportWarc(pages, locW.toString,
          nShards = 8, salt = "v10w", bodyCol = "html", gzip = true,
          verify = false)
        val rules = graft.operators.Robots.rulesLiteral(s,
          "User-agent: *\r\nDisallow: /doc/*0$\r\n")
        val landed = graft.sources.WarcSource
          .responseBodies(s, locW.toString)
          .select(regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("src"), col("body").as("html"),
            col("uri").as("url"),
            graft.operators.HtmlExtract.pageMeta(col("body"))
              .getField("meta_robots").as("meta_robots"))
          .localCheckpoint()
        val edges = landed
          .where(!graft.operators.HtmlExtract
            .robotsMetaHas(col("meta_robots"), "nofollow"))
          .select(col("src"),
            explode(graft.operators.HtmlExtract
              .links(col("html"), col("url"))).as("l"))
          .where(!col("l.nofollow"))
          .select(col("src"),
            graft.operators.HtmlExtract.canonicalizeUrl(col("l.url"))
              .as("u"))
          .where(col("u").rlike("^https://example\\.org/doc/\\d+$"))
          .where(graft.operators.Robots.robotsAllows(rules, lit("graftbot"),
            regexp_extract(col("u"),
              "^https://example\\.org(/doc/\\d+)$", 1)))
          .select(col("src"),
            regexp_extract(col("u"), "/doc/(\\d+)$", 1)
              .cast("long").as("dst"))
        val seeds = docs.where(col("doc_id") < 10).select("doc_id")
        val visited = graft.streaming.CrawlFrontier
          .run(s, edges, seeds, locF.toString)
        visited
          .join(landed.select(col("src").as("doc_id"),
            (!graft.operators.HtmlExtract
              .robotsMetaHas(col("meta_robots"), "noindex"))
              .cast("long").as("indexed")), Seq("doc_id"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE n AS (SELECT count(*) AS c FROM documents),
             |e AS (SELECT doc_id AS src, (doc_id*7 + k) % c AS dst, k
             |      FROM documents, n, (VALUES (1),(2),(3)) v(k)),
             |ee AS (SELECT src, dst FROM e
             |       WHERE dst % 10 <> 0
             |         AND src % 7 <> 0
             |         AND NOT (k = 2 AND src % 3 = 0)),
             |bfs(doc_id, depth) AS (
             |  SELECT doc_id, CAST(0 AS BIGINT) FROM documents WHERE doc_id < 10
             |  UNION
             |  SELECT ee.dst, b.depth + 1 FROM bfs b JOIN ee ON ee.src = b.doc_id
             |  WHERE b.depth < 40)
             |SELECT doc_id, CAST(min(depth) AS BIGINT) AS depth,
             |  CAST(CASE WHEN doc_id % 7 IN (0, 1) THEN 0 ELSE 1 END
             |    AS BIGINT) AS indexed
             |FROM bfs GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- canonical-collapse dedup (round 20 #3): the publisher's own
    // dedup signal consumed at last — rel=canonical targets extracted
    // off constructed pages (q492's proven path), then ONE groupBy
    // folds the corpus before any content-similarity pass. Three
    // planted shapes: even docs declare doc/(id%100) (the designated
    // copy LANDED in the corpus — winner must be the target itself,
    // not min id), ids ≡ 1 mod 10 declare an off-corpus target (winner
    // falls back to min id), the rest declare nothing (self-groups).
    // Messy self-URLs (case, utm, fragment) must canonicalize before
    // keying. The oracle replays key/winner/count analytically.
    Q("q504_canonical_collapse",
      (s, d) => {
        val docs = t(s, d, "documents")
        val idStr = col("doc_id").cast("string")
        val canonTarget =
          when(col("doc_id") % 2 === 0,
            concat(lit("https://example.org/doc/"),
              (col("doc_id") % 100).cast("string")))
          .when(col("doc_id") % 10 === 1,
            concat(lit("https://example.org/off/"),
              (col("doc_id") % 20).cast("string")))
          .otherwise(lit(""))
        val canonTag = when(canonTarget =!= "",
            concat(lit("<link rel=\"canonical\" href=\""), canonTarget,
              lit("\">")))
          .otherwise(lit(""))
        val page = concat(lit("<html><head>"), canonTag,
          lit("<title>t</title></head><body><p>x</p></body></html>"))
        val withMeta = docs.select(col("doc_id"),
          concat(lit("HTTPS://Example.ORG/doc/"), idStr,
            lit("?utm_q=1#frag")).as("url"),
          graft.operators.HtmlExtract.pageMeta(page)
            .getField("canonical").as("canonical"))
        graft.operators.Dedup.canonicalCollapse(withMeta)
          .orderBy("doc_id")
      },
      Some("""WITH k AS (SELECT doc_id,
             |    'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS self,
             |    CASE WHEN doc_id % 2 = 0
             |      THEN 'https://example.org/doc/' || CAST(doc_id % 100 AS VARCHAR)
             |      WHEN doc_id % 10 = 1
             |      THEN 'https://example.org/off/' || CAST(doc_id % 20 AS VARCHAR)
             |      ELSE 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
             |    END AS canon
             |  FROM documents),
             |g AS (SELECT canon AS canon_url,
             |    min(CASE WHEN self = canon THEN 0 ELSE 1 END * 1000000000
             |      + doc_id) AS wk,
             |    CAST(count(*) AS BIGINT) AS n_docs
             |  FROM k GROUP BY canon)
             |SELECT canon_url, CAST(wk % 1000000000 AS BIGINT) AS doc_id,
             |  n_docs
             |FROM g ORDER BY doc_id""".stripMargin)),

    // ---- redirect discovery channel (round 20 #5): resolved redirects
    // feed the frontier next to page links (and q494's sitemaps) —
    // fetching a 301 yields no parseable page, but its resolved target
    // IS a discovered URL. Docs with id % 8 == 0 land as 301s (their
    // link edges VANISH — a fetcher does not parse 3xx bodies, gated on
    // status_code == 200) and contribute (url → final_url) alias edges
    // from the pending-only [[Redirects.follow]] loop instead; several
    // targets are reachable ONLY through a redirect edge. Two BFS
    // rounds over the union edge set; the oracle unrolls both channels
    // and both rounds analytically, so the status gate, the resolution
    // loop, and the channel union are all in the hash.
    Q("q505_redirect_channel",
      (s, d) => {
        val loc = Tables.freshRoundtripDir(d, "warcrdch")
        val docs = t(s, d, "documents")
        val n = docs.count()
        val isRedir = col("doc_id") % 8 === 0 && col("doc_id") + 5 < n
        val pages = docs.select(col("doc_id"),
          graft.operators.HtmlExtract
            .syntheticPageLinked(col("text"), col("doc_id"), n).as("html"),
          when(isRedir, lit("301 Moved Permanently"))
            .otherwise(lit("200 OK")).as("stat"),
          when(isRedir, concat(lit("/doc/"),
              (col("doc_id") + 5).cast("string")))
            .otherwise(lit("")).as("locn"))
        graft.sources.WarcSource.exportWarc(pages, loc.toString,
          nShards = 8, salt = "rdch", bodyCol = "html", gzip = true,
          statusCol = "stat", locationCol = "locn", verify = false)
        val responses = graft.sources.WarcSource
          .responseBodies(s, loc.toString)
          .localCheckpoint()
        val linkEdges = responses.where(col("status_code") === 200)
          .select(regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("src"),
            explode(graft.operators.HtmlExtract
              .links(col("body"), col("uri"))).as("l"))
          .select(col("src"),
            graft.operators.HtmlExtract.canonicalizeUrl(col("l.url"))
              .as("u"))
          .where(col("u").rlike("^https://example\\.org/doc/\\d+$"))
          .select(col("src"),
            regexp_extract(col("u"), "/doc/(\\d+)$", 1)
              .cast("long").as("dst"))
        val redirEdges = graft.operators.Redirects.follow(
            responses.select(col("uri").as("url"), col("status_code"),
              col("location")))
          .where(col("n_hops") > 0 && col("resolved"))
          .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
            .cast("long").as("src"),
            regexp_extract(col("final_url"), "/doc/(\\d+)$", 1)
              .cast("long").as("dst"))
        val edges = linkEdges.union(redirEdges).localCheckpoint()
        val seeds = docs.where(col("doc_id") < 10).select("doc_id")
        def expand(frontier: org.apache.spark.sql.DataFrame) =
          edges.join(frontier.withColumnRenamed("doc_id", "src"), Seq("src"))
            .select(col("dst").as("doc_id")).distinct()
        val d1 = expand(seeds).join(seeds, Seq("doc_id"), "left_anti")
        val visited1 = seeds.union(d1)
        val d2 = expand(d1).join(visited1, Seq("doc_id"), "left_anti")
        seeds.withColumn("depth", lit(0L))
          .union(d1.withColumn("depth", lit(1L)))
          .union(d2.withColumn("depth", lit(2L)))
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT count(*) AS c FROM documents),
             |rd AS (SELECT doc_id AS src, doc_id + 5 AS dst
             |       FROM documents, n WHERE doc_id % 8 = 0 AND doc_id + 5 < c),
             |lk AS (SELECT d.doc_id AS src, (d.doc_id*7 + k) % c AS dst
             |       FROM documents d, n, (VALUES (1),(2),(3)) v(k)
             |       WHERE NOT (d.doc_id % 8 = 0 AND d.doc_id + 5 < c)),
             |e AS (SELECT src, dst FROM rd UNION ALL SELECT src, dst FROM lk),
             |s0 AS (SELECT doc_id FROM documents WHERE doc_id < 10),
             |d1 AS (SELECT DISTINCT dst AS doc_id FROM e
             |       JOIN s0 ON e.src = s0.doc_id
             |       WHERE dst NOT IN (SELECT doc_id FROM s0)),
             |d2 AS (SELECT DISTINCT dst AS doc_id FROM e
             |       JOIN d1 ON e.src = d1.doc_id
             |       WHERE dst NOT IN (SELECT doc_id FROM s0)
             |         AND dst NOT IN (SELECT doc_id FROM d1))
             |SELECT doc_id, CAST(0 AS BIGINT) AS depth FROM s0
             |UNION ALL SELECT doc_id, 1 FROM d1
             |UNION ALL SELECT doc_id, 2 FROM d2
             |ORDER BY doc_id""".stripMargin)),

    // ---- conditional-revalidation recrawl (round 20 #6): q500 said
    // WHAT changed; this says HOW to fetch it. The fetched-state table
    // grows the validators the last fetch returned (etag for
    // doc_id % 2 == 0, an http Last-Modified for doc_id % 11 == 0) and
    // [[Recrawl.delta]] plans: absent → new (plain GET), stale with a
    // validator → revalidate (conditional GET, etag preferred per RFC
    // 9110 §13.1.3 — in the hash where both validators exist), stale
    // bare → refetch, fresh → no row. The wave still parses out of
    // built urlsets (the q500 loop), and the emitted conditional
    // header line is pinned verbatim.
    Q("q506_conditional_revalidation",
      (s, d) => {
        val docs = t(s, d, "documents")
        val newLastmod = concat(lit("2026-02-"),
          lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"))
        val urls = docs.select((col("doc_id") % 4).as("host"),
          struct(
            concat(lit("https://example.org/doc/"), col("doc_id")).as("loc"),
            newLastmod.as("lastmod")).as("u"))
        val xmls = urls.groupBy("host").agg(
          graft.operators.Sitemaps.buildUrlset(
            sort_array(collect_list(col("u")))).as("xml"))
        val wave = xmls
          .select(explode(graft.operators.Sitemaps.entries(col("xml")))
            .as("e"))
          .select(col("e.loc").as("loc"), col("e.lastmod").as("lastmod"))
        val state = docs.where(col("doc_id") % 5 =!= 0)
          .select(
            concat(lit("https://example.org/doc/"), col("doc_id"))
              .as("loc"),
            when(col("doc_id") % 3 === 0,
              concat(lit("2026-01-"),
                lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")))
              .otherwise(concat(lit("2026-02-"),
                lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")))
              .as("fetched"),
            when(col("doc_id") % 2 === 0,
              concat(lit("\"v"), col("doc_id").cast("string"), lit("\"")))
              .otherwise(lit("")).as("etag"),
            when(col("doc_id") % 11 === 0,
              lit("Mon, 05 Jan 2026 00:00:00 GMT"))
              .otherwise(lit("")).as("last_modified"))
        graft.operators.Recrawl.delta(wave, state)
          .select(regexp_extract(col("loc"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
            col("reason"), col("validator"), col("cond_header"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 5 = 0 THEN 'new'
             |    WHEN doc_id % 2 = 0 OR doc_id % 11 = 0 THEN 'revalidate'
             |    ELSE 'refetch' END AS reason,
             |  CASE WHEN doc_id % 5 = 0 THEN ''
             |    WHEN doc_id % 2 = 0 THEN 'etag'
             |    WHEN doc_id % 11 = 0 THEN 'last-modified'
             |    ELSE '' END AS validator,
             |  CASE WHEN doc_id % 5 = 0 THEN ''
             |    WHEN doc_id % 2 = 0
             |      THEN 'If-None-Match: "v' || CAST(doc_id AS VARCHAR) || '"'
             |    WHEN doc_id % 11 = 0
             |      THEN 'If-Modified-Since: Mon, 05 Jan 2026 00:00:00 GMT'
             |    ELSE '' END AS cond_header
             |FROM documents
             |WHERE doc_id % 5 = 0 OR doc_id % 3 = 0
             |ORDER BY doc_id""".stripMargin))
  )
}
