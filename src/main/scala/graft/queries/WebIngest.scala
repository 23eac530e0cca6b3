package graft.queries

import org.apache.spark.sql.functions._

import graft.queries.Tables.t

/** Round-18 web-crawl ingestion tier: HTML main-content extraction
  * ([[graft.operators.HtmlExtract]]) and the WARC landing source
  * ([[graft.sources.WarcSource]]) — the two stages upstream of
  * everything else in a crawl→training-data pipeline (VERDICT r17
  * "What's missing" #1/#2).
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
      |          'Editorial note: tips & tricks for <html> parsing in ten words', kept),
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
        val loc = new java.io.File(Tables.roundtripLoc(d, "warcrt"))
        def rmTree(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
          f.delete(); ()
        }
        if (loc.exists()) rmTree(loc)
        val docs = t(s, d, "documents")
        val n = graft.sources.WarcSource.exportWarc(docs, loc.toString,
          nShards = 8, salt = "warc1",
          bodyContentType = "text/plain; charset=utf-8", gzip = true)
        require(n == docs.count(),
          s"warc read-back found $n responses, corpus has ${docs.count()}")
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
        val loc = new java.io.File(Tables.roundtripLoc(d, "warccrawl"))
        def rmTree(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
          f.delete(); ()
        }
        if (loc.exists()) rmTree(loc)
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
      bench = true)
  )
}
