package graft.queries

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.queries.Tables.t
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators as registered queries over the
  * documents/embeddings tables: dedup (exact / shingle-Jaccard / MinHash-LSH
  * / SimHash), similarity search (brute + LSH), text analysis (lang-id,
  * quality, tokens, fingerprint), and multimodal metadata plumbing.
  *
  * Hash-function-dependent sketches (MinHash/SimHash/SRP) have no DuckDB
  * oracle — their verification lives in PipelineOpsSpec (planted-duplicate
  * recall + consistency against the exact variants); the driver records a
  * rows-only check for them.
  */
object PipelineQueries {

  private val EnList = TextAnalysis.Profiles.toMap.apply("en").map(w => s"'$w'").mkString(", ")

  /** Total (id_a, id_b) presentation order for near-dup PAIR results.
    * `repartition(1) + sortWithinPartitions` instead of `orderBy`: a range
    * exchange samples partition boundaries by RE-EXECUTING the plan below
    * it, and for these queries "below" is the expensive verification tail
    * while the pair list itself is tiny. One output partition is the right
    * scale for a result that is orders of magnitude smaller than its
    * input (and the round-robin repartition keeps the verification stage
    * itself fully parallel). */
  private def sortedPairs(df: org.apache.spark.sql.DataFrame) =
    df.repartition(1).sortWithinPartitions("id_a", "id_b")

  /** Deterministic planted SimHash corpus (see q53): word-disjoint base
    * docs, exact twins for 0-3, one-word-perturbed twins for 4-7. */
  private[graft] def plantedSimhashDocs(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    def words(i: Int) = (0 until 150).map(j => s"w${i}_$j")
    val base = (0 until 12).map(i => (i.toLong, words(i).mkString(" ")))
    val exact = (0 until 4).map(i => (i + 100L, words(i).mkString(" ")))
    val near = (4 until 8).map { i =>
      (i + 100L, words(i).updated(0, s"x${i}_alt").mkString(" "))
    }
    (base ++ exact ++ near).toDF("doc_id", "text")
  }
  /** DuckDB replica of the md5-token-hash SimHash pipeline (q62): 60-bit
    * token hashes (first 15 hex chars of md5, identical in both engines),
    * per-bit ±1 votes, signature assembly, and the O(n²)-at-oracle-scale
    * hamming self-join the block-combination candidates must equal. */
  private val simhashMd5Sql = {
    val votes = (0 until 60).map(b =>
      s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS v$b").mkString(", ")
    val sig = (0 until 60).map(b =>
      s"(CASE WHEN v$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END)").mkString(" | ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |h AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h FROM tok),
       |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, $sig AS sig FROM v)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  private val shingleSql =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT ia AS id_a, ib AS id_b,
      |  (round((i::DOUBLE / (ca.n + cb.n - i)) * 1000000.0) / 1000000.0) AS jaccard
      |FROM inter JOIN cnt ca ON ca.doc_id = ia JOIN cnt cb ON cb.doc_id = ib
      |WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- exact dedup: canonical-keeper per distinct text.
    Q("q20_dedup_exact",
      (s, d) => Dedup.exactGroups(t(s, d, "documents"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy("keep_id"),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin),
      bench = true),

    // ---- normalization fingerprint (md5 — engine-portable).
    Q("q21_fingerprint",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  md5(lower(trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g')))) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- exact 3-gram-shingle Jaccard near-dup pairs.
    Q("q22_dedup_shingle",
      (s, d) => sortedPairs(Dedup.shingleJaccardPairs(t(s, d, "documents"), 0.5)),
      Some(shingleSql),
      bench = true),

    // ---- MinHash-LSH near-dups (scale path). Candidate generation is
    // xxhash-dependent, but every candidate is exact-Jaccard-verified, so
    // the output is a subset of the exact shingle pairs — and on this corpus
    // LSH recall is total (spec-checked), so the exact-pairs SQL is a full
    // hash-match oracle: any missed pair or hash drift fails the compare.
    Q("q23_dedup_minhash",
      (s, d) => sortedPairs(Dedup.minHashLshPairs(t(s, d, "documents"), 0.5)),
      Some(shingleSql),
      bench = true),

    // ---- duplicate clusters: connected components over the exact
    // shingle-Jaccard pairs (min-label = canonical keeper per component).
    // Oracle recomputes the same edges in SQL and closes them with a
    // recursive CTE.
    Q("q71_dup_clusters",
      (s, d) => Dedup.duplicateClusters(
        Dedup.shingleJaccardPairs(t(s, d, "documents"), 0.5))
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS s
             |       FROM ws WHERE len(w) >= 3),
             |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2),
             |pairs AS (SELECT ia, ib
             |          FROM inter JOIN cnt ca ON ca.doc_id = ia JOIN cnt cb ON cb.doc_id = ib
             |          WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5),
             |edges AS (SELECT ia AS u, ib AS v FROM pairs
             |          UNION SELECT ib, ia FROM pairs),
             |reach AS (SELECT u AS src, u AS dst FROM edges
             |          UNION
             |          SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
             |SELECT src AS doc_id, min(dst) AS cluster
             |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- canonical-doc election over the q71 clusters: keep-longest
    // (ties to min doc_id), every clustered doc flagged keep/drop.
    Q("q112_cluster_canonical",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.canonicalizeClusters(
          Dedup.duplicateClusters(Dedup.shingleJaccardPairs(docs, 0.5)), docs)
          .select(col("doc_id"), col("cluster"),
            col("keep").cast("long").as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS s
             |       FROM ws WHERE len(w) >= 3),
             |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2),
             |pairs AS (SELECT ia, ib
             |          FROM inter JOIN cnt ca ON ca.doc_id = ia JOIN cnt cb ON cb.doc_id = ib
             |          WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5),
             |edges AS (SELECT ia AS u, ib AS v FROM pairs
             |          UNION SELECT ib, ia FROM pairs),
             |reach AS (SELECT u AS src, u AS dst FROM edges
             |          UNION
             |          SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
             |cl AS (SELECT src AS doc_id, min(dst) AS cluster FROM reach GROUP BY src),
             |sized AS (SELECT cl.doc_id, cl.cluster, d.n_chars FROM cl JOIN documents d USING (doc_id)),
             |k AS (SELECT cluster, doc_id AS keeper FROM (
             |       SELECT cluster, doc_id,
             |         row_number() OVER (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS rn
             |       FROM sized) WHERE rn = 1)
             |SELECT s.doc_id, s.cluster, CAST(s.doc_id = k.keeper AS BIGINT) AS keep
             |FROM sized s JOIN k USING (cluster) ORDER BY s.doc_id""".stripMargin),
      bench = true),

    // ---- weighted PageRank over the customer-nation -> supplier-nation
    // trade graph, 5 fixed iterations (deterministic, oracle-unrollable).
    Q("q113_pagerank_trade",
      (s, d) => {
        val nation = t(s, d, "nation")
        val edges = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation.select(col("n_nationkey").as("ck"),
            col("n_name").as("src"))), col("c_nationkey") === col("ck"))
          .join(broadcast(nation.select(col("n_nationkey").as("sk"),
            col("n_name").as("dst"))), col("s_nationkey") === col("sk"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.operators.GraphOps.pageRank(edges, iterations = 5)
          .select(col("node"), round(col("rank"), 6).as("rank"))
          .orderBy("node")
      },
      Some("""WITH edges AS (SELECT cn.n_name AS src, sn.n_name AS dst, CAST(count(*) AS DOUBLE) AS w
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation cn ON c_nationkey = cn.n_nationkey
             |  JOIN nation sn ON s_nationkey = sn.n_nationkey
             |  GROUP BY 1, 2),
             |norm AS (SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p FROM edges),
             |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
             |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
             |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),
             |r1 AS (SELECT v.node, 0.15 / nn.n + 0.85 * coalesce(
             |        (SELECT sum(m.p * r.rank) FROM norm m JOIN r0 r ON r.node = m.src WHERE m.dst = v.node), 0.0) AS rank
             |       FROM nodes v, nn),
             |r2 AS (SELECT v.node, 0.15 / nn.n + 0.85 * coalesce(
             |        (SELECT sum(m.p * r.rank) FROM norm m JOIN r1 r ON r.node = m.src WHERE m.dst = v.node), 0.0) AS rank
             |       FROM nodes v, nn),
             |r3 AS (SELECT v.node, 0.15 / nn.n + 0.85 * coalesce(
             |        (SELECT sum(m.p * r.rank) FROM norm m JOIN r2 r ON r.node = m.src WHERE m.dst = v.node), 0.0) AS rank
             |       FROM nodes v, nn),
             |r4 AS (SELECT v.node, 0.15 / nn.n + 0.85 * coalesce(
             |        (SELECT sum(m.p * r.rank) FROM norm m JOIN r3 r ON r.node = m.src WHERE m.dst = v.node), 0.0) AS rank
             |       FROM nodes v, nn),
             |r5 AS (SELECT v.node, 0.15 / nn.n + 0.85 * coalesce(
             |        (SELECT sum(m.p * r.rank) FROM norm m JOIN r4 r ON r.node = m.src WHERE m.dst = v.node), 0.0) AS rank
             |       FROM nodes v, nn)
             |SELECT node, round(rank, 6) AS rank FROM r5 ORDER BY node""".stripMargin),
      bench = true),

    // ---- synchronous label-propagation communities over the SAME trade
    // graph, thresholded to above-average-weight edges so the structure
    // is non-trivial; 4 fixed rounds, each unrolled in the oracle. Vote
    // sums are exact integer counts, so the (weight desc, label asc)
    // tie-break is total-order stable cross-engine.
    Q("q170_label_prop_communities",
      (s, d) => {
        val nation = t(s, d, "nation")
        val raw = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation.select(col("n_nationkey").as("ck"),
            col("n_name").as("src"))), col("c_nationkey") === col("ck"))
          .join(broadcast(nation.select(col("n_nationkey").as("sk"),
            col("n_name").as("dst"))), col("s_nationkey") === col("sk"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        val avgW = raw.agg(avg(col("w")).as("aw"))
        val edges = raw.join(broadcast(avgW))
          .where(col("w").cast("double") > col("aw"))
          .select("src", "dst", "w")
        graft.operators.GraphOps.labelPropagation(edges, rounds = 4)
          .orderBy("node")
      },
      Some {
        val rounds = (1 to 4).map { r =>
          s"""l$r AS (SELECT p.node, coalesce(t.label, p.label) AS label
             |  FROM l${r - 1} p LEFT JOIN (
             |    SELECT v, label FROM (
             |      SELECT s.src AS v, q.label AS label, sum(s.w) AS ws,
             |        row_number() OVER (PARTITION BY s.src
             |          ORDER BY sum(s.w) DESC, q.label) AS rn
             |      FROM sym s JOIN l${r - 1} q ON q.node = s.dst
             |      GROUP BY s.src, q.label) z WHERE rn = 1) t ON t.v = p.node)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH raw AS (SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation cn ON c_nationkey = cn.n_nationkey
           |  JOIN nation sn ON s_nationkey = sn.n_nationkey
           |  GROUP BY 1, 2),
           |aw AS (SELECT avg(w) AS aw FROM raw),
           |ed AS (SELECT src, dst, w FROM raw, aw WHERE w > aw),
           |sym AS (SELECT src, dst, sum(w) AS w FROM (
           |    SELECT src, dst, w FROM ed WHERE src <> dst
           |    UNION ALL
           |    SELECT dst AS src, src AS dst, w FROM ed WHERE src <> dst)
           |  GROUP BY 1, 2),
           |nodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
           |l0 AS (SELECT node, node AS label FROM nodes),
           |$rounds
           |SELECT node, label FROM l4 ORDER BY node""".stripMargin
      }),

    // ---- SimHash signatures + hamming<=3 pairs on the real corpus
    // (xxhash-dependent hamming values -> rows-only; the oracle-checked
    // SimHash entry is q53 on the planted corpus below).
    Q("q24_dedup_simhash",
      (s, d) => sortedPairs(Dedup.simHashPairs(t(s, d, "documents"), 3)),
      None),

    // ---- SimHash on a planted corpus with a-priori expected pairs:
    // 12 word-disjoint 150-word docs; ids 0-3 get exact twins (+100,
    // hamming 0 BY CONSTRUCTION — identical text ⇒ identical signature),
    // ids 4-7 get one-word-perturbed twins (+100, near-dup ⇒ hamming ≤ 3;
    // measured 0/1/2/1 under Spark's fixed xxhash64 seed), ids 8-11 have
    // no twin and all cross-doc pairs are word-disjoint (hamming ≫ 10).
    // The oracle checks the PAIRS FOUND — completeness (all 8 planted
    // twins) and precision (nothing else) — not hash internals.
    Q("q53_simhash_planted",
      (s, d) => {
        import s.implicits._
        sortedPairs(Dedup.simHashPairs(plantedSimhashDocs(s), 3))
      },
      Some("""SELECT * FROM (VALUES
             |  (0::BIGINT, 100::BIGINT, 0::BIGINT), (1, 101, 0), (2, 102, 0),
             |  (3, 103, 0), (4, 104, 0), (5, 105, 1), (6, 106, 2), (7, 107, 1))
             |AS t(id_a, id_b, hamming) ORDER BY id_a, id_b""".stripMargin)),

    // ---- SimHash with an engine-portable token hash (60-bit truncated
    // md5): votes, signature bits, block-combination candidates, and
    // hamming verify are all reproduced by the DuckDB oracle — the
    // oracle-checked SimHash on the REAL corpus (q24 keeps the xxhash64
    // production path; its hash internals are what make it rows-only).
    Q("q62_simhash_md5",
      (s, d) => sortedPairs(Dedup.simHashPairs(t(s, d, "documents"), 3,
        tokenHash = graft.expressions.PortableHash.md5Hash60,
        bits = 60)),
      Some(simhashMd5Sql)),

    // ---- brute-force cosine top-k for a corpus query vector.
    Q("q25_sim_topk",
      (s, d) => Similarity.bruteForceTopK(t(s, d, "embeddings"), 0L, 10),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
             |SELECT vec_id, (round((list_cosine_similarity(v, qv)) * 1000000.0) / 1000000.0) AS cos
             |FROM e, q WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin),
      bench = true),

    // ---- SRP-LSH bucketed ANN. Candidates are hash-bucketed but re-ranked
    // by EXACT cosine, so with recall-sufficient table count (24 tables ×
    // 3 planes — spec-checked total recall on this corpus) the output
    // equals brute force and the exact top-k SQL is a full oracle.
    Q("q26_sim_topk_lsh",
      (s, d) => Similarity.lshTopK(t(s, d, "embeddings"), 0L, 10,
        tables = 24, planes = 3),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
             |SELECT vec_id, (round((list_cosine_similarity(v, qv)) * 1000000.0) / 1000000.0) AS cos
             |FROM e, q WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- IVF ANN (coarse k-means quantizer + nprobe). Probed cells are
    // re-ranked by exact cosine; nProbe=6 of 16 cells recovers the full
    // top-10 on this corpus (spec-checked), so brute-force SQL is a full
    // oracle here too.
    Q("q49_sim_topk_ivf",
      (s, d) => Similarity.ivfTopK(t(s, d, "embeddings"), 0L, 10, nProbe = 6),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
             |SELECT vec_id, (round((list_cosine_similarity(v, qv)) * 1000000.0) / 1000000.0) AS cos
             |FROM e, q WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- symmetric int8 embedding quantization (4x storage/shuffle
    // compression for ANN at scale); codes are deterministic IEEE double
    // arithmetic, reproduced exactly by the oracle. The registered form
    // joins the code array into a CSV string (`q_codes`) because the
    // driver's pandas comparator cannot sort raw array columns — the array
    // API (`quantizeInt8`) stays the internal form q65 consumes.
    Q("q63_quantize_int8",
      (s, d) => Similarity.quantizeInt8(t(s, d, "embeddings"))
        .select(col("vec_id"),
          concat_ws(",", col("q").cast("array<string>")).as("q_codes"),
          col("qscale"))
        .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |s AS (SELECT vec_id, v, list_max([abs(x) for x in v]) / 127.0 AS scale FROM e)
             |SELECT vec_id,
             |  CASE WHEN scale = 0 THEN array_to_string([0::BIGINT for x in v], ',')
             |       ELSE array_to_string([CAST(floor(x / scale + 0.5) AS BIGINT) for x in v], ',') END AS q_codes,
             |  round(scale * 1000000000.0) / 1000000000.0 AS qscale
             |FROM s ORDER BY vec_id""".stripMargin)),

    // ---- two-stage ANN over the int8 codes (cheap quantized-dot scan ->
    // exact re-rank). Re-rank depth 50 recovers the exact top-10 on this
    // corpus (spec-checked), so brute-force SQL is a full oracle — same
    // convention as q26/q49.
    Q("q65_sim_topk_int8",
      (s, d) => Similarity.int8TopK(t(s, d, "embeddings"), 0L, 10),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
             |SELECT vec_id, (round((list_cosine_similarity(v, qv)) * 1000000.0) / 1000000.0) AS cos
             |FROM e, q WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- embedding near-dup pairs (exact; empty on this corpus by design).
    Q("q27_emb_neardup",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        // scaled planes — the q101 sizing note applies (sf0.01 floor)
        sortedPairs(Similarity.nearDupPairs(emb, 0.8,
          planes = Similarity.scaledPlanes(emb)))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  (round((list_cosine_similarity(a.v, b.v)) * 1000000.0) / 1000000.0) AS cos
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |WHERE (round((list_cosine_similarity(a.v, b.v)) * 1000000.0) / 1000000.0) >= 0.8
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- SemDeDup-style semantic dedup: survivors after dropping all but
    // the min-id member of every embedding near-dup component (transitive:
    // A~B~C keeps only A even when cos(A,C) < tau). Oracle = exact
    // all-pairs cosine graph + recursive CC in DuckDB; the engine side is
    // SRP-bucketed pairs + pointer-jumping components.
    Q("q101_semantic_dedup",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        // plane count scales with the corpus (constant expected bucket
        // size — the r13 sf1 stress cliff); sf0.01 floor keeps 28×6
        Similarity.semanticDedup(emb, 0.8,
            planes = Similarity.scaledPlanes(emb))
          .select(col("vec_id")).orderBy("vec_id")
      },
      Some("""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v
             |                     FROM embeddings),
             |p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
             |      FROM e a JOIN e b ON a.vec_id < b.vec_id
             |      WHERE round(list_cosine_similarity(a.v, b.v) * 1000000.0)
             |            / 1000000.0 >= 0.8),
             |edges AS (SELECT ia AS u, ib AS v FROM p UNION SELECT ib, ia FROM p),
             |reach AS (SELECT u AS src, u AS dst FROM edges
             |          UNION
             |          SELECT r.src, e2.v FROM reach r JOIN edges e2 ON r.dst = e2.u),
             |lab AS (SELECT src AS vec_id, min(dst) AS cluster
             |        FROM reach GROUP BY src)
             |SELECT vec_id FROM embeddings
             |WHERE vec_id NOT IN (SELECT vec_id FROM lab WHERE vec_id <> cluster)
             |ORDER BY vec_id""".stripMargin),
      bench = true),

    // ---- BPE tokenizer training, driver-checked where SQL can follow:
    // the FIRST learned merge is a closed-form aggregation (adjacent char
    // pairs weighted by word count, </w> marker on word-final chars, total
    // tie-break), so q102 oracles Bpe.train(numMerges=1) exactly. Deeper
    // merge tables are inherently iterative (each round depends on the
    // previous rewrite) — spec-checked on the classic hand-computable
    // corpus instead (PipelineOpsSpec).
    Q("q102_bpe_first_merge",
      (s, d) => {
        import s.implicits._
        graft.operators.Bpe.train(t(s, d, "documents"), numMerges = 1)
          .toDF().select(col("left"), col("right"), col("pair_count"))
      },
      Some("""WITH wc AS (SELECT word, count(*) AS c
             |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             |  WHERE len(word) > 0 GROUP BY word),
             |idx AS (SELECT unnest(range(1, 101)) AS i),
             |pairs AS (SELECT substring(word, CAST(i AS INT), 1) AS l,
             |            substring(word, CAST(i AS INT) + 1, 1) ||
             |              CASE WHEN i + 1 = len(word) THEN '</w>' ELSE '' END AS r,
             |            c
             |          FROM wc JOIN idx ON i <= len(word) - 1)
             |SELECT l AS "left", r AS "right", CAST(sum(c) AS BIGINT) AS pair_count
             |FROM pairs GROUP BY l, r
             |ORDER BY pair_count DESC, l, r LIMIT 1""".stripMargin)),

    // ---- one-merge BPE segmentation: per-doc learned-vocab token counts
    // after applying the single learned merge. The oracle DERIVES the
    // merge itself (same aggregation as q102), then replays it in SQL:
    // a word of n chars starts as n symbols (the </w> marker rides the
    // final char); a marker-right merge fires at most once (word-final),
    // a plain-right merge fires once per non-overlapping occurrence
    // inside the first n-1 chars (replace() is left-to-right
    // non-overlapping — exactly mergeOnce's scan order).
    Q("q103_bpe_token_counts",
      (s, d) => {
        val m = graft.operators.Bpe.train(t(s, d, "documents"), numMerges = 1)
        graft.operators.Bpe.tokenCounts(t(s, d, "documents"), m)
          .orderBy("doc_id")
      },
      Some("""WITH wc AS (SELECT word, count(*) AS c
             |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             |  WHERE len(word) > 0 GROUP BY word),
             |idx AS (SELECT unnest(range(1, 101)) AS i),
             |pr AS (SELECT substring(word, CAST(i AS INT), 1) AS l,
             |         substring(word, CAST(i AS INT) + 1, 1) ||
             |           CASE WHEN i + 1 = len(word) THEN '</w>' ELSE '' END AS r,
             |         c
             |       FROM wc JOIN idx ON i <= len(word) - 1),
             |m AS (SELECT l, r, r LIKE '%</w>' AS marker,
             |        CASE WHEN r LIKE '%</w>' THEN substring(r, 1, len(r) - 4)
             |             ELSE r END AS rchar
             |      FROM pr GROUP BY l, r ORDER BY sum(c) DESC, l, r LIMIT 1),
             |w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             |      FROM documents)
             |SELECT doc_id, CAST(sum(len(word) - CASE
             |    WHEN m.marker THEN
             |      CASE WHEN len(word) >= 2
             |             AND substring(word, len(word) - 1, 1) = m.l
             |             AND substring(word, len(word), 1) = m.rchar
             |           THEN 1 ELSE 0 END
             |    ELSE (len(substring(word, 1, len(word) - 1))
             |          - len(replace(substring(word, 1, len(word) - 1),
             |                        m.l || m.rchar, ''))) / 2
             |  END) AS BIGINT) AS n_subwords
             |FROM w, m WHERE len(word) > 0
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- intra-doc repeated-chunk removal: within-document dedup at scan
    // speed (array HOFs only — zero shuffles/explodes; the cross-corpus
    // twin is q77). First occurrence of each chunk content survives.
    Q("q105_intradoc_dedup",
      (s, d) => graft.operators.TrainingPrep
        .dedupRepeatedChunks(t(s, d, "documents"), segTokens = 2)
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |c AS (SELECT doc_id,
             |        [array_to_string(w[(i*2+1):(i*2+2)], ' ')
             |         for i in range(0, CAST(ceil(len(w) / 2.0) AS INT))] AS chunks
             |      FROM d)
             |SELECT doc_id,
             |  array_to_string(list_filter(chunks,
             |    (x, i) -> list_position(chunks, x) = i), ' ') AS clean_text
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ---- JSONL shard sink round-trip, driver-checked (the q95 pattern
    // for the write path): export the corpus as gzip JSONL shards to a
    // fixed per-dataset tmp location, read the files back, and oracle the
    // content against the source table — proving the sink loses nothing
    // and the format parses. Fixed location wiped per run (q79 argument).
    Q("q107_jsonl_roundtrip",
      (s, d) => {
        val dir = d.stripSuffix("/")
        val loc = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), "graft-jsonl"),
          java.lang.Integer.toHexString(dir.hashCode) + "/docs")
        def rmTree(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rmTree)
          f.delete(); ()
        }
        if (loc.exists()) rmTree(loc)
        graft.operators.TrainingPrep.exportJsonlShards(
          t(s, d, "documents"), loc.toString, nShards = 8, salt = "q107")
        s.read.json(loc.toString)
          .select(col("doc_id").cast("long"), col("text"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, text FROM documents ORDER BY doc_id")),

    // ---- the full training-prep pipeline composed as ONE declarative
    // plan: normalize -> quality gate -> exact dedup (keep min id per
    // canonical form) -> token-budget selection. What a user of the
    // engine actually runs — and the proof that the operators compose
    // without materialization boundaries (the budget step's range
    // partition is the plan's only presentation shuffle). Oracle = the
    // same CTE chain in SQL, each stage in its proven oracle form.
    Q("q108_full_pipeline",
      (s, d) => {
        val norm = t(s, d, "documents").select(col("doc_id"),
          graft.operators.TextAnalysis.normalizeText(col("text")).as("text"))
          .withColumn("n_chars", length(col("text")))
        val gated = norm.where(size(split(col("text"), " ")) >= 20)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("text").orderBy("doc_id")
        val deduped = gated.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
        graft.operators.TrainingPrep.selectUnderBudget(deduped, 20000L)
          .orderBy("cum_tok")
      },
      Some("""WITH norm AS (SELECT doc_id,
             |    trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
             |      'https?://[^ \t\n\r\f]+', '<url>', 'g'),
             |      '[a-z0-9._%+-]+@[a-z0-9.-]+', '<email>', 'g'),
             |      '[ \t\n\r\f]+', ' ', 'g')) AS text
             |  FROM documents),
             |gated AS (SELECT doc_id, text, len(text) AS n_chars FROM norm
             |          WHERE len(string_split(text, ' ')) >= 20),
             |deduped AS (SELECT doc_id, text, n_chars FROM (
             |    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             |    FROM gated) WHERE rn = 1)
             |SELECT doc_id, n_tok, cum_tok FROM (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
             |      ORDER BY n_chars DESC, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
             |  FROM deduped)
             |WHERE cum_tok <= 20000 ORDER BY cum_tok""".stripMargin)),

    // ---- cross-document duplicate-span removal (Lee et al. 2022): strip
    // every occurrence but the first of any 5-token window duplicated
    // anywhere in the corpus, merging overlapping cuts per doc. Oracle
    // mirrors the dup-window/keeper/island/rebuild chain with DuckDB
    // list comprehensions (the q105 machinery).
    Q("q109_dup_span_removal",
      (s, d) => graft.operators.TrainingPrep
        .removeDuplicateSpans(t(s, d, "documents"), windowTokens = 5)
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |g AS (SELECT doc_id, unnest([{'pos': i, 'gram': array_to_string(w[(i+1):(i+5)], ' ')}
             |        for i in range(0, greatest(len(w)-5+1,0))], recursive := true) FROM d),
             |occ AS (SELECT doc_id, pos,
             |        count(*) OVER (PARTITION BY gram) AS cnt,
             |        row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn FROM g),
             |spans AS (SELECT doc_id, pos AS s, pos + 5 - 1 AS e FROM occ WHERE cnt > 1 AND rn > 1),
             |isl AS (SELECT doc_id, s, e,
             |        CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS brk
             |        FROM spans),
             |merged AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM (
             |        SELECT doc_id, s, e, sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
             |        FROM isl) GROUP BY doc_id, grp),
             |perdoc AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS sp FROM merged GROUP BY doc_id)
             |SELECT d.doc_id,
             |  coalesce(array_to_string([w[i+1] for i in range(0, len(w))
             |    if len(list_filter(coalesce(sp, []), x -> i >= x.s AND i <= x.e)) = 0], ' '), '') AS clean_text,
             |  CAST(len(w) - len([w[i+1] for i in range(0, len(w))
             |    if len(list_filter(coalesce(sp, []), x -> i >= x.s AND i <= x.e)) = 0]) AS BIGINT) AS removed
             |FROM d LEFT JOIN perdoc USING (doc_id) ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- PMI collocations: top co-occurring term pairs by pointwise
    // mutual information over per-doc distinct-term incidence.
    Q("q110_pmi_pairs",
      (s, d) => graft.operators.TrainingPrep
        .pmiPairs(t(s, d, "documents"), maxTermsPerDoc = 40,
          minPairCount = 5L, topK = 30),
      Some("""WITH dt AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))[1:40]) AS term FROM documents),
             |tc AS (SELECT term, count(*) AS n FROM dt GROUP BY term),
             |pc AS (SELECT a.term AS ta, b.term AS tb, count(*) AS n
             |       FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
             |       GROUP BY 1, 2),
             |tot AS (SELECT count(*) AS nd FROM documents)
             |SELECT ta, tb, CAST(pc.n AS BIGINT) AS n_pair,
             |  round(ln(pc.n::DOUBLE * nd / (ca.n::DOUBLE * cb.n)), 4) AS pmi
             |FROM pc, tot, tc ca, tc cb
             |WHERE ca.term = pc.ta AND cb.term = pc.tb AND pc.n >= 5
             |ORDER BY pmi DESC, ta, tb LIMIT 30""".stripMargin),
      bench = true),

    // ---- temperature mixture (rate ∝ n^0.5): per-source sampling plan
    // plus the realized portable-hash sample under an 8000-token budget.
    Q("q111_temperature_mix",
      (s, d) => graft.operators.TrainingPrep
        .temperatureMixture(t(s, d, "documents"), budgetTokens = 8000L,
          salt = "mix"),
      Some("""WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |            CAST(sum(len(string_split(text,' '))) AS BIGINT) AS n_tokens FROM documents GROUP BY source),
             |tot AS (SELECT sum(sqrt(n_tokens::DOUBLE)) AS z FROM st),
             |plan AS (SELECT source, n_docs, n_tokens,
             |         least(sqrt(n_tokens::DOUBLE) / z * 8000 / n_tokens, 1.0) AS rate FROM st, tot),
             |samp AS (SELECT d.source, CAST(count(*) AS BIGINT) AS picked,
             |         CAST(sum(len(string_split(d.text,' '))) AS BIGINT) AS picked_tokens
             |         FROM documents d JOIN plan p USING (source)
             |         WHERE CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
             |               < CAST(floor(p.rate * 1000000) AS BIGINT)
             |         GROUP BY d.source)
             |SELECT p.source, p.n_docs, p.n_tokens, round(p.rate, 6) AS rate,
             |  CAST(coalesce(s.picked, 0) AS BIGINT) AS picked,
             |  CAST(coalesce(s.picked_tokens, 0) AS BIGINT) AS picked_tokens
             |FROM plan p LEFT JOIN samp s USING (source) ORDER BY p.source""".stripMargin)),

    // ---- language ID via stopword profiles.
    Q("q28_langid",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id"),
      Some("""WITH sc AS (SELECT doc_id,
             |  len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to','is'))) AS s_en,
             |  len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist'))) AS s_de,
             |  len(list_filter(string_split(text,' '), x -> x IN ('el','los','las','y','es'))) AS s_es,
             |  len(list_filter(string_split(text,' '), x -> x IN ('le','la','les','et','est'))) AS s_fr
             |  FROM documents)
             |SELECT doc_id, CASE
             |  WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
             |  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
             |  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
             |  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
             |  ELSE 'fr' END AS pred_lang
             |FROM sc ORDER BY doc_id""".stripMargin)),

    // ---- quality scoring: token counts, punct/stopword ratios, composite.
    Q("q29_quality",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.tokenCountRegex(col("text")).cast("long").as("n_tokens_re"),
          (round((TextAnalysis.punctRatio(col("text"))) * 1000000.0) / 1000000.0).as("punct_ratio"),
          (round((TextAnalysis.stopwordRatio(col("text"))) * 1000000.0) / 1000000.0).as("stop_ratio"),
          (round((TextAnalysis.qualityScore(col("text"))) * 1000000.0) / 1000000.0).as("quality"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
              |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens_re,
              |  (round((length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / length(text)) * 1000000.0) / 1000000.0) AS punct_ratio,
              |  (round((CAST(len(list_filter(string_split(text,' '), x -> x IN ($EnList))) AS BIGINT)::DOUBLE
              |        / len(string_split(text, ' '))) * 1000000.0) / 1000000.0) AS stop_ratio,
              |  (round((least(len(string_split(text,' '))::DOUBLE / 50.0, 1.0) * 0.4
              |      + greatest(1.0 - (length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / length(text)) * 5.0, 0.0) * 0.4
              |      + least((CAST(len(list_filter(string_split(text,' '), x -> x IN ($EnList))) AS BIGINT)::DOUBLE
              |               / len(string_split(text,' '))) * 10.0, 1.0) * 0.2) * 1000000.0) / 1000000.0) AS quality
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- rolling-hash fingerprint through the codegen'd RollingHash
    // expression; DuckDB recomputes the identical fold over codepoints.
    Q("q47_rolling_hash",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          graft.expressions.RollingHash.rolling_hash(col("text")).as("rh"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  list_reduce(list_prepend(0::BIGINT,
             |    [unicode(x)::BIGINT for x in string_split(text, '')]),
             |    (a, b) -> (a * 31 + b) % 1000000007) AS rh
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- corpus text normalization: lowercase + URL/email masking +
    // whitespace collapse (crawl hygiene before tokenization).
    Q("q76_text_normalize",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.normalizeText(col("text")).as("norm_text"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  trim(regexp_replace(
             |    regexp_replace(
             |      regexp_replace(lower(text), 'https?://[^ \t\n\r\f]+', '<url>', 'g'),
             |      '[a-z0-9._%+-]+@[a-z0-9.-]+', '<email>', 'g'),
             |    '[ \t\n\r\f]+', ' ', 'g')) AS norm_text
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- boilerplate segment removal: drop 8-token segments shared by
    // >2 documents (template/header hygiene), rebuild surviving text.
    Q("q77_boilerplate",
      (s, d) => graft.operators.TrainingPrep
        .removeBoilerplate(t(s, d, "documents"), 8, 2)
        .orderBy("doc_id"),
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |st AS (SELECT doc_id, w, unnest(range(0, len(w), 8)) AS start FROM ws),
             |seg AS (SELECT doc_id, start,
             |         array_to_string(w[start + 1 : start + 8], ' ') AS chunk FROM st),
             |fp AS (SELECT *, md5(lower(trim(regexp_replace(chunk, '[ \t\n\r\f]+', ' ', 'g')))) AS f
             |       FROM seg),
             |dfq AS (SELECT f, count(DISTINCT doc_id) AS seg_df FROM fp GROUP BY f)
             |SELECT doc_id,
             |  array_to_string(list(chunk ORDER BY start), ' ') AS clean_text
             |FROM fp JOIN dfq USING (f) WHERE seg_df <= 2
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- corpus term frequency (explode + count).
    Q("q30_term_freq",
      (s, d) => t(s, d, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")),
      Some("""SELECT term, count(*) AS n FROM (
             |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
             |GROUP BY term ORDER BY n DESC, term""".stripMargin)),

    // ---- end-to-end corpus preparation (annotate -> gate -> dedup) as ONE
    // operator: the composition a training-data-prep run actually executes.
    // Oracle composes the already-proven q28 (langid) / q29 (quality) / q21
    // (fingerprint) SQL with arg_min keeper semantics.
    Q("q58_corpus_prep",
      (s, d) => graft.operators.CorpusPrep.prepare(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some(s"""WITH sc AS (SELECT doc_id, text,
              |  len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to','is'))) AS s_en,
              |  len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist'))) AS s_de,
              |  len(list_filter(string_split(text,' '), x -> x IN ('el','los','las','y','es'))) AS s_es,
              |  len(list_filter(string_split(text,' '), x -> x IN ('le','la','les','et','est'))) AS s_fr
              |  FROM documents),
              |ann AS (SELECT doc_id,
              |  CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
              |       WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
              |       WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
              |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
              |       ELSE 'fr' END AS lang,
              |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
              |  (round((least(len(string_split(text,' '))::DOUBLE / 50.0, 1.0) * 0.4
              |      + greatest(1.0 - (length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / length(text)) * 5.0, 0.0) * 0.4
              |      + least((CAST(len(list_filter(string_split(text,' '), x -> x IN ($EnList))) AS BIGINT)::DOUBLE
              |               / len(string_split(text,' '))) * 10.0, 1.0) * 0.2) * 1000000.0) / 1000000.0) AS quality,
              |  md5(lower(trim(regexp_replace(text, '[ \\t\\n\\r\\f]+', ' ', 'g')))) AS fp
              |  FROM sc)
              |SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang,
              |  arg_min(n_tokens, doc_id) AS n_tokens, arg_min(quality, doc_id) AS quality,
              |  CAST(count(*) AS BIGINT) AS n_copies
              |FROM ann WHERE lang = 'en' AND quality >= 0.3
              |GROUP BY fp ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- sequence packing: documents laid end-to-end into per-shard token
    // streams cut every 256 tokens (see TrainingPrep.pack for the
    // per-shard-window scale argument). shards pinned to 8 because the
    // shard layout is part of the oracle contract; unpinned, pack() sizes
    // shards to the cluster.
    Q("q59_seq_pack",
      (s, d) => graft.operators.TrainingPrep.pack(t(s, d, "documents"), 256, shards = 8)
        .orderBy("doc_id"),
      Some("""WITH tok AS (SELECT doc_id, doc_id % 8 AS shard,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
             |c AS (SELECT *, CAST(sum(n_tokens) OVER (
             |        PARTITION BY shard ORDER BY doc_id) - n_tokens AS BIGINT) AS start_tok
             |      FROM tok)
             |SELECT doc_id, shard, n_tokens,
             |  CAST(floor(start_tok::DOUBLE / 256) AS BIGINT) AS pack_seq,
             |  start_tok % 256 AS bin_offset
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ---- overlapping context-window chunking (32-token chunks every 24 —
    // ~3 overlapping chunks per avg-54-token doc, with shorter tails).
    Q("q60_chunking",
      (s, d) => graft.operators.TrainingPrep.chunk(t(s, d, "documents"), 32, 24)
        .orderBy("doc_id", "start"),
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |st AS (SELECT doc_id, w, unnest(range(0, len(w), 24)) AS start FROM ws)
             |SELECT doc_id, CAST(start AS BIGINT) AS start,
             |  array_to_string(w[start + 1 : start + 32], ' ') AS chunk
             |FROM st ORDER BY doc_id, start""".stripMargin)),

    // ---- benchmark decontamination: corpus docs sharing a 3-gram shingle
    // with the (deterministic) benchmark subset doc_id % 97 == 0.
    Q("q61_decontam",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.TrainingPrep.contaminatedIds(
          docs.where(col("doc_id") % 97 =!= 0),
          docs.where(col("doc_id") % 97 === 0))
          .orderBy("doc_id")
      },
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS s
             |       FROM ws WHERE len(w) >= 3),
             |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
             |SELECT DISTINCT doc_id FROM sh
             |WHERE doc_id % 97 <> 0 AND s IN (SELECT s FROM bench)
             |ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- deterministic (reproducible) sampling: the training-pipeline
    // answer to rand()-based TABLESAMPLE — membership is a pure function
    // of the key via the engine-portable 60-bit md5 hash, so the sample
    // is stable across engines, runs and cluster layouts, and different
    // `salt` strings give independent samples. 10% sample of documents.
    Q("q66_sample_hash",
      (s, d) => t(s, d, "documents")
        .where(pmod(graft.expressions.PortableHash.md5Hash60(
          concat(lit("s1:"), col("doc_id"))), lit(100L)) < 10)
        .select(col("doc_id"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id FROM documents
             |WHERE CAST(('0x' || substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10
             |ORDER BY doc_id""".stripMargin)),

    // ---- deterministic training-mix sampling: per-language sampling
    // rates (the corpus-composition knob) with engine-portable hash
    // membership — en 60%, de 30%, es 20%, fr 10%, und dropped.
    Q("q80_corpus_mix",
      (s, d) => {
        val docs = t(s, d, "documents")
          .withColumn("stratum", TextAnalysis.langId(col("text")))
        graft.operators.TrainingPrep.stratifiedSample(docs,
          Map("en" -> 60, "de" -> 30, "es" -> 20, "fr" -> 10), "mix1")
          .select(col("doc_id"), col("stratum").as("lang"))
          .orderBy("doc_id")
      },
      Some("""WITH sc AS (SELECT doc_id,
             |  len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to','is'))) AS s_en,
             |  len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist'))) AS s_de,
             |  len(list_filter(string_split(text,' '), x -> x IN ('el','los','las','y','es'))) AS s_es,
             |  len(list_filter(string_split(text,' '), x -> x IN ('le','la','les','et','est'))) AS s_fr
             |  FROM documents),
             |l AS (SELECT doc_id, CASE
             |  WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
             |  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
             |  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
             |  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
             |  ELSE 'fr' END AS lang FROM sc)
             |SELECT doc_id, lang FROM l
             |WHERE CAST(('0x' || substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
             |  < CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 30
             |              WHEN 'es' THEN 20 WHEN 'fr' THEN 10 ELSE 0 END
             |ORDER BY doc_id""".stripMargin)),

    // ---- intra-document repetition ratio (duplicate-trigram fraction —
    // the Gopher/RefinedWeb quality signal for boilerplate loops and
    // degenerate text), off the codegen'd shingle kernel.
    Q("q81_repetition",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          (round((TextAnalysis.repetitionRatio(col("text"))) * 1000000.0) / 1000000.0).as("rep_ratio"))
        .orderBy("doc_id"),
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |g AS (SELECT doc_id, greatest(len(w) - 2, 0) AS total,
             |        CASE WHEN len(w) >= 3 THEN len(list_distinct(
             |          [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]))
             |        ELSE 0 END AS dist
             |      FROM ws)
             |SELECT doc_id,
             |  round((CASE WHEN total > 0 THEN 1.0 - dist::DOUBLE / total ELSE 0.0 END) * 1000000.0) / 1000000.0 AS rep_ratio
             |FROM g ORDER BY doc_id""".stripMargin)),

    // ---- deflate compression ratio (the Gopher redundancy filter).
    // zlib output is JVM-implementation-defined -> rows-only by design;
    // the oracled twin in the same signal family is q81 above. The spec
    // asserts the discriminative ordering (repetitive < prose < random).
    Q("q114_compression_ratio",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          round(graft.expressions.CompressionRatio
            .compression_ratio(col("text")), 4).as("zlib_ratio"))
        .orderBy("doc_id"),
      None),

    // ---- top-3 characteristic terms per document by tf-idf with a
    // RATIONAL idf (tf * (N+1)/(df+1)); ln() is deliberately absent —
    // JVM Math.log and libm ln disagree in the last bit on ~0.1% of this
    // corpus's idf inputs (measured), enough to flip a rank cross-engine.
    Q("q83_tfidf",
      (s, d) => graft.operators.TrainingPrep
        .tfIdfTopTerms(t(s, d, "documents"), 3)
        .orderBy("doc_id", "rank"),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
             |s AS (SELECT doc_id, term,
             |        tf::DOUBLE * ((n_docs + 1)::DOUBLE / (df + 1)::DOUBLE) AS score
             |      FROM tf JOIN df USING (term) CROSS JOIN n),
             |r AS (SELECT doc_id, term, score,
             |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
             |      FROM s)
             |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
             |  round(score * 1000000.0) / 1000000.0 AS score
             |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin),
      bench = true),

    // ---- deterministic training-shard export: (shard, pos) slot per
    // document via the portable hash — a reproducible global shuffle with
    // NO global sort (per-shard windows, one exchange on shard).
    Q("q84_shard_export",
      (s, d) => graft.operators.TrainingPrep
        .shardExport(t(s, d, "documents").select("doc_id"), 8, "shard1")
        .orderBy("doc_id"),
      Some("""WITH k AS (SELECT doc_id,
             |  CAST(('0x' || substr(md5('shard1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS key
             |  FROM documents)
             |SELECT doc_id, key % 8 AS shard,
             |  CAST(row_number() OVER (PARTITION BY key % 8 ORDER BY key, doc_id) AS BIGINT) AS pos
             |FROM k ORDER BY doc_id""".stripMargin)),

    // ---- group-coherent train/val split + per-source quota: the split
    // hashes the SOURCE (all pages of a site land in one split — no
    // near-dup leakage across the boundary), the quota keeps each
    // source's 100 hash-smallest docs (anti-domination subsample).
    Q("q85_domain_split",
      (s, d) => graft.operators.TrainingPrep
        .domainSplit(t(s, d, "documents"), "source", 100, 20, "split1")
        .orderBy("doc_id"),
      Some("""WITH k AS (SELECT doc_id, source,
             |  CAST(('0x' || substr(md5('split1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS dk
             |  FROM documents),
             |r AS (SELECT doc_id, source,
             |        row_number() OVER (PARTITION BY source ORDER BY dk, doc_id) AS rk
             |      FROM k)
             |SELECT doc_id, source,
             |  CASE WHEN CAST(('0x' || substr(md5('split1:' || source), 1, 15)) AS BIGINT) % 100 < 20
             |       THEN 'val' ELSE 'train' END AS split
             |FROM r WHERE rk <= 100 ORDER BY doc_id""".stripMargin)),

    // ---- full outer join (the one join type not otherwise registered):
    // customers and their order counts, keeping customerless orders AND
    // orderless customers visible.
    Q("q67_full_outer",
      (s, d) => {
        val c = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
        val o = t(s, d, "orders").groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            coalesce(col("c_name"), lit("<none>")).as("name"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy("custkey")
      },
      Some("""SELECT coalesce(c_custkey, o_custkey) AS custkey,
             |  coalesce(c_name, '<none>') AS name,
             |  coalesce(n_orders, 0) AS n_orders
             |FROM (SELECT c_custkey, c_name FROM customer) c
             |FULL OUTER JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
             |                 FROM orders GROUP BY o_custkey) o
             |  ON c_custkey = o_custkey
             |ORDER BY custkey""".stripMargin)),

    // ---- multimodal resize plan: aspect-preserving target geometry for
    // image assets as deterministic column arithmetic (the pixel transform
    // is the codec stub seam — see Multimodal.resizePlan).
    Q("q68_mm_resize",
      (s, d) => graft.operators.Multimodal
        .resizePlan(graft.operators.Multimodal.assets(s, t(s, d, "documents")).toDF(), 256)
        .select("doc_id", "width", "height", "out_w", "out_h")
        .orderBy("doc_id"),
      Some("""WITH a AS (SELECT doc_id,
             |  CAST(doc_id % 640 + 64 AS INT) AS width,
             |  CAST(doc_id % 480 + 48 AS INT) AS height
             |  FROM documents WHERE doc_id % 3 = 0),
             |f AS (SELECT *, least(1.0, 256.0 / greatest(width, height)) AS sf FROM a)
             |SELECT doc_id, width, height,
             |  greatest(1, CAST(floor(width * sf) AS BIGINT)) AS out_w,
             |  greatest(1, CAST(floor(height * sf) AS BIGINT)) AS out_h
             |FROM f ORDER BY doc_id""".stripMargin)),

    // ---- multimodal frame sampling: one row per sampled frame per video
    // asset (explode over computed timestamps — the real row-explosion
    // plumbing; frame decode is the stub seam).
    Q("q69_mm_frames",
      (s, d) => graft.operators.Multimodal
        .frameSamplePlan(graft.operators.Multimodal.assets(s, t(s, d, "documents")).toDF(), 1000)
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH v AS (SELECT doc_id, doc_id * 33 % 90000 AS duration_ms
             |          FROM documents WHERE doc_id % 3 = 2)
             |SELECT doc_id, CAST(ts_ms / 1000 AS BIGINT) AS frame_idx, ts_ms
             |FROM (SELECT doc_id, unnest(range(0, duration_ms + 1, 1000)) AS ts_ms FROM v)
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // ---- multimodal metadata plumbing (payload bytes + typed metadata;
    // see graft.operators.Multimodal for the decode-stub pipeline).
    Q("q31_mm_meta",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          octet_length(encode(col("text"), "UTF-8")).cast("long").as("payload_bytes"),
          when(col("doc_id") % 3 === 0, "image/png")
            .when(col("doc_id") % 3 === 1, "audio/wav")
            .otherwise("video/mp4").as("mime"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
             |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
             |       ELSE 'video/mp4' END AS mime
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- PII redaction (compliance hygiene before publishing a corpus):
    // the corpus text carries no PII, so each document is AUGMENTED with
    // deterministic doc_id-derived email/phone/IP spans first — the
    // redactor then has real work to do and the oracle checks both the
    // rewritten text and the per-kind audit counts.
    Q("q88_pii_redact",
      (s, d) => {
        val aug = t(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" contact u"), col("doc_id"), lit("@ex"),
            pmod(col("doc_id"), lit(5)), lit(".com tel 555-123-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" ip 10.0."), pmod(col("doc_id"), lit(256)), lit("."),
            pmod(col("doc_id") * 7, lit(256))).as("text"))
        aug.select(col("doc_id"),
          TextAnalysis.redactPii(col("text")).as("clean"),
          TextAnalysis.piiCount(col("text"), "email").as("n_email"),
          TextAnalysis.piiCount(col("text"), "phone").as("n_phone"),
          TextAnalysis.piiCount(col("text"), "ipv4").as("n_ipv4"))
          .orderBy("doc_id")
      },
      Some("""WITH aug AS (SELECT doc_id,
             |  text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex'
             |       || CAST(doc_id % 5 AS VARCHAR) || '.com tel 555-123-'
             |       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |       || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
             |       || CAST(doc_id * 7 % 256 AS VARCHAR) AS text
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<pii:email>', 'g'),
             |    '\d{3}-\d{2}-\d{4}', '<pii:ssn>', 'g'),
             |    '\d{3}-\d{3}-\d{4}', '<pii:phone>', 'g'),
             |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<pii:ipv4>', 'g') AS clean,
             |  CAST(len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
             |  CAST(len(regexp_extract_all(text, '\d{3}-\d{3}-\d{4}')) AS INT) AS n_phone,
             |  CAST(len(regexp_extract_all(text,
             |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS INT) AS n_ipv4
             |FROM aug ORDER BY doc_id""".stripMargin)),

    // ---- corpus selection under a global token budget: the selected set
    // is a PREFIX of the (n_chars desc, doc_id) total order, so the
    // distributed two-phase prefix sum oracles exactly against a plain
    // window cumsum.
    Q("q89_budget_select",
      (s, d) => graft.operators.TrainingPrep
        .selectUnderBudget(t(s, d, "documents"), 10000L)
        .orderBy("cum_tok"),
      // CAST the window sum: DuckDB sum(BIGINT) yields HUGEINT, which the
      // driver's pandas frame demotes to float64 and the hash flips on
      // 99 vs 99.0 (the Queries.scala:12-14 convention applies to window
      // aggregates too).
      Some("""SELECT doc_id, n_tok, cum_tok FROM (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
             |      ORDER BY n_chars DESC, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
             |  FROM documents)
             |WHERE cum_tok <= 10000 ORDER BY cum_tok""".stripMargin),
      bench = true),

    // ---- inverted index: term -> sorted postings + df (retrieval
    // primitive; one term-keyed shuffle, map-side collect_set dedup).
    // ---- incremental exact dedup: the day's batch (doc_id % 3 == 0)
    // deduped against the already-ingested corpus (the rest) — survivors
    // are incoming docs whose canonical fingerprint is new to BOTH the
    // history and the earlier part of the batch. The per-batch shape every
    // refreshed corpus runs instead of corpus-vs-itself.
    Q("q96_incremental_dedup",
      (s, d) => graft.operators.Dedup.incrementalDedup(
          t(s, d, "documents").where(col("doc_id") % 3 =!= 0),
          t(s, d, "documents").where(col("doc_id") % 3 === 0))
        .select("doc_id")
        .orderBy("doc_id"),
      Some("""WITH fp AS (SELECT doc_id,
             |    md5(lower(trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g')))) AS f
             |  FROM documents),
             |inc AS (SELECT doc_id, f,
             |    row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
             |  FROM fp WHERE doc_id % 3 = 0)
             |SELECT doc_id FROM inc
             |WHERE rn = 1 AND NOT EXISTS (
             |  SELECT 1 FROM fp s WHERE s.doc_id % 3 <> 0 AND s.f = inc.f)
             |ORDER BY doc_id""".stripMargin)),

    // The registered row projects the posting ARRAY to a ','-joined string:
    // the driver's pandas-based hasher cannot sort/factorize an array-typed
    // column (CORRECTNESS_r07 `unhashable type: numpy.ndarray`). Engine
    // users keep the array-returning `TrainingPrep.invertedIndex` API.
    Q("q90_inverted_index",
      (s, d) => graft.operators.TrainingPrep
        .invertedIndex(t(s, d, "documents"))
        .select(col("term"),
          array_join(col("postings").cast("array<string>"), ",").as("postings"),
          col("df"))
        .orderBy("term"),
      Some("""SELECT term,
             |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings,
             |  CAST(len(list(doc_id)) AS INT) AS df
             |FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS term, doc_id
             |      FROM documents)
             |GROUP BY term ORDER BY term""".stripMargin)),

    // ---- incremental NEAR-dup: today's batch (doc_id % 3 == 0) deduped
    // fuzzily against the already-ingested corpus — MinHash bands joined
    // history x incoming and incoming x incoming (never history x
    // history), exact-Jaccard verified. Survivors have no >= 0.5 match in
    // the history and none among smaller-id batch docs. The oracle is the
    // exact pair computation on the same subsets.
    Q("q106_incremental_neardup",
      (s, d) => graft.operators.Dedup.incrementalNearDup(
          t(s, d, "documents").where(col("doc_id") % 3 =!= 0),
          t(s, d, "documents").where(col("doc_id") % 3 === 0), 0.5)
        .select("doc_id").orderBy("doc_id"),
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |          for i in range(1, len(w) - 1)])) AS s
             |       FROM ws WHERE len(w) >= 3),
             |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |          FROM sh a JOIN sh b ON a.s = b.s
             |          WHERE b.doc_id % 3 = 0 AND (a.doc_id % 3 <> 0 OR
             |                a.doc_id < b.doc_id)
             |          GROUP BY 1, 2),
             |pairs AS (SELECT ib FROM inter
             |          JOIN cnt ca ON ca.doc_id = ia
             |          JOIN cnt cb ON cb.doc_id = ib
             |          WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5)
             |SELECT doc_id FROM documents
             |WHERE doc_id % 3 = 0 AND doc_id NOT IN (SELECT ib FROM pairs)
             |ORDER BY doc_id""".stripMargin)),

    // ---- REAL video path, driver-checked: deterministic MJPEG clips are
    // muxed from doc_id (Mp4.mux), demuxed back through the real ISO-BMFF
    // sample tables, and each sampled timestamp's frame pixel-decodes via
    // the JDK JPEG codec. The frame/ts/sample mapping and the decoded flag
    // are exact (clip i has doc_id%3+1 frames of 100 ms; sampleAt = last
    // frame at-or-before ts); JPEG luma is near-exact only, so it stays
    // out of the registered projection (spec-checked in MediaCodecSpec).
    Q("q97_video_real_frames",
      (s, d) => graft.operators.Multimodal.applyFrameSample(
          s,
          graft.operators.Multimodal.mjpegAssets(
            s, t(s, d, "documents").where(col("doc_id") % 7 === 0)),
          everyMs = 150)
        .select(col("doc_id"), col("frame_idx"), col("ts_ms"),
          col("sample_idx"), col("decoded"))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH v AS (SELECT doc_id, doc_id % 3 + 1 AS n
             |          FROM documents WHERE doc_id % 7 = 0)
             |SELECT doc_id,
             |  CAST(ts_ms // 150 AS BIGINT) AS frame_idx,
             |  CAST(ts_ms AS BIGINT) AS ts_ms,
             |  CAST(least(ts_ms // 100, n - 1) AS INT) AS sample_idx,
             |  CAST(1 AS INT) AS decoded
             |FROM (SELECT doc_id, n, unnest(range(0, n * 100 + 1, 150)) AS ts_ms
             |      FROM v)
             |ORDER BY doc_id, frame_idx""".stripMargin),
      bench = true),

    // ---- BM25 ranked retrieval: the scoring end of q90's inverted-index
    // story. Ties at the top-k cut break on (rounded score, doc_id) so the
    // limit is deterministic across engines.
    Q("q98_bm25_search",
      (s, d) => graft.operators.TrainingPrep
        .bm25(t(s, d, "documents"), Seq("spark", "window", "vector"), topK = 20),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |s AS (SELECT avg(len(w)) AS avgdl, CAST(count(*) AS DOUBLE) AS n FROM d),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
             |         any_value(dl) AS dl
             |       FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM d)
             |       WHERE term IN ('spark', 'window', 'vector')
             |       GROUP BY doc_id, term),
             |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term)
             |SELECT doc_id,
             |  round(sum(ln((n - df + 0.5) / (df + 0.5) + 1) * tf * 2.2 /
             |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
             |FROM tf JOIN df USING (term), s
             |GROUP BY doc_id
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),
      bench = true),

    // ---- unigram-LM surprisal: corpus-fit p(w), per-doc cross-entropy in
    // bits/token — the statistical half of a CCNet-style quality filter.
    Q("q99_unigram_surprisal",
      (s, d) => graft.operators.TrainingPrep
        .unigramSurprisal(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |              FROM documents),
             |model AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
             |tot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS total
             |        FROM documents)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             |  round(avg(-ln(CAST(cnt AS DOUBLE) / total) / ln(2)), 4) AS bits_per_tok
             |FROM toks JOIN model USING (term), tot
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- interpolated bigram-LM surprisal: the q99 filter upgraded to
    // bigram cross-entropy (catches word-salad unigrams can't). (1-λ) is
    // COMPUTED on both sides so the doubles match bitwise.
    Q("q115_bigram_surprisal",
      (s, d) => graft.operators.TrainingPrep
        .bigramSurprisal(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |bg AS (SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]}
             |         for i in range(1, len(w))], recursive := true)
             |       FROM d WHERE len(w) >= 2),
             |bgc AS (SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2),
             |uc AS (SELECT term, count(*) AS cu FROM (SELECT unnest(w) AS term FROM d) GROUP BY term),
             |tot AS (SELECT CAST(sum(len(w)) AS DOUBLE) AS total FROM d)
             |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bg,
             |  round(avg(-ln(0.7 * CAST(cbg AS DOUBLE) / c1.cu
             |    + (1.0 - 0.7) * CAST(c2.cu AS DOUBLE) / total) / ln(2)), 4) AS bits_per_tok
             |FROM bg JOIN bgc USING (w1, w2)
             |  JOIN uc c1 ON c1.term = bg.w1
             |  JOIN uc c2 ON c2.term = bg.w2, tot
             |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin),
      bench = true),

    // ---- deterministic MLM example generation: portable-hash 15% token
    // masking, masked text + labels + count, reproducible across engines.
    Q("q116_mlm_mask",
      (s, d) => graft.operators.TrainingPrep
        .mlmMask(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |m AS (SELECT doc_id,
             |  [CASE WHEN CAST(('0x' || substr(md5('mlm:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 15
             |        THEN '[MASK]' ELSE w[i+1] END for i in range(0, len(w))] AS masked,
             |  [w[i+1] for i in range(0, len(w))
             |    if CAST(('0x' || substr(md5('mlm:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 15] AS labels
             |  FROM d)
             |SELECT doc_id, array_to_string(masked, ' ') AS masked_text,
             |  coalesce(array_to_string(labels, ' '), '') AS labels,
             |  CAST(len(labels) AS BIGINT) AS n_masked
             |FROM m ORDER BY doc_id""".stripMargin)),

    // ---- first-touch conversion funnel view -> click -> purchase with a
    // 2-day per-stage window: per-user stage timestamps + stages reached.
    Q("q117_funnel",
      (s, d) => graft.operators.EventOps
        .funnelStages(Tables.events(s, d), Seq("view", "click", "purchase"),
          windowNs = 2L * 86400 * 1000000000L)
        .select(col("user_id"),
          // DuckDB reads TIMESTAMP(NANOS) parquet at us precision ->
          // compare stage times in MICROseconds on both sides. Integer
          // `div`, NOT `/`: epoch-ns exceeds double's exact range
          expr("t0 div 1000").as("t_view"),
          expr("t1 div 1000").as("t_click"),
          expr("t2 div 1000").as("t_purchase"), col("stage"))
        .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_type FROM events),
             |v AS (SELECT user_id, min(tns) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(tns) AS t_click FROM e JOIN v USING (user_id)
             |      WHERE event_type = 'click' AND tns >= t_view AND tns <= t_view + 172800000000000
             |      GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(tns) AS t_purchase FROM e JOIN c USING (user_id)
             |      WHERE event_type = 'purchase' AND tns >= t_click AND tns <= t_click + 172800000000000
             |      GROUP BY e.user_id)
             |SELECT v.user_id,
             |  CAST(v.t_view // 1000 AS BIGINT) AS t_view,
             |  CAST(c.t_click // 1000 AS BIGINT) AS t_click,
             |  CAST(p.t_purchase // 1000 AS BIGINT) AS t_purchase,
             |  CAST(1 + CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END
             |         + CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage
             |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
             |ORDER BY v.user_id""".stripMargin)),

    // ---- fuzzy entity matching over the distinct part-name dictionary:
    // first-token blocking + length band + levenshtein <= 3 verify.
    Q("q118_fuzzy_match",
      (s, d) => Dedup.fuzzyMatchPairs(
        t(s, d, "part").groupBy("p_name")
          .agg(min("p_partkey").as("id"))
          .select(col("id"), col("p_name")),
        "id", "p_name", maxDist = 3)
        .orderBy("id_a", "id_b"),
      Some("""WITH names AS (SELECT min(p_partkey) AS id, p_name AS name FROM part GROUP BY p_name),
             |n AS (SELECT id, name, string_split(name, ' ')[1] AS blk, length(name) AS len FROM names)
             |SELECT a.id AS id_a, b.id AS id_b, CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
             |FROM n a JOIN n b ON a.blk = b.blk AND a.id < b.id
             |  AND abs(a.len - b.len) <= 3 AND levenshtein(a.name, b.name) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- recency-weighted popularity: 7-day half-life decayed counts
    // per event type, referenced to the corpus max (deterministic).
    Q("q119_decayed_counts",
      (s, d) => graft.operators.EventOps
        .decayedCounts(Tables.events(s, d), halfLifeNs = 6.048e14)
        .select(col("event_type"), col("n"),
          round(col("decayed"), 4).as("decayed"))
        .orderBy("event_type"),
      Some("""WITH tm AS (SELECT max(epoch_ns(ts)) AS tmax FROM events)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(pow(2.0, -(CAST(tmax - epoch_ns(ts) AS DOUBLE) / 604800000000000.0))), 4) AS decayed
             |FROM events, tm GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- T5 span corruption: hash-seeded 3-token spans, merged runs,
    // indexed sentinels, seq2seq targets.
    Q("q120_span_corrupt",
      (s, d) => graft.operators.TrainingPrep
        .spanCorrupt(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |m AS (SELECT doc_id, w,
             |  [len([j for j in range(greatest(p - 2, 0), p + 1)
             |        if CAST(('0x' || substr(md5('t5:' || CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 50]) > 0
             |   for p in range(0, len(w))] AS msk
             |  FROM d),
             |r AS (SELECT doc_id, w, msk,
             |  [msk[p+1] AND (p = 0 OR NOT msk[p]) for p in range(0, len(w))] AS rs
             |  FROM m),
             |s AS (SELECT doc_id, w, msk, rs,
             |  [len(list_filter(rs[1:p], x -> x)) for p in range(0, len(w))] AS sidx
             |  FROM r)
             |SELECT doc_id,
             |  coalesce(array_to_string(list_filter(
             |    [CASE WHEN NOT msk[p+1] THEN w[p+1]
             |          WHEN rs[p+1] THEN '<extra_id_' || CAST(sidx[p+1] AS VARCHAR) || '>'
             |          ELSE NULL END for p in range(0, len(w))], x -> x IS NOT NULL), ' '), '') AS corrupted,
             |  coalesce(array_to_string(list_filter(
             |    [CASE WHEN rs[p+1] THEN '<extra_id_' || CAST(sidx[p+1] AS VARCHAR) || '> ' || w[p+1]
             |          WHEN msk[p+1] THEN w[p+1]
             |          ELSE NULL END for p in range(0, len(w))], x -> x IS NOT NULL), ' '), '') AS targets,
             |  CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_masked
             |FROM s ORDER BY doc_id""".stripMargin)),

    // ---- the RefinedWeb-shaped pipeline v2 composed as ONE plan:
    // cross-doc span dedup -> length gate -> bigram-surprisal band-pass
    // (model fit on the SURVIVING corpus) -> n^0.5 temperature-mixture
    // sampling. Oracle = the q109/q115/q111 chains composed, each stage
    // in its proven form. n_tok = n_bg + 1 exactly (docs are >= 20
    // tokens). The surprisal cut compares the ROUNDED score so the
    // boundary is engine-deterministic.
    Q("q121_pipeline_v2",
      (s, d) => {
        val docs = t(s, d, "documents")
        val cleaned = graft.operators.TrainingPrep
          .removeDuplicateSpans(docs, windowTokens = 5)
          .select(col("doc_id"), col("clean_text").as("text"))
        // materialize the composition seam: bigramSurprisal reads its
        // input three times (pairs, unigram model, total), and here that
        // input is the whole span-dedup subtree — checkpoint it once
        // instead of re-executing it per consumer (measured 6.0 -> 4.7 s
        // at sf0.1 in Q121Time)
        val gated = cleaned.where(size(split(col("text"), " ")) >= 20)
          .localCheckpoint()
        val scored = graft.operators.TrainingPrep.bigramSurprisal(gated)
          .where(col("bits_per_tok") <= 4.95)
          .withColumn("n_tok", col("n_bg") + 1)
          .join(docs.select("doc_id", "source"), Seq("doc_id"))
        val st = scored.groupBy("source").agg(sum("n_tok").as("ntoks"))
        val z = st.agg(sum(sqrt(col("ntoks").cast("double"))).as("z"))
        val rates = st.join(broadcast(z)).withColumn("rate",
          least(sqrt(col("ntoks").cast("double")) / col("z") * 8000
            / col("ntoks").cast("double"), lit(1.0)))
        scored.join(broadcast(rates.select("source", "rate")), Seq("source"))
          .where(pmod(graft.expressions.PortableHash.md5Hash60(
              concat(lit("mix2:"), col("doc_id"))), lit(1000000L)) <
            floor(col("rate") * 1000000).cast("long"))
          .select(col("doc_id"), col("source"),
            col("n_tok").cast("long").as("n_tok"), col("bits_per_tok"))
          .orderBy("doc_id")
      },
      Some("""WITH d0 AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |g0 AS (SELECT doc_id, unnest([{'pos': i, 'gram': array_to_string(w[(i+1):(i+5)], ' ')}
             |        for i in range(0, greatest(len(w)-5+1,0))], recursive := true) FROM d0),
             |occ AS (SELECT doc_id, pos,
             |        count(*) OVER (PARTITION BY gram) AS cnt,
             |        row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn FROM g0),
             |spans AS (SELECT doc_id, pos AS s, pos + 4 AS e FROM occ WHERE cnt > 1 AND rn > 1),
             |isl AS (SELECT doc_id, s, e,
             |        CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS brk
             |        FROM spans),
             |merged AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM (
             |        SELECT doc_id, s, e, sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
             |        FROM isl) GROUP BY doc_id, grp),
             |perdoc AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS sp FROM merged GROUP BY doc_id),
             |cleaned AS (SELECT d0.doc_id,
             |  [w[i+1] for i in range(0, len(w))
             |    if len(list_filter(coalesce(sp, []), x -> i >= x.s AND i <= x.e)) = 0] AS cw
             |  FROM d0 LEFT JOIN perdoc USING (doc_id)),
             |gated AS (SELECT doc_id, cw AS w FROM cleaned WHERE len(cw) >= 20),
             |bg AS (SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]}
             |         for i in range(1, len(w))], recursive := true) FROM gated),
             |bgc AS (SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2),
             |uc AS (SELECT term, count(*) AS cu FROM (SELECT unnest(w) AS term FROM gated) GROUP BY term),
             |tot AS (SELECT CAST(sum(len(w)) AS DOUBLE) AS total FROM gated),
             |scored AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bg,
             |    round(avg(-ln(0.7 * CAST(cbg AS DOUBLE) / c1.cu
             |      + (1.0 - 0.7) * CAST(c2.cu AS DOUBLE) / total) / ln(2)), 4) AS bits_per_tok
             |  FROM bg JOIN bgc USING (w1, w2)
             |    JOIN uc c1 ON c1.term = bg.w1
             |    JOIN uc c2 ON c2.term = bg.w2, tot
             |  GROUP BY bg.doc_id),
             |base AS (SELECT s.doc_id, s.n_bg + 1 AS n_tok, s.bits_per_tok, doc.source
             |  FROM scored s JOIN documents doc USING (doc_id)
             |  WHERE s.bits_per_tok <= 4.95),
             |st AS (SELECT source, sum(n_tok) AS ntoks FROM base GROUP BY source),
             |z AS (SELECT sum(sqrt(CAST(ntoks AS DOUBLE))) AS z FROM st),
             |rates AS (SELECT source,
             |    least(sqrt(CAST(ntoks AS DOUBLE)) / z.z * 8000 / CAST(ntoks AS DOUBLE), 1.0) AS rate
             |  FROM st, z)
             |SELECT b.doc_id, b.source, CAST(b.n_tok AS BIGINT) AS n_tok, b.bits_per_tok
             |FROM base b JOIN rates r USING (source)
             |WHERE CAST(('0x' || substr(md5('mix2:' || CAST(b.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
             |      < CAST(floor(r.rate * 1000000) AS BIGINT)
             |ORDER BY b.doc_id""".stripMargin),
      bench = true),

    // ---- exact-n deterministic per-group sample (smallest portable
    // hash wins; reproducible, redrawable by salt).
    Q("q122_group_sample_n",
      (s, d) => graft.operators.TrainingPrep
        .groupSampleExactN(t(s, d, "documents"), n = 3, salt = "gs")
        .select(col("doc_id"), col("source"))
        .orderBy("source", "doc_id"),
      Some("""SELECT doc_id, source FROM (
             |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
             |    ORDER BY CAST(('0x' || substr(md5('gs:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT), doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 3 ORDER BY source, doc_id""".stripMargin)),

    // ---- per-source unigram KL drift vs the corpus distribution.
    Q("q123_source_drift",
      (s, d) => graft.operators.TrainingPrep
        .sourceDrift(t(s, d, "documents"))
        .orderBy("source"),
      Some("""WITH toks AS (SELECT source AS g, unnest(string_split(text, ' ')) AS term FROM documents),
             |sc AS (SELECT g, term, count(*) AS cs FROM toks GROUP BY g, term),
             |stot AS (SELECT g, sum(cs) AS ts FROM sc GROUP BY g),
             |cc AS (SELECT term, sum(cs) AS cc FROM sc GROUP BY term),
             |ctot AS (SELECT CAST(sum(cc) AS DOUBLE) AS tc FROM cc)
             |SELECT g AS source, CAST(max(ts) AS BIGINT) AS n_tokens,
             |  round(sum((CAST(cs AS DOUBLE) / ts) *
             |    ln((CAST(cs AS DOUBLE) / ts) / (CAST(cc.cc AS DOUBLE) / tc))) / ln(2), 4) AS kl_bits
             |FROM sc JOIN stot USING (g) JOIN cc USING (term), ctot
             |GROUP BY g ORDER BY source""".stripMargin)),

    // ---- coverage-targeted vocab: smallest top-frequency term set
    // covering 99% of token mass, via the q89 distributed prefix sum.
    Q("q124_vocab_coverage",
      (s, d) => graft.operators.TrainingPrep
        .vocabCoverage(t(s, d, "documents"), coveragePermille = 990)
        .orderBy("cum_cnt"),
      Some("""WITH tc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM (
             |         SELECT unnest(string_split(text, ' ')) AS term FROM documents) GROUP BY term),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM tc),
             |c AS (SELECT term, cnt,
             |        CAST(sum(cnt) OVER (ORDER BY cnt DESC, term ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt
             |      FROM tc)
             |SELECT term, cnt, cum_cnt FROM c, tot
             |WHERE cum_cnt - cnt < (total * 990 + 999) // 1000
             |ORDER BY cum_cnt""".stripMargin)),

    // ---- weekly cohort retention matrix over the events table.
    Q("q125_cohort_retention",
      (s, d) => graft.operators.EventOps
        .cohortRetention(Tables.events(s, d), periodNs = 604800000000000L)
        .orderBy("cohort", "wk_offset"),
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) // 604800000000000 AS p FROM events),
             |first AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY user_id),
             |active AS (SELECT DISTINCT user_id, p FROM e)
             |SELECT cohort, p - cohort AS wk_offset, CAST(count(*) AS BIGINT) AS users
             |FROM first JOIN active USING (user_id)
             |GROUP BY cohort, wk_offset ORDER BY cohort, wk_offset""".stripMargin)),

    // ---- multi-pass blocked fuzzy matching (first/last/min-token keys
    // unioned): q118's recall recipe realized.
    Q("q126_fuzzy_multipass",
      (s, d) => Dedup.fuzzyMatchPairsMultiPass(
        t(s, d, "part").groupBy("p_name")
          .agg(min("p_partkey").as("id"))
          .select(col("id"), col("p_name")),
        "id", "p_name", maxDist = 3)
        .orderBy("id_a", "id_b"),
      Some("""WITH names AS (SELECT min(p_partkey) AS id, p_name AS name FROM part GROUP BY p_name),
             |n AS (SELECT id, name, length(name) AS len,
             |        string_split(name, ' ')[1] AS b1,
             |        string_split(name, ' ')[-1] AS b2,
             |        list_min(string_split(name, ' ')) AS b3 FROM names),
             |hits AS (
             |  SELECT a.id AS id_a, b.id AS id_b, CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
             |  FROM n a JOIN n b ON a.b1 = b.b1 AND a.id < b.id
             |    AND abs(a.len - b.len) <= 3 AND levenshtein(a.name, b.name) <= 3
             |  UNION ALL
             |  SELECT a.id, b.id, CAST(levenshtein(a.name, b.name) AS BIGINT)
             |  FROM n a JOIN n b ON a.b2 = b.b2 AND a.id < b.id
             |    AND abs(a.len - b.len) <= 3 AND levenshtein(a.name, b.name) <= 3
             |  UNION ALL
             |  SELECT a.id, b.id, CAST(levenshtein(a.name, b.name) AS BIGINT)
             |  FROM n a JOIN n b ON a.b3 = b.b3 AND a.id < b.id
             |    AND abs(a.len - b.len) <= 3 AND levenshtein(a.name, b.name) <= 3)
             |SELECT DISTINCT id_a, id_b, dist FROM hits ORDER BY id_a, id_b""".stripMargin)),

    // ---- per-nation triangle counts over the trade graph. The engine
    // orients edges by degree (the O(E^1.5) bound); the oracle uses the
    // simple id-ordered 3-way join — different algorithm, identical
    // triangles, which is exactly what the cross-check should prove.
    Q("q127_triangle_count",
      (s, d) => {
        val nation = t(s, d, "nation")
        val edges = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation.select(col("n_nationkey").as("ck"),
            col("n_name").as("src"))), col("c_nationkey") === col("ck"))
          .join(broadcast(nation.select(col("n_nationkey").as("sk"),
            col("n_name").as("dst"))), col("s_nationkey") === col("sk"))
          .select("src", "dst").distinct()
        graft.operators.GraphOps.triangleCounts(edges)
          .orderBy("node")
      },
      Some("""WITH raw AS (SELECT DISTINCT cn.n_name AS src, sn.n_name AS dst
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation cn ON c_nationkey = cn.n_nationkey
             |  JOIN nation sn ON s_nationkey = sn.n_nationkey),
             |ed AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |       FROM raw WHERE src <> dst),
             |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |        FROM ed e1 JOIN ed e2 ON e2.a = e1.b
             |        JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b)
             |SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
             |  SELECT x AS node FROM tri UNION ALL
             |  SELECT y FROM tri UNION ALL
             |  SELECT z FROM tri)
             |GROUP BY node ORDER BY node""".stripMargin)),

    // ---- the transformWithState funnel (Spark 4 StatefulProcessor state
    // API) driver-checked: the TWS stream runs to completion under
    // Trigger.AvailableNow on the events table (RocksDB state store, the
    // API's backing provider, set for this query and restored after), and
    // the per-user stage advancements pivot to the q117 batch-twin shape —
    // same oracle SQL, so a state-machine divergence between the streaming
    // fold and the batch first-touch operator fails the hash compare.
    // Stream execution happens EAGERLY inside this function (the returned
    // frame is the completed memory table), so the conf restore in
    // `finally` cannot race the run.
    Q("q128_funnel_tws",
      (s, d) => {
        import graft.streaming.EventsStream
        val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val updates = EventsStream.runToMemoryAvailableNow(s,
            EventsStream.streamingFunnelTws(s, EventsStream.readEvents(s, d),
              Seq("view", "click", "purchase"),
              windowUs = 2L * 86400 * 1000000L).toDF(),
            "q128_tws_updates")
          // each stage advances at most once per user, so the when-max
          // picks exactly that advancement's event time
          updates.groupBy("user_id").agg(
              max(when(col("stage") === 1, col("at_us"))).as("t_view"),
              max(when(col("stage") === 2, col("at_us"))).as("t_click"),
              max(when(col("stage") === 3, col("at_us"))).as("t_purchase"),
              max(col("stage")).cast("long").as("stage"))
            .orderBy("user_id")
        } finally {
          prev match {
            case Some(p) =>
              s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
            case None =>
              s.conf.unset("spark.sql.streaming.stateStore.providerClass")
          }
        }
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_type FROM events),
             |v AS (SELECT user_id, min(tns) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(tns) AS t_click FROM e JOIN v USING (user_id)
             |      WHERE event_type = 'click' AND tns >= t_view AND tns <= t_view + 172800000000000
             |      GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(tns) AS t_purchase FROM e JOIN c USING (user_id)
             |      WHERE event_type = 'purchase' AND tns >= t_click AND tns <= t_click + 172800000000000
             |      GROUP BY e.user_id)
             |SELECT v.user_id,
             |  CAST(v.t_view // 1000 AS BIGINT) AS t_view,
             |  CAST(c.t_click // 1000 AS BIGINT) AS t_click,
             |  CAST(p.t_purchase // 1000 AS BIGINT) AS t_purchase,
             |  CAST(1 + CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END
             |         + CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage
             |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
             |ORDER BY v.user_id""".stripMargin)),

    // ---- distributed Lloyd k-means over the embedding corpus (the
    // SemDeDup pre-clustering / IVF training stage). Engine and oracle
    // share one integer quantization, so every cross-row reduction is an
    // exact integer sum and every double derives from identical exact
    // inputs via identical per-row operation order — the assignment is
    // bit-reproducible across engines (see Clustering scaladoc). The
    // oracle unrolls the three Lloyd rounds as CTE blocks.
    Q("q129_kmeans_embed",
      (s, d) => graft.operators.Clustering
        .kMeansAssign(t(s, d, "embeddings"), k = 4, iters = 3)
        .orderBy("vec_id"),
      Some(kmeansOracle(k = 4, iters = 3, dims = 64)),
      bench = true),

    // ---- DSIR (importance-resampling) doc scores against an English
    // target domain: hashed-bigram bag-of-buckets models, Laplace
    // smoothing, portable md5 feature hash — the ln terms are composed
    // identically on both sides and the per-doc sum rounds to 4 dp.
    Q("q130_dsir_weights",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.TrainingPrep
          .dsirLogWeights(docs, docs.where(col("lang") === "en"),
            buckets = 1024)
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |bg AS (SELECT doc_id, CAST(('0x' || substr(md5(w1 || ' ' || w2), 1, 15)) AS BIGINT) % 1024 AS b
             |       FROM (SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))],
             |             recursive := true) FROM d WHERE len(w) >= 2)),
             |tg AS (SELECT bg.b FROM bg JOIN documents USING (doc_id) WHERE lang = 'en'),
             |db AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
             |rm AS (SELECT b, sum(n) AS cr FROM db GROUP BY b),
             |nr AS (SELECT CAST(sum(n) AS DOUBLE) AS nr FROM db),
             |tm AS (SELECT b, count(*) AS ct FROM tg GROUP BY b),
             |nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM tg),
             |terms AS (SELECT doc_id, n,
             |    CAST(n AS DOUBLE) * (ln(CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) - ln(nt + 1024.0)
             |      - ln(CAST(cr AS DOUBLE) + 1.0) + ln(nr + 1024.0)) AS t
             |  FROM db JOIN rm USING (b) LEFT JOIN tm USING (b) CROSS JOIN nr CROSS JOIN nt),
             |agg AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_feat, round(sum(t), 4) AS logw
             |        FROM terms GROUP BY doc_id)
             |SELECT d2.doc_id, coalesce(n_feat, 0) AS n_feat, coalesce(logw, 0.0) AS logw
             |FROM documents d2 LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- CCNet head/middle/tail perplexity bands: q99's unigram bits
    // ranked globally by the two-phase distributed rank (no one-partition
    // window), bucket = rank*3/N in integer arithmetic. The oracle ranks
    // the same rounded score with row_number.
    Q("q131_ccnet_buckets",
      (s, d) => graft.operators.TrainingPrep
        .perplexityBuckets(t(s, d, "documents"), nBuckets = 3)
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |              FROM documents),
             |model AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
             |tot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS total
             |        FROM documents),
             |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             |         round(avg(-ln(CAST(cnt AS DOUBLE) / total) / ln(2)), 4) AS bits_per_tok
             |       FROM toks JOIN model USING (term), tot GROUP BY doc_id),
             |r AS (SELECT *, row_number() OVER (ORDER BY bits_per_tok, doc_id) - 1 AS rk,
             |        count(*) OVER () AS n FROM sc)
             |SELECT doc_id, n_tok, bits_per_tok, CAST((rk * 3) // n AS BIGINT) AS bucket
             |FROM r ORDER BY doc_id""".stripMargin)),

    // ---- SemDeDup as the paper runs it: k-means clusters first, exact
    // cosine dedup within each cluster only (cross-cluster pairs missed
    // by construction — the paper's accepted boundary loss; q101 is the
    // SRP recall-hedged variant). One oracle proves the whole chain:
    // kmeans CTEs -> cluster-scoped pairs -> recursive CC -> keep-min.
    Q("q132_semdedup_clustered",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        // k scales with the corpus (constant EXPECTED cluster size, the
        // paper's own sizing contract) so per-cluster pair mass doesn't
        // grow quadratically — the r13 sf1 stress cliff. At the pinned
        // sf0.01 oracle evaluation the rule lands on the floor, k = 8.
        Similarity
          .semanticDedupClustered(emb, 0.8, k = Similarity.scaledK(emb),
            iters = 2)
          .select(col("vec_id")).orderBy("vec_id")
      },
      Some(semdedupClusteredOracle(k = 8, iters = 2, dims = 64,
        threshold = 0.8)),
      bench = true),

    // ---- pipeline v3: the full modern data-curation recipe as ONE
    // declarative chain — DSIR target-domain gate (keep logw >= 0: docs
    // with net positive evidence toward the English target), CCNet
    // perplexity banding REFIT on the survivors (keep head+middle, drop
    // the tail third), then cluster-scoped SemDeDup over the surviving
    // embeddings (docs without an embedding can't near-dup and survive).
    // Every stage is its proven q130/q131/q132 form; the oracle composes
    // the same three chains. Deterministic cutoffs: the rounded logw and
    // the integer band are engine-identical, so stage boundaries are too.
    Q("q133_pipeline_v3",
      (s, d) => {
        import graft.operators.{Similarity, TrainingPrep}
        val docs = t(s, d, "documents")
        val emb = t(s, d, "embeddings")
        // dsir weights feed the gate AND the final projection — one
        // checkpointed seam instead of two executions of the corpus
        // explode (the q121 seam argument)
        val w = TrainingPrep
          .dsirLogWeights(docs, docs.where(col("lang") === "en"),
            buckets = 1024)
          .where(col("logw") >= 0.0)
          .select("doc_id", "logw")
          .localCheckpoint()
        val survDocs = docs.join(w.select("doc_id"), Seq("doc_id"))
        val banded = TrainingPrep.perplexityBuckets(survDocs, nBuckets = 3)
          .where(col("bucket") < 2)
        val embSurv = emb.join(banded.select(col("doc_id").as("vec_id")),
          Seq("vec_id"), "left_semi")
        // k sized from the RAW table's footer-cheap count (the survivor
        // set would re-run the gate to count); floor keeps sf0.01 at 8
        val keptEmb = Similarity
          .semanticDedupClustered(embSurv, 0.8,
            k = Similarity.scaledK(emb), iters = 2)
        val losers = embSurv.select(col("vec_id").as("doc_id"))
          .join(keptEmb.select(col("vec_id").as("doc_id")),
            Seq("doc_id"), "left_anti")
        banded.join(losers, Seq("doc_id"), "left_anti")
          .join(w, Seq("doc_id"))
          .select(col("doc_id"), col("logw"), col("n_tok"),
            col("bits_per_tok"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE dd AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |bg AS (SELECT doc_id, CAST(('0x' || substr(md5(w1 || ' ' || w2), 1, 15)) AS BIGINT) % 1024 AS b
             |       FROM (SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))],
             |             recursive := true) FROM dd WHERE len(w) >= 2)),
             |tg AS (SELECT bg.b FROM bg JOIN documents USING (doc_id) WHERE lang = 'en'),
             |db AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
             |rm AS (SELECT b, sum(n) AS cr FROM db GROUP BY b),
             |nr AS (SELECT CAST(sum(n) AS DOUBLE) AS nr FROM db),
             |tm AS (SELECT b, count(*) AS ct FROM tg GROUP BY b),
             |nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM tg),
             |terms AS (SELECT doc_id, n,
             |    CAST(n AS DOUBLE) * (ln(CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) - ln(nt + 1024.0)
             |      - ln(CAST(cr AS DOUBLE) + 1.0) + ln(nr + 1024.0)) AS t
             |  FROM db JOIN rm USING (b) LEFT JOIN tm USING (b) CROSS JOIN nr CROSS JOIN nt),
             |dagg AS (SELECT doc_id, round(sum(t), 4) AS logw FROM terms GROUP BY doc_id),
             |dsir AS (SELECT d2.doc_id, coalesce(logw, 0.0) AS logw
             |         FROM documents d2 LEFT JOIN dagg USING (doc_id)),
             |surv AS MATERIALIZED (SELECT doc_id, logw FROM dsir WHERE logw >= 0.0),
             |toks AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |         FROM documents JOIN surv USING (doc_id)),
             |model AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
             |tot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS total
             |        FROM documents JOIN surv USING (doc_id)),
             |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             |         round(avg(-ln(CAST(cnt AS DOUBLE) / total) / ln(2)), 4) AS bits_per_tok
             |       FROM toks JOIN model USING (term), tot GROUP BY doc_id),
             |r AS (SELECT *, row_number() OVER (ORDER BY bits_per_tok, doc_id) - 1 AS rk,
             |        count(*) OVER () AS nn FROM sc),
             |banded AS MATERIALIZED (SELECT doc_id, n_tok, bits_per_tok,
             |             CAST((rk * 3) // nn AS BIGINT) AS bucket
             |           FROM r WHERE (rk * 3) // nn < 2),
             |embsrc AS MATERIALIZED (SELECT e0.* FROM embeddings e0
             |           JOIN banded ON e0.vec_id = banded.doc_id),
             |${kmeansCtes(k = 8, iters = 2, dims = 64, src = "embsrc")},
             |evv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embsrc),
             |p AS (SELECT a.vid AS ia, b.vid AS ib
             |      FROM sfin a JOIN sfin b ON a.cid = b.cid AND a.vid < b.vid
             |      JOIN evv va ON va.vec_id = a.vid
             |      JOIN evv vb ON vb.vec_id = b.vid
             |      WHERE round(list_cosine_similarity(va.v, vb.v) * 1000000.0)
             |            / 1000000.0 >= 0.8),
             |edges AS (SELECT ia AS u, ib AS v FROM p UNION SELECT ib, ia FROM p),
             |reach AS (SELECT u AS src, u AS dst FROM edges
             |          UNION
             |          SELECT rr.src, e2.v FROM reach rr JOIN edges e2 ON rr.dst = e2.u),
             |lab AS (SELECT src AS vec_id, min(dst) AS cluster
             |        FROM reach GROUP BY src)
             |SELECT b.doc_id, s.logw, b.n_tok, b.bits_per_tok, b.bucket
             |FROM banded b JOIN surv s USING (doc_id)
             |WHERE b.doc_id NOT IN (SELECT vec_id FROM lab WHERE vec_id <> cluster)
             |ORDER BY b.doc_id""".stripMargin),
      bench = true),

    // ---- Gopher rule battery (Rae et al. 2021 App. A): measured stats
    // + per-rule booleans + the keep conjunction, per doc. Comparisons
    // run on unrounded int/int ratio doubles (engine-identical), display
    // ratios round to 4 dp.
    Q("q134_gopher_rules",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          graft.operators.TextAnalysis.gopherRules(col("text")).as("g"))
        .select(col("doc_id"), col("g.*"))
        .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w,
             |             string_split(text, chr(10)) AS ln FROM documents),
             |m AS (SELECT doc_id,
             |  CAST(len(w) AS BIGINT) AS n,
             |  CAST(list_reduce(list_transform(w, x -> CAST(len(x) AS BIGINT)), (a,b) -> a+b) AS DOUBLE)
             |    / CAST(len(w) AS DOUBLE) AS ml,
             |  CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS BIGINT) AS sym,
             |  CAST(len(list_filter(ln, l -> regexp_matches(l, '^[ \t]*[-*•]'))) AS BIGINT) AS bl,
             |  CAST(len(ln) AS BIGINT) AS nl,
             |  CAST(len(list_intersect(list_distinct(w), [$EnList])) AS BIGINT) AS st
             |  FROM d)
             |SELECT doc_id, n AS n_words, round(ml, 4) AS mean_word_len,
             |  round(CAST(sym AS DOUBLE) / CAST(n AS DOUBLE), 4) AS symbol_ratio,
             |  round(CAST(bl AS DOUBLE) / CAST(nl AS DOUBLE), 4) AS bullet_frac,
             |  st AS n_stopwords,
             |  (n >= 50 AND n <= 100000) AS r_words,
             |  (ml >= 3.0 AND ml <= 10.0) AS r_wordlen,
             |  (CAST(sym AS DOUBLE) / CAST(n AS DOUBLE) < 0.1) AS r_symbol,
             |  (CAST(bl AS DOUBLE) / CAST(nl AS DOUBLE) <= 0.9) AS r_bullet,
             |  (st >= 2) AS r_stop,
             |  ((n >= 50 AND n <= 100000) AND (ml >= 3.0 AND ml <= 10.0)
             |    AND (CAST(sym AS DOUBLE) / CAST(n AS DOUBLE) < 0.1)
             |    AND (CAST(bl AS DOUBLE) / CAST(nl AS DOUBLE) <= 0.9)
             |    AND (st >= 2)) AS keep
             |FROM m ORDER BY doc_id""".stripMargin)),

    // ---- audio analysis frames driver-checked through the REAL
    // javax.sound decode (the q97 pattern for audio): deterministic PCM
    // assets whose integer pseudo-noise samples are SQL-reproducible, so
    // every 25 ms / 10 ms-hop frame's rms — an exact-integer energy sum
    // under a correctly-rounded sqrt — hash-matches the oracle. Clips
    // shorter than one frame (doc_id % 5 = 0) emit nothing.
    Q("q135_audio_frames",
      (s, d) => graft.operators.Multimodal.applyAudioFrames(
          s,
          graft.operators.Multimodal.pcmAssets(
            s, t(s, d, "documents").where(col("doc_id") % 11 === 0)),
          frameMs = 25, hopMs = 10)
        .select(col("doc_id"), col("frame_idx"), col("start_sample"),
          round(col("rms"), 6).as("rms"))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH a AS (SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 0 THEN 100
             |         ELSE 400 + (doc_id % 5) * 300 END AS n
             |  FROM documents WHERE doc_id % 11 = 0),
             |s AS (SELECT doc_id, i,
             |    CAST(((i * 31 + 7) % 201 - 100) * 50 AS BIGINT) AS v
             |  FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM a)),
             |fr AS (SELECT doc_id, CAST(k AS BIGINT) AS k, CAST(k * 80 AS BIGINT) AS st
             |       FROM (SELECT doc_id, unnest(range(0, (n - 200) // 80 + 1)) AS k
             |             FROM a WHERE n >= 200))
             |SELECT fr.doc_id, k AS frame_idx, st AS start_sample,
             |  round(sqrt(CAST(sum(v * v) AS DOUBLE) / 200.0), 6) AS rms
             |FROM fr JOIN s ON s.doc_id = fr.doc_id AND s.i >= st AND s.i < st + 200
             |GROUP BY fr.doc_id, k, st
             |ORDER BY fr.doc_id, frame_idx""".stripMargin)),

    // ---- Streaming near-dup ADMISSION CONTROL, driver-checked: two
    // staged document batches (even ids, then odd ids) stream through
    // streamingNearDupIngest under Trigger.AvailableNow against a shared
    // checkpoint; the accepted table must equal the iterated batch twin —
    // batch 1 deduped within itself (conservative smaller-id rule),
    // batch 2 against batch-1 SURVIVORS and within itself. batch_id
    // comes from the checkpoint (0 then 1), so a checkpoint bug
    // (re-processing or skipping a landed file) changes rows or
    // batch_ids and fails the hash compare. Same threshold/shingle
    // scheme as q106, so the oracle reuses its exact-Jaccard CTEs.
    Q("q136_stream_neardup",
      (s, d) => {
        import graft.streaming.EventsStream
        val root = java.nio.file.Files.createTempDirectory("graft-q136")
        val landing = root.resolve("landing")
        java.nio.file.Files.createDirectories(landing)
        val target = root.resolve("accepted").toString
        val ckpt = root.resolve("ckpt").toString
        val docs = t(s, d, "documents").select("doc_id", "text")
        def land(batch: org.apache.spark.sql.DataFrame, tag: String): Unit = {
          val tmp = root.resolve(s"stage_$tag")
          batch.coalesce(1).write.parquet(tmp.toString)
          val part = new java.io.File(tmp.toString).listFiles()
            .filter(f => f.getName.startsWith("part-") &&
              f.getName.endsWith(".parquet")).head
          java.nio.file.Files.copy(part.toPath, landing.resolve(s"$tag.parquet"))
          ()
        }
        def stream = s.readStream.schema(docs.schema).parquet(landing.toString)
        land(docs.where(col("doc_id") % 2 === 0), "b1")
        EventsStream.streamingNearDupIngest(s, stream, 0.5, target, ckpt)
        land(docs.where(col("doc_id") % 2 === 1), "b2")
        EventsStream.streamingNearDupIngest(s, stream, 0.5, target, ckpt)
        s.read.parquet(target).select(col("doc_id"), col("batch_id"))
          .orderBy("doc_id")
      },
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |          for i in range(1, len(w) - 1)])) AS s
             |       FROM ws WHERE len(w) >= 3),
             |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2),
             |sim AS (SELECT ia, ib FROM inter
             |        JOIN cnt ca ON ca.doc_id = ia
             |        JOIN cnt cb ON cb.doc_id = ib
             |        WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5),
             |simu AS (SELECT ia AS u, ib AS v FROM sim
             |         UNION ALL SELECT ib, ia FROM sim),
             |k1 AS (SELECT doc_id FROM documents
             |       WHERE doc_id % 2 = 0
             |         AND doc_id NOT IN (SELECT u FROM simu
             |                            WHERE v % 2 = 0 AND v < u)),
             |k2 AS (SELECT doc_id FROM documents
             |       WHERE doc_id % 2 = 1
             |         AND doc_id NOT IN (SELECT u FROM simu
             |                            WHERE v IN (SELECT doc_id FROM k1))
             |         AND doc_id NOT IN (SELECT u FROM simu
             |                            WHERE v % 2 = 1 AND v < u))
             |SELECT doc_id, CAST(0 AS BIGINT) AS batch_id FROM k1
             |UNION ALL
             |SELECT doc_id, CAST(1 AS BIGINT) AS batch_id FROM k2
             |ORDER BY doc_id""".stripMargin)),

    // ---- DSIR resampling: q130's scores become a SELECTION — the top-n
    // documents by (rounded logw desc, doc_id), the deterministic
    // contract replacing the paper's Gumbel resample (no engine-portable
    // exp(); see dsirSelect scaladoc). The cut is the q89 two-phase
    // prefix pattern on counts, so no one-partition window; the oracle
    // ranks the identical rounded weights with row_number.
    Q("q137_dsir_select",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.TrainingPrep
          .dsirSelect(docs, docs.where(col("lang") === "en"),
            buckets = 1024, n = 120)
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |bg AS (SELECT doc_id, CAST(('0x' || substr(md5(w1 || ' ' || w2), 1, 15)) AS BIGINT) % 1024 AS b
             |       FROM (SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))],
             |             recursive := true) FROM d WHERE len(w) >= 2)),
             |tg AS (SELECT bg.b FROM bg JOIN documents USING (doc_id) WHERE lang = 'en'),
             |db AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
             |rm AS (SELECT b, sum(n) AS cr FROM db GROUP BY b),
             |nr AS (SELECT CAST(sum(n) AS DOUBLE) AS nr FROM db),
             |tm AS (SELECT b, count(*) AS ct FROM tg GROUP BY b),
             |nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM tg),
             |terms AS (SELECT doc_id, n,
             |    CAST(n AS DOUBLE) * (ln(CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) - ln(nt + 1024.0)
             |      - ln(CAST(cr AS DOUBLE) + 1.0) + ln(nr + 1024.0)) AS t
             |  FROM db JOIN rm USING (b) LEFT JOIN tm USING (b) CROSS JOIN nr CROSS JOIN nt),
             |agg AS (SELECT doc_id, round(sum(t), 4) AS logw FROM terms GROUP BY doc_id),
             |sel AS (SELECT d2.doc_id, coalesce(logw, 0.0) AS logw
             |        FROM documents d2 LEFT JOIN agg USING (doc_id)),
             |r AS (SELECT doc_id, logw,
             |        CAST(row_number() OVER (ORDER BY logw DESC, doc_id) AS BIGINT) AS rank
             |      FROM sel)
             |SELECT doc_id, logw, rank FROM r WHERE rank <= 120
             |ORDER BY doc_id""".stripMargin)),

    // ---- trending-terms PRODUCTION table sink, driver-checked: the
    // events file-stream drives trendingTermsToTable under
    // Trigger.AvailableNow; the keyed (ws, rank) table is read back and
    // must hold the batch ranks of every watermark-CLOSED hour window.
    // Closed = window_end <= watermark, where the final watermark is
    // floor(max event ms) - 1 hour (Spark tracks watermarks in ms).
    // ws presents as epoch SECONDS (hour-aligned, so exact) per the
    // register's no-raw-timestamp convention.
    Q("q138_trending_table",
      (s, d) => {
        val root = java.nio.file.Files.createTempDirectory("graft-q138")
        val target = root.resolve("trending").toString
        graft.streaming.EventsStream.trendingTermsToTable(s,
          graft.streaming.EventsStream.readEvents(s, d), "props",
          "1 hour", k = 5, target, root.resolve("ckpt").toString)
        s.read.parquet(target)
          .select(col("ws").cast("long").as("ws_s"), col("rank"),
            col("term"), col("n"))
          .orderBy("ws_s", "rank")
      },
      Some("""WITH e AS (SELECT CAST(epoch_us(ts) // 1000 AS BIGINT) AS ms, props
             |           FROM events),
             |wm AS (SELECT max(ms) - 3600000 AS w FROM e),
             |t AS (SELECT ms // 3600000 AS h,
             |             unnest(string_split(props, ' ')) AS term
             |      FROM e),
             |c AS (SELECT h, term, count(*) AS n FROM t
             |      WHERE len(term) > 0 GROUP BY 1, 2),
             |closed AS (SELECT h, term, n FROM c, wm
             |           WHERE (h + 1) * 3600000 <= w),
             |r AS (SELECT h, term, n,
             |        row_number() OVER (PARTITION BY h ORDER BY n DESC, term) AS rank
             |      FROM closed)
             |SELECT CAST(h * 3600 AS BIGINT) AS ws_s, CAST(rank AS INT) AS rank,
             |       term, n
             |FROM r WHERE rank <= 5
             |ORDER BY ws_s, rank""".stripMargin)),

    // ---- Bloom-gated incremental dedup: the batch anti-joined against
    // the ingested corpus on the q96 content fingerprint, with a Bloom
    // filter admitting bloom-negative rows at scan speed so only the
    // maybe-hits reach the exact anti-join. The result is EXACT (the
    // filter only gates), so the oracle is the plain anti-join — engine
    // and oracle agree whatever the filter's collision behavior.
    Q("q139_bloom_gated_dedup",
      (s, d) => {
        val fp = graft.operators.TextAnalysis.fingerprint(col("text"))
        val docs = t(s, d, "documents")
        graft.operators.Dedup.bloomGatedAntiJoin(
            docs.where(col("doc_id") % 3 === 0).withColumn("f", fp),
            docs.where(col("doc_id") % 3 =!= 0).select(fp.as("f")),
            "f", numBits = 1 << 17)
          .select(col("doc_id")).orderBy("doc_id")
      },
      Some("""WITH fp AS (SELECT doc_id,
             |    md5(lower(trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g')))) AS f
             |  FROM documents)
             |SELECT doc_id FROM fp b
             |WHERE doc_id % 3 = 0 AND NOT EXISTS (
             |  SELECT 1 FROM fp c WHERE c.doc_id % 3 <> 0 AND c.f = b.f)
             |ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- hard-negative mining for contrastive training: per anchor, the
    // best positive from its own k-means cluster and the top-3 hardest
    // negatives from its runner-up (nearest competing) cluster. The
    // runner-up comes from the same NearestCentroid2 kernel pass as the
    // assignment; the oracle re-derives it as rank 2 of the kmeans CTE
    // chain's full (vid, cid, d) relation under the same (d, cid) order.
    Q("q140_hard_negatives",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        // scaled k: positives/negatives are cluster-keyed pair joins, so
        // the q132 sizing argument applies verbatim (sf0.01 floor = 8)
        graft.operators.Similarity
          .hardNegatives(emb, k = Similarity.scaledK(emb), iters = 2,
            nNeg = 3)
          .select(col("vid").as("vec_id"), col("kind"), col("rnk"),
            col("other_id"), col("cos"))
          .orderBy("vec_id", "kind", "rnk")
      },
      Some(hardNegativesOracle(k = 8, iters = 2, dims = 64, nNeg = 3)),
      bench = true),

    // ---- farthest-point-seeded k-means: q129's Lloyd machinery with
    // Gonzalez max-min seeding replacing smallest-id seeds — quality-aware
    // init that stays deterministic (no RNG, no transcendental), so the
    // oracle replays the greedy seed sweep round by round.
    Q("q142_kmeans_farthest",
      (s, d) => graft.operators.Clustering
        .kMeansAssignFarthest(t(s, d, "embeddings"), k = 4, iters = 2)
        .orderBy("vec_id"),
      Some(s"""WITH ${kmeansCtes(4, 2, 64, seedCtes = Some(farthestSeedCtes(4, 64)))}
              |SELECT vid AS vec_id, cid AS cluster, round(d, 4) AS dist FROM sfin
              |ORDER BY vec_id""".stripMargin)),

    // ---- pipeline v4: v3's DSIR -> CCNet -> clustered-SemDeDup chain
    // with the round's new gates up front — the Gopher rule battery
    // (q134's keep conjunction) and Bloom-gated decontamination against
    // an evaluation slice (doc_id % 41 == 0; exact-content fingerprints,
    // the q139 operator). Gates are scan-speed predicates, so they run
    // FIRST and every downstream stage (DSIR model, perplexity model,
    // dedup) is built over the gated corpus only.
    Q("q143_pipeline_v4",
      (s, d) => {
        import graft.operators.{Dedup, Similarity, TextAnalysis, TrainingPrep}
        val all = t(s, d, "documents")
        val fp = TextAnalysis.fingerprint(col("text"))
        val evalSet = all.where(col("doc_id") % 41 === 0)
        // checkpointed seam (the v3 `w` argument): every downstream stage
        // (DSIR raw + target, perplexity fit, band join) re-references the
        // gated corpus, and without the seam each reference re-runs the
        // Gopher battery + fingerprint md5 + bloom probe scans
        val gated = Dedup.bloomGatedAntiJoin(
            all.where(col("doc_id") % 41 =!= 0)
              .where(TextAnalysis.gopherRules(col("text")).getField("keep"))
              .withColumn("f", fp),
            evalSet.select(fp.as("f")), "f", numBits = 1 << 17)
          .drop("f")
          .localCheckpoint()
        val w = TrainingPrep
          .dsirLogWeights(gated, gated.where(col("lang") === "en"),
            buckets = 1024)
          .where(col("logw") >= 0.0)
          .select("doc_id", "logw")
          .localCheckpoint()
        val survDocs = gated.join(w.select("doc_id"), Seq("doc_id"))
        val banded = TrainingPrep.perplexityBuckets(survDocs, nBuckets = 3)
          .where(col("bucket") < 2)
        val embRaw = t(s, d, "embeddings")
        val embSurv = embRaw
          .join(banded.select(col("doc_id").as("vec_id")),
            Seq("vec_id"), "left_semi")
        // scaled k from the raw table — the q133 sizing note applies
        val keptEmb = Similarity
          .semanticDedupClustered(embSurv, 0.8,
            k = Similarity.scaledK(embRaw), iters = 2)
        val losers = embSurv.select(col("vec_id").as("doc_id"))
          .join(keptEmb.select(col("vec_id").as("doc_id")),
            Seq("doc_id"), "left_anti")
        banded.join(losers, Seq("doc_id"), "left_anti")
          .join(w, Seq("doc_id"))
          .select(col("doc_id"), col("logw"), col("n_tok"),
            col("bits_per_tok"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE evf AS (SELECT DISTINCT
             |    md5(lower(trim(regexp_replace(text, '[ \\t\\n\\r\\f]+', ' ', 'g')))) AS f
             |  FROM documents WHERE doc_id % 41 = 0),
             |gm AS (SELECT doc_id,
             |  CAST(len(w) AS BIGINT) AS n,
             |  CAST(list_reduce(list_transform(w, x -> CAST(len(x) AS BIGINT)), (a,b) -> a+b) AS DOUBLE)
             |    / CAST(len(w) AS DOUBLE) AS ml,
             |  CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS BIGINT) AS sym,
             |  CAST(len(list_filter(ln, l -> regexp_matches(l, '^[ \\t]*[-*•]'))) AS BIGINT) AS bl,
             |  CAST(len(ln) AS BIGINT) AS nl,
             |  CAST(len(list_intersect(list_distinct(w), [$EnList])) AS BIGINT) AS st
             |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w,
             |          string_split(text, chr(10)) AS ln
             |        FROM documents WHERE doc_id % 41 <> 0)),
             |base AS MATERIALIZED (SELECT d0.doc_id, d0.text, d0.lang
             |  FROM documents d0 JOIN gm USING (doc_id)
             |  LEFT JOIN evf ON evf.f =
             |    md5(lower(trim(regexp_replace(d0.text, '[ \\t\\n\\r\\f]+', ' ', 'g'))))
             |  WHERE (gm.n >= 50 AND gm.n <= 100000)
             |    AND (gm.ml >= 3.0 AND gm.ml <= 10.0)
             |    AND (CAST(gm.sym AS DOUBLE) / CAST(gm.n AS DOUBLE) < 0.1)
             |    AND (CAST(gm.bl AS DOUBLE) / CAST(gm.nl AS DOUBLE) <= 0.9)
             |    AND (gm.st >= 2)
             |    AND evf.f IS NULL),
             |dd AS (SELECT doc_id, string_split(text,' ') AS w FROM base),
             |bg AS (SELECT doc_id, CAST(('0x' || substr(md5(w1 || ' ' || w2), 1, 15)) AS BIGINT) % 1024 AS b
             |       FROM (SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))],
             |             recursive := true) FROM dd WHERE len(w) >= 2)),
             |tg AS (SELECT bg.b FROM bg JOIN base USING (doc_id) WHERE lang = 'en'),
             |db AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
             |rm AS (SELECT b, sum(n) AS cr FROM db GROUP BY b),
             |nr AS (SELECT CAST(sum(n) AS DOUBLE) AS nr FROM db),
             |tm AS (SELECT b, count(*) AS ct FROM tg GROUP BY b),
             |nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM tg),
             |terms AS (SELECT doc_id, n,
             |    CAST(n AS DOUBLE) * (ln(CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) - ln(nt + 1024.0)
             |      - ln(CAST(cr AS DOUBLE) + 1.0) + ln(nr + 1024.0)) AS t
             |  FROM db JOIN rm USING (b) LEFT JOIN tm USING (b) CROSS JOIN nr CROSS JOIN nt),
             |dagg AS (SELECT doc_id, round(sum(t), 4) AS logw FROM terms GROUP BY doc_id),
             |dsir AS (SELECT d2.doc_id, coalesce(logw, 0.0) AS logw
             |         FROM base d2 LEFT JOIN dagg USING (doc_id)),
             |surv AS MATERIALIZED (SELECT doc_id, logw FROM dsir WHERE logw >= 0.0),
             |toks AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |         FROM base JOIN surv USING (doc_id)),
             |model AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
             |tot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS total
             |        FROM base JOIN surv USING (doc_id)),
             |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             |         round(avg(-ln(CAST(cnt AS DOUBLE) / total) / ln(2)), 4) AS bits_per_tok
             |       FROM toks JOIN model USING (term), tot GROUP BY doc_id),
             |r AS (SELECT *, row_number() OVER (ORDER BY bits_per_tok, doc_id) - 1 AS rk,
             |        count(*) OVER () AS nn FROM sc),
             |banded AS MATERIALIZED (SELECT doc_id, n_tok, bits_per_tok,
             |             CAST((rk * 3) // nn AS BIGINT) AS bucket
             |           FROM r WHERE (rk * 3) // nn < 2),
             |embsrc AS MATERIALIZED (SELECT e0.* FROM embeddings e0
             |           JOIN banded ON e0.vec_id = banded.doc_id),
             |${kmeansCtes(k = 8, iters = 2, dims = 64, src = "embsrc")},
             |evv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embsrc),
             |p AS (SELECT a.vid AS ia, b.vid AS ib
             |      FROM sfin a JOIN sfin b ON a.cid = b.cid AND a.vid < b.vid
             |      JOIN evv va ON va.vec_id = a.vid
             |      JOIN evv vb ON vb.vec_id = b.vid
             |      WHERE round(list_cosine_similarity(va.v, vb.v) * 1000000.0)
             |            / 1000000.0 >= 0.8),
             |edges AS (SELECT ia AS u, ib AS v FROM p UNION SELECT ib, ia FROM p),
             |reach AS (SELECT u AS src, u AS dst FROM edges
             |          UNION
             |          SELECT rr.src, e2.v FROM reach rr JOIN edges e2 ON rr.dst = e2.u),
             |lab AS (SELECT src AS vec_id, min(dst) AS cluster
             |        FROM reach GROUP BY src)
             |SELECT b.doc_id, s.logw, b.n_tok, b.bits_per_tok, b.bucket
             |FROM banded b JOIN surv s USING (doc_id)
             |WHERE b.doc_id NOT IN (SELECT vec_id FROM lab WHERE vec_id <> cluster)
             |ORDER BY b.doc_id""".stripMargin),
      bench = true),

    // ---- count-min heavy-hitter estimation: the true top-20 terms with
    // their sketch estimates alongside. Counters are SUMS over portable
    // md5 buckets, so the sketch is order/partition-independent and the
    // oracle rebuilds every cell; estimates only ever overcount
    // (min over depth rows bounds the collision error).
    Q("q144_count_min",
      (s, d) => {
        import graft.operators.{Sketches, TextAnalysis}
        val toks = t(s, d, "documents")
          .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        val counters = Sketches.countMinCounters(toks, col("term"), 1024, 4)
        val top = toks.groupBy("term").agg(count(lit(1)).as("n_true"))
          .orderBy(col("n_true").desc, col("term")).limit(20)
        Sketches.countMinEstimate(counters, top.select("term"), "term", 1024, 4)
          .join(top, Seq("term"))
          .select(col("term"), col("n_true"), col("est"))
          .orderBy("term")
      },
      Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
             |cells AS (SELECT j,
             |            CAST(('0x' || substr(md5('cm' || j || ':' || term), 1, 15)) AS BIGINT) % 1024 AS b,
             |            count(*) AS c
             |          FROM tok, range(4) r(j) GROUP BY 1, 2),
             |top AS (SELECT term, CAST(count(*) AS BIGINT) AS n_true FROM tok
             |        GROUP BY term ORDER BY n_true DESC, term LIMIT 20),
             |est AS (SELECT term, CAST(min(coalesce(c, 0)) AS BIGINT) AS est
             |        FROM (SELECT term, j,
             |                CAST(('0x' || substr(md5('cm' || j || ':' || term), 1, 15)) AS BIGINT) % 1024 AS b
             |              FROM top, range(4) r(j)) k
             |        LEFT JOIN cells USING (j, b) GROUP BY term)
             |SELECT term, n_true, est
             |FROM top JOIN est USING (term) ORDER BY term""".stripMargin),
      bench = true),

    // ---- incrementally-MAINTAINED bloom filter across ingest batches:
    // batch 1 dedups against the initial history; batch 2 dedups against
    // history + batch-1 SURVIVORS with the filter obtained by ORing the
    // survivors' words into the history's words (bloomMerge) — no
    // history rescan. Results stay exact (the filter only gates), so the
    // oracle is the two iterated anti-joins.
    Q("q145_bloom_incremental",
      (s, d) => {
        import graft.operators.{Dedup, Sketches, TextAnalysis}
        val fp = TextAnalysis.fingerprint(col("text"))
        val docs = t(s, d, "documents").withColumn("f", fp)
        val hist = docs.where(col("doc_id") % 3 === 1)
        val b1 = docs.where(col("doc_id") % 3 === 2)
        val b2 = docs.where(col("doc_id") % 3 === 0)
        val m = 1 << 17
        val histWords = Sketches.bloomBuild(hist.select("f"), col("f"), m)
        val acc1 = Dedup.bloomGatedAntiJoinWith(histWords, b1, hist.select("f"), "f")
          .localCheckpoint() // read twice: its words and the verify union
        val words2 = Sketches.bloomMerge(histWords,
          Sketches.bloomBuild(acc1.select("f"), col("f"), m))
        val acc2 = Dedup.bloomGatedAntiJoinWith(words2, b2,
          hist.select("f").unionByName(acc1.select("f")), "f")
        acc1.select(col("doc_id"), lit(1L).as("batch"))
          .unionByName(acc2.select(col("doc_id"), lit(2L).as("batch")))
          .orderBy("doc_id")
      },
      Some("""WITH fp AS (SELECT doc_id,
             |    md5(lower(trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g')))) AS f
             |  FROM documents),
             |k1 AS (SELECT doc_id, f FROM fp b WHERE doc_id % 3 = 2
             |       AND NOT EXISTS (SELECT 1 FROM fp h
             |                       WHERE h.doc_id % 3 = 1 AND h.f = b.f)),
             |k2 AS (SELECT doc_id FROM fp b WHERE doc_id % 3 = 0
             |       AND NOT EXISTS (SELECT 1 FROM fp h
             |                       WHERE h.doc_id % 3 = 1 AND h.f = b.f)
             |       AND NOT EXISTS (SELECT 1 FROM k1 WHERE k1.f = b.f))
             |SELECT doc_id, CAST(1 AS BIGINT) AS batch FROM k1
             |UNION ALL SELECT doc_id, CAST(2 AS BIGINT) AS batch FROM k2
             |ORDER BY doc_id""".stripMargin)),

    // ---- KMV set algebra: union/intersection distinct-term estimates
    // for the two corpus halves from their k-min sketches — mergeable
    // set cardinality without pairing the sets. Deterministic under the
    // portable hash, so every intermediate (tau, kk, rho) is
    // oracle-reproduced; exact truths ride along for calibration.
    Q("q146_kmv_set_algebra",
      (s, d) => {
        import graft.operators.{Sketches, TextAnalysis}
        val docs = t(s, d, "documents")
        def terms(p: org.apache.spark.sql.Column) = docs.where(p)
          .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        val a = terms(col("doc_id") % 2 === 0)
        val b = terms(col("doc_id") % 2 === 1)
        val exact = a.select(col("term")).distinct()
          .join(b.select(col("term")).distinct(), Seq("term"), "left_semi")
          .agg(count(lit(1)).as("n_inter_exact"))
        Sketches.kmvSetAlgebra(a, b, "term", k = 256)
          .crossJoin(exact)
      },
      Some("""WITH ta AS (SELECT DISTINCT
             |    CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h
             |  FROM (SELECT unnest(string_split(text, ' ')) AS term
             |        FROM documents WHERE doc_id % 2 = 0)),
             |tb AS (SELECT DISTINCT
             |    CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h
             |  FROM (SELECT unnest(string_split(text, ' ')) AS term
             |        FROM documents WHERE doc_id % 2 = 1)),
             |kmin AS (SELECT h FROM (SELECT DISTINCT h
             |         FROM (SELECT h FROM ta UNION ALL SELECT h FROM tb))
             |         ORDER BY h LIMIT 256),
             |st AS (SELECT max(h) AS tau, count(*) AS kk FROM kmin),
             |rho AS (SELECT count(*) AS rho FROM kmin
             |        WHERE h IN (SELECT h FROM ta) AND h IN (SELECT h FROM tb)),
             |eu AS (SELECT CASE WHEN kk < 256 THEN CAST(kk AS DOUBLE)
             |         ELSE 255.0 * 1152921504606846976.0 / CAST(tau AS DOUBLE) END AS estu,
             |         tau, kk FROM st),
             |ex AS (SELECT count(*) AS n_inter_exact FROM
             |         (SELECT DISTINCT term FROM (SELECT unnest(string_split(text, ' ')) AS term
             |            FROM documents WHERE doc_id % 2 = 0)) x
             |       WHERE term IN (SELECT DISTINCT term FROM
             |         (SELECT unnest(string_split(text, ' ')) AS term
             |          FROM documents WHERE doc_id % 2 = 1)))
             |SELECT round(estu, 4) AS est_union,
             |  round(CAST(rho AS DOUBLE) / CAST(kk AS DOUBLE) * estu, 4) AS est_intersect,
             |  CAST(rho AS BIGINT) AS rho, CAST(kk AS BIGINT) AS kk,
             |  CAST(n_inter_exact AS BIGINT) AS n_inter_exact
             |FROM eu, rho, ex""".stripMargin),
      bench = true),

    // ---- image perceptual hash over REAL PNG decode (the q97/q135
    // pattern for still images): deterministic 16x16 grayscale assets
    // round-trip the real javax.imageio codec losslessly, and every
    // aHash bit is an exact integer compare (blockSum*64 > totalSum)
    // the oracle reproduces from the pixel formula.
    Q("q147_image_ahash",
      (s, d) => graft.operators.Multimodal.imageAHash(
          s,
          graft.operators.Multimodal.pngAssets(s, t(s, d, "documents")))
        .orderBy("doc_id"),
      Some("""WITH px AS (SELECT doc_id, x, y,
             |    ((x + 1) * (doc_id % 7 + 3) * 7 + (y + 1) * (doc_id % 7 + 5) * 11) % 256
             |      + CASE WHEN doc_id % 4 = 0 AND x = 0 AND y = 0 THEN 8 ELSE 0 END AS v
             |  FROM documents, range(16) rx(x), range(16) ry(y)),
             |bl AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS b, sum(v) AS bs
             |       FROM px GROUP BY 1, 2),
             |tot AS (SELECT doc_id, sum(v) AS ts FROM px GROUP BY 1),
             |bits AS (SELECT doc_id, b,
             |           CASE WHEN bs * 64 > ts THEN '1' ELSE '0' END AS bit
             |         FROM bl JOIN tot USING (doc_id))
             |SELECT doc_id, string_agg(bit, '' ORDER BY b) AS ahash
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- image near-dup PAIRS: q147's aHash routed through the SimHash
    // Manku block-combination machinery (hammingPairs over precomputed
    // signatures) — candidates from block-subset keys, exact
    // bit_count(xor) verify, never all-pairs. On this fixture edits hash
    // identically and motifs sit >= 27 bits apart, so hamming <= 2 pairs
    // are exactly the same-motif pairs; the oracle still computes real
    // hamming over the distinct hash pairs and expands to ids.
    Q("q148_image_neardup",
      (s, d) => {
        import graft.operators.{Dedup, Multimodal}
        val sub = t(s, d, "documents").where(col("doc_id") % 5 === 0)
        val h = Multimodal.imageAHash(s, Multimodal.pngAssets(s, sub))
        val sig = h.select(col("doc_id"),
          (0 until 64).map(b =>
            when(substring(col("ahash"), b + 1, 1) === "1", lit(1L << b))
              .otherwise(lit(0L)))
            .reduce(_.bitwiseOR(_)).as("sig"))
        Dedup.hammingPairs(sig, maxDist = 2, sigCol = "sig")
          .orderBy("id_a", "id_b")
      },
      Some("""WITH px AS (SELECT doc_id, x, y,
             |    ((x + 1) * (doc_id % 7 + 3) * 7 + (y + 1) * (doc_id % 7 + 5) * 11) % 256
             |      + CASE WHEN doc_id % 4 = 0 AND x = 0 AND y = 0 THEN 8 ELSE 0 END AS v
             |  FROM documents, range(16) rx(x), range(16) ry(y)
             |  WHERE doc_id % 5 = 0),
             |bl AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS b, sum(v) AS bs
             |       FROM px GROUP BY 1, 2),
             |tot AS (SELECT doc_id, sum(v) AS ts FROM px GROUP BY 1),
             |bits AS (SELECT doc_id, b,
             |           CASE WHEN bs * 64 > ts THEN '1' ELSE '0' END AS bit
             |         FROM bl JOIN tot USING (doc_id)),
             |h AS (SELECT doc_id, string_agg(bit, '' ORDER BY b) AS ahash
             |      FROM bits GROUP BY doc_id),
             |dh AS (SELECT DISTINCT ahash FROM h),
             |hd AS (SELECT a.ahash AS ha, b.ahash AS hb,
             |         len([i for i in range(1, 65) IF a.ahash[i] <> b.ahash[i]]) AS hamming
             |       FROM dh a, dh b)
             |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
             |       CAST(hd.hamming AS BIGINT) AS hamming
             |FROM hd JOIN h x ON x.ahash = hd.ha JOIN h y ON y.ahash = hd.hb
             |WHERE x.doc_id < y.doc_id AND hd.hamming <= 2
             |ORDER BY id_a, id_b""".stripMargin),
      bench = true),

    // ---- audio energy-delta fingerprint over REAL WAV decode: the q147
    // pattern for audio — motif assets round-trip javax.sound, frame
    // energies are exact integer sums, and each of the 64 bits is the
    // exact compare e_{k+1} > e_k the oracle reproduces from the sample
    // formula. Near-dup pairing rides Dedup.hammingPairs (spec).
    Q("q149_audio_fingerprint",
      (s, d) => graft.operators.Multimodal.audioFingerprint(
          s,
          graft.operators.Multimodal.pcmMotifAssets(
            s, t(s, d, "documents").where(col("doc_id") % 5 === 0)))
        .orderBy("doc_id"),
      Some("""WITH p AS (SELECT doc_id, i,
             |    ((i * 31 + 7 + (doc_id % 7) * 13) % 201 - 100) * 50
             |      + CASE WHEN doc_id % 4 = 0 AND i = 0 THEN 50 ELSE 0 END AS s
             |  FROM documents, range(1625) r(i)
             |  WHERE doc_id % 5 = 0),
             |e AS (SELECT doc_id, i // 25 AS k, sum(s * s) AS e
             |      FROM p GROUP BY 1, 2),
             |b AS (SELECT a.doc_id, a.k,
             |        CASE WHEN n.e > a.e THEN '1' ELSE '0' END AS bit
             |      FROM e a JOIN e n ON n.doc_id = a.doc_id AND n.k = a.k + 1
             |      WHERE a.k < 64)
             |SELECT doc_id, string_agg(bit, '' ORDER BY k) AS afp
             |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- one-pass table profile: the per-column data-quality report
    // (non-null, exact distinct, min/max as strings) from ONE scan — the
    // ingest-gate audit. Oracle is the per-column UNION ALL.
    Q("q150_table_profile",
      (s, d) => graft.operators.Profiling.profile(t(s, d, "documents"))
        .orderBy("column"),
      Some("""SELECT * FROM (
             |SELECT 'doc_id' AS "column", 'bigint' AS dtype,
             |  CAST(count(doc_id) AS BIGINT) AS n_notnull,
             |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
             |  CAST(min(doc_id) AS VARCHAR) AS min_s,
             |  CAST(max(doc_id) AS VARCHAR) AS max_s FROM documents
             |UNION ALL
             |SELECT 'text', 'string', CAST(count(text) AS BIGINT),
             |  CAST(count(DISTINCT text) AS BIGINT),
             |  min(text), max(text) FROM documents
             |UNION ALL
             |SELECT 'lang', 'string', CAST(count(lang) AS BIGINT),
             |  CAST(count(DISTINCT lang) AS BIGINT),
             |  min(lang), max(lang) FROM documents
             |UNION ALL
             |SELECT 'source', 'string', CAST(count(source) AS BIGINT),
             |  CAST(count(DISTINCT source) AS BIGINT),
             |  min(source), max(source) FROM documents
             |UNION ALL
             |SELECT 'n_chars', 'bigint', CAST(count(n_chars) AS BIGINT),
             |  CAST(count(DISTINCT n_chars) AS BIGINT),
             |  CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
             |  FROM documents)
             |ORDER BY "column"""".stripMargin),
      bench = true),

    // ---- profile drift between two snapshots (even-id vs odd-id halves
    // as stand-ins for yesterday/today): both one-pass profiles joined
    // per column with a null-safe stability verdict — the before/after
    // ingest audit.
    Q("q151_profile_drift",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.Profiling.profileDrift(
            docs.where(col("doc_id") % 2 === 0),
            docs.where(col("doc_id") % 2 === 1))
          .orderBy("column")
      },
      Some("""WITH a AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
             |b AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
             |pa AS (
             |  SELECT 'doc_id' AS "column", 'bigint' AS dtype,
             |    CAST(count(doc_id) AS BIGINT) AS nn_a,
             |    CAST(count(DISTINCT doc_id) AS BIGINT) AS nd_a,
             |    CAST(min(doc_id) AS VARCHAR) AS min_a,
             |    CAST(max(doc_id) AS VARCHAR) AS max_a FROM a
             |  UNION ALL SELECT 'text', 'string', CAST(count(text) AS BIGINT),
             |    CAST(count(DISTINCT text) AS BIGINT), min(text), max(text) FROM a
             |  UNION ALL SELECT 'lang', 'string', CAST(count(lang) AS BIGINT),
             |    CAST(count(DISTINCT lang) AS BIGINT), min(lang), max(lang) FROM a
             |  UNION ALL SELECT 'source', 'string', CAST(count(source) AS BIGINT),
             |    CAST(count(DISTINCT source) AS BIGINT), min(source), max(source) FROM a
             |  UNION ALL SELECT 'n_chars', 'bigint', CAST(count(n_chars) AS BIGINT),
             |    CAST(count(DISTINCT n_chars) AS BIGINT),
             |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM a),
             |pb AS (
             |  SELECT 'doc_id' AS "column",
             |    CAST(count(doc_id) AS BIGINT) AS nn_b,
             |    CAST(count(DISTINCT doc_id) AS BIGINT) AS nd_b,
             |    CAST(min(doc_id) AS VARCHAR) AS min_b,
             |    CAST(max(doc_id) AS VARCHAR) AS max_b FROM b
             |  UNION ALL SELECT 'text', CAST(count(text) AS BIGINT),
             |    CAST(count(DISTINCT text) AS BIGINT), min(text), max(text) FROM b
             |  UNION ALL SELECT 'lang', CAST(count(lang) AS BIGINT),
             |    CAST(count(DISTINCT lang) AS BIGINT), min(lang), max(lang) FROM b
             |  UNION ALL SELECT 'source', CAST(count(source) AS BIGINT),
             |    CAST(count(DISTINCT source) AS BIGINT), min(source), max(source) FROM b
             |  UNION ALL SELECT 'n_chars', CAST(count(n_chars) AS BIGINT),
             |    CAST(count(DISTINCT n_chars) AS BIGINT),
             |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM b)
             |SELECT pa."column", dtype, nn_a, nd_a, min_a, max_a,
             |  nn_b, nd_b, min_b, max_b,
             |  (nd_a = nd_b AND min_a IS NOT DISTINCT FROM min_b
             |    AND max_a IS NOT DISTINCT FROM max_b) AS stable
             |FROM pa JOIN pb USING ("column")
             |ORDER BY "column"""".stripMargin)),

    // ---- source-balanced selection: q89's budget cut applied PER SOURCE
    // (no domain may exceed its token budget). The engine runs the
    // skew-robust two-phase prefix sum (a hot source spans range
    // partitions); the oracle is the declarative keyed-window cumsum the
    // result is defined to equal.
    Q("q141_source_budget",
      (s, d) => graft.operators.TrainingPrep
        .selectPerSourceBudget(t(s, d, "documents"), budgetTokens = 800)
        .orderBy("source", "doc_id"),
      Some("""WITH d AS (SELECT source, doc_id, n_chars,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (SELECT source, doc_id, n_tok,
             |    CAST(sum(n_tok) OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
             |  FROM d)
             |SELECT source, doc_id, n_tok, cum_tok FROM c
             |WHERE cum_tok <= 800
             |ORDER BY source, doc_id""".stripMargin)),

    // ---- GPT-3/PaLM-style 13-gram decontamination with SPAN EXCISION:
    // q61 drops whole contaminated documents; the standard recipe (GPT-3
    // appendix C) excises the overlapping window ± margin and KEEPS the
    // document. Benchmark = a mid-document 21-token excerpt of every
    // doc_id%17 doc — a benchmark sentence embedded verbatim in crawl
    // text — so hits exist at every scale and every contaminated doc
    // survives with partial text. The engine detects hits via a
    // broadcast hashed-gram semi-join (corpus never shuffles to find
    // them) and rebuilds through the q109 island-merge machinery; the
    // oracle composes the q61 gram chain with the q109 merge/rebuild
    // chain on gram TEXT (the xxhash64 probe is a Spark-side broadcast-
    // width optimization, not semantics).
    Q("q152_decontam_excise",
      (s, d) => {
        val docs = t(s, d, "documents")
        val bench = docs.where(col("doc_id") % 17 === 0)
          .select(array_join(slice(
            graft.operators.TextAnalysis.tokens(col("text")), 11, 21), " ")
            .as("text"))
        graft.operators.TrainingPrep
          .exciseContamination(docs, bench, n = 13, margin = 2)
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |bw AS (SELECT w[11:31] AS w FROM d WHERE doc_id % 17 = 0),
             |bg AS (SELECT DISTINCT unnest([array_to_string(w[(i+1):(i+13)], ' ')
             |       for i in range(0, greatest(len(w)-13+1,0))]) AS gram FROM bw),
             |g AS (SELECT doc_id, unnest([{'pos': i, 'gram': array_to_string(w[(i+1):(i+13)], ' ')}
             |       for i in range(0, greatest(len(w)-13+1,0))], recursive := true) FROM d),
             |spans AS (SELECT doc_id, greatest(pos - 2, 0) AS s, pos + 13 - 1 + 2 AS e
             |        FROM g JOIN bg USING (gram)),
             |isl AS (SELECT doc_id, s, e,
             |        CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS brk
             |        FROM spans),
             |merged AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM (
             |        SELECT doc_id, s, e, sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
             |        FROM isl) GROUP BY doc_id, grp),
             |perdoc AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS sp FROM merged GROUP BY doc_id)
             |SELECT d.doc_id,
             |  coalesce(array_to_string([w[i+1] for i in range(0, len(w))
             |    if len(list_filter(coalesce(sp, []), x -> i >= x.s AND i <= x.e)) = 0], ' '), '') AS clean_text,
             |  CAST(len(w) - len([w[i+1] for i in range(0, len(w))
             |    if len(list_filter(coalesce(sp, []), x -> i >= x.s AND i <= x.e)) = 0]) AS BIGINT) AS removed
             |FROM d LEFT JOIN perdoc USING (doc_id) ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- TRAINED char-trigram language ID: q28's langId is a fixed
    // marker heuristic; this fits per-language trigram profiles on a
    // labeled slice (doc_id%10, using the corpus's own lang labels) and
    // scores every doc by smoothed log-likelihood, argmax per doc. The
    // engine completes the (doc x lang) grid by exploding a literal
    // language array (bounded driver collect, never a BNLJ cross join)
    // and ranks on the ROUNDED score (q110/q130 convention) so the
    // argmax is engine-reproducible. Oracle = the same decomposition
    // S ln p = S ln(cnt+1) - m*ln(tot_l+V) in DuckDB; hot CTEs
    // MATERIALIZED (DuckDB inlines per reference otherwise).
    Q("q153_lang_id_trained",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.TrainingPrep.trainedLangId(
          docs, docs.where(col("doc_id") % 10 === 0), n = 3, vocabSize = 500)
          .orderBy("doc_id")
      },
      Some("""WITH lt AS MATERIALIZED (
             |  SELECT lang, unnest([substr(text, i, 3) for i in range(1, greatest(len(text)-1, 1))]) AS g
             |  FROM documents WHERE doc_id % 10 = 0),
             |counts AS MATERIALIZED (SELECT lang, g, count(*) AS cnt FROM lt GROUP BY 1, 2),
             |vocab AS MATERIALIZED (SELECT g FROM (
             |  SELECT g, sum(cnt) AS tot FROM counts GROUP BY g ORDER BY tot DESC, g LIMIT 500)),
             |cv AS MATERIALIZED (SELECT lang, g, cnt FROM counts JOIN vocab USING (g)),
             |pl AS (SELECT lang, sum(cnt) AS tot_l FROM cv GROUP BY lang),
             |vc AS (SELECT count(*) AS v FROM vocab),
             |occ AS MATERIALIZED (
             |  SELECT doc_id, g FROM (
             |    SELECT doc_id, unnest([substr(text, i, 3) for i in range(1, greatest(len(text)-1, 1))]) AS g
             |    FROM documents) JOIN vocab USING (g)),
             |m AS (SELECT doc_id, count(*) AS m FROM occ GROUP BY doc_id),
             |a AS (SELECT doc_id, lang, sum(ln(cnt + 1)) AS a FROM occ JOIN cv USING (g) GROUP BY 1, 2),
             |langs AS (SELECT DISTINCT lang FROM cv),
             |sc AS (SELECT m.doc_id, l.lang,
             |       round(coalesce(a.a, 0) - m.m * ln(tot_l + v), 4) AS score
             |       FROM m CROSS JOIN langs l
             |       LEFT JOIN a ON a.doc_id = m.doc_id AND a.lang = l.lang
             |       JOIN pl ON pl.lang = l.lang CROSS JOIN vc)
             |SELECT doc_id, lang AS lang_pred, score
             |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn FROM sc)
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- unigram-LM (SentencePiece-family) tokenizer, one hard-EM round
    // closed-form: seed = substring candidates (len<=4, minCount 5,
    // single chars always kept) with quantized log-probs; E-step =
    // integer-Viterbi per distinct word (quantization makes the DP exact
    // integer arithmetic — bit-reproducible across engines, the q129
    // trick); M-step = usage renormalization. The oracle replicates the
    // Viterbi DP with a recursive CTE carrying (best, back) LISTS per
    // word and the same smallest-split tie-break, then backtraces with a
    // second recursive CTE. Bpe.train's full-loop analogue is
    // Unigram.train (spec-driven; prune order deterministic).
    Q("q154_unigram_lm_round",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.Unigram.emRound(docs,
            graft.operators.Unigram.seedPieces(docs, maxPieceLen = 4, minCount = 5))
          .orderBy("piece")
      },
      Some("""WITH RECURSIVE
             |w AS (SELECT unnest(string_split(text,' ')) AS word FROM documents),
             |d AS MATERIALIZED (SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY word),
             |sub AS (SELECT cnt, unnest(flatten([[substr(word, s, l) for s in range(1, len(word)-l+2)]
             |        for l in range(1, least(len(word), 4)+1)])) AS piece FROM d),
             |pc AS MATERIALIZED (SELECT piece, sum(cnt) AS cnt FROM sub GROUP BY piece
             |      HAVING sum(cnt) >= 5 OR len(piece) = 1),
             |tot AS (SELECT sum(cnt) AS t FROM pc),
             |mp AS MATERIALIZED (SELECT map(list(piece ORDER BY piece),
             |      list(CAST(round((ln(cnt) - ln(t)) * 10000) AS BIGINT) ORDER BY piece)) AS m
             |      FROM pc CROSS JOIN tot),
             |dp AS (
             |  SELECT word, cnt, 0 AS j, [CAST(0 AS BIGINT)] AS best, [CAST(-1 AS BIGINT)] AS back
             |  FROM d
             |  UNION ALL
             |  SELECT word, cnt, j + 1,
             |    list_append(best, -struct_extract(pick, 'negs')),
             |    list_append(back, struct_extract(pick, 'i'))
             |  FROM (
             |    SELECT word, cnt, j, best, back,
             |      list_min([{'negs': -(best[i+1] + m[substr(word, i+1, j+1-i)][1]), 'i': i}
             |        for i in range(greatest(j+1-4, 0), j+1)
             |        if best[i+1] IS NOT NULL AND len(m[substr(word, i+1, j+1-i)]) > 0]) AS pick
             |    FROM dp CROSS JOIN mp WHERE j < len(word))
             |),
             |fin AS MATERIALIZED (SELECT word, cnt, back FROM dp
             |      WHERE j = len(word) AND best[len(word)+1] IS NOT NULL),
             |bt AS (
             |  SELECT word, cnt, back, len(word) AS j, CAST([] AS VARCHAR[]) AS pieces FROM fin
             |  UNION ALL
             |  SELECT word, cnt, back, back[j+1],
             |    list_prepend(substr(word, CAST(back[j+1]+1 AS INT), CAST(j - back[j+1] AS INT)), pieces)
             |  FROM bt WHERE j > 0
             |),
             |use AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS usage FROM (
             |      SELECT cnt, unnest(pieces) AS piece FROM bt WHERE j = 0) GROUP BY piece),
             |ut AS (SELECT sum(usage) AS t FROM use)
             |SELECT piece, usage, round(usage / t, 4) AS p_new
             |FROM use CROSS JOIN ut ORDER BY piece""".stripMargin),
      bench = true),

    // ---- WordPiece (BERT tokenizer family) likelihood scoring round:
    // unlike BPE (raw pair frequency), WordPiece fuses the pair with the
    // largest unigram-LM likelihood gain score = pc/(ca*cb); the ln
    // decomposition ln pc - ln ca - ln cb is composed identically on both
    // engines and rounded 4 dp (q110/q130 convention), ties broken on the
    // unique (lsym, rsym) group key. Scoring runs on the distinct-word
    // table (vocab-sized); symbol counts are alphabet-sized broadcasts.
    Q("q155_wordpiece_score",
      (s, d) => graft.operators.WordPiece.scoreRound(
        t(s, d, "documents"), topN = 20),
      Some("""WITH w AS (SELECT unnest(string_split(text,' ')) AS word FROM documents),
             |d AS MATERIALIZED (SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY word),
             |s AS MATERIALIZED (SELECT cnt,
             |  [CASE WHEN i = 1 THEN substr(word, 1, 1) ELSE '##' || substr(word, i, 1) END
             |   for i in range(1, len(word)+1)] AS syms FROM d),
             |sc AS MATERIALIZED (SELECT sym, sum(cnt) AS c FROM (
             |  SELECT cnt, unnest(syms) AS sym FROM s) GROUP BY sym),
             |pc AS (SELECT lsym, rsym, sum(cnt) AS pc FROM (
             |  SELECT cnt, unnest([{'lsym': syms[i+1], 'rsym': syms[i+2]}
             |    for i in range(0, len(syms)-1)], recursive := true)
             |  FROM s WHERE len(syms) >= 2) GROUP BY lsym, rsym)
             |SELECT lsym, rsym, CAST(pc AS BIGINT) AS pair_cnt,
             |  CAST(l.c AS BIGINT) AS left_cnt, CAST(r.c AS BIGINT) AS right_cnt,
             |  round(ln(pc) - ln(l.c) - ln(r.c), 4) AS score_ln
             |FROM pc JOIN sc l ON l.sym = pc.lsym JOIN sc r ON r.sym = pc.rsym
             |ORDER BY score_ln DESC, lsym, rsym LIMIT 20""".stripMargin),
      bench = true),

    // ---- WordPiece MaxMatch vocabulary, data-derived: word-initial
    // pieces plain, continuations ##-prefixed, count-thresholded with
    // single chars kept unconditionally (coverage guarantee — the
    // Unigram.seedPieces convention). Vocab-bounded by construction.
    Q("q156_wordpiece_vocab",
      (s, d) => graft.operators.WordPiece.greedyVocab(t(s, d, "documents"))
        .orderBy("piece"),
      Some("""WITH w AS (SELECT unnest(string_split(text,' ')) AS word FROM documents),
             |d AS MATERIALIZED (SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY word),
             |sub AS (SELECT cnt, unnest(flatten(
             |  [[CASE WHEN s = 1 THEN substr(word, s, l) ELSE '##' || substr(word, s, l) END
             |    for l in range(1, least(4, len(word)-s+1)+1)]
             |   for s in range(1, len(word)+1)])) AS piece FROM d)
             |SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM sub GROUP BY piece
             |HAVING sum(cnt) >= 5 OR len(regexp_replace(piece, '^##', '')) = 1
             |ORDER BY piece""".stripMargin)),

    // ---- WordPiece greedy longest-match-first segmentation (BERT's
    // wordpiece_tokenizer contract, by-word UNK) against the q156 vocab.
    // The engine broadcasts the vocab as a set and segments scan-speed
    // with a capped per-partition word cache (Bpe.segment shape); the
    // oracle replays greedy MaxMatch per distinct word with a recursive
    // CTE (pick = longest vocab hit at pos via the q154 map-probe trick)
    // then reassembles docs in word order.
    Q("q157_wordpiece_segment",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.WordPiece.segment(docs,
          graft.operators.WordPiece.trainedVocab(docs)).orderBy("doc_id")
      },
      Some("""WITH RECURSIVE
             |w0 AS (SELECT doc_id, string_split(text,' ') AS wl FROM documents),
             |w AS (SELECT unnest(wl) AS word FROM w0),
             |d AS MATERIALIZED (SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY word),
             |sub AS (SELECT cnt, unnest(flatten(
             |  [[CASE WHEN s = 1 THEN substr(word, s, l) ELSE '##' || substr(word, s, l) END
             |    for l in range(1, least(4, len(word)-s+1)+1)]
             |   for s in range(1, len(word)+1)])) AS piece FROM d),
             |pieces AS (SELECT piece FROM sub GROUP BY piece
             |  HAVING sum(cnt) >= 5 OR len(regexp_replace(piece, '^##', '')) = 1),
             |mp AS MATERIALIZED (SELECT map(list(piece), list(1)) AS m FROM pieces),
             |seg AS (
             |  SELECT word, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces, false AS unk FROM d
             |  UNION ALL
             |  SELECT word,
             |    CASE WHEN pick IS NULL THEN len(word) ELSE pos + pick END,
             |    CASE WHEN pick IS NULL THEN ['[UNK]']
             |         ELSE list_append(pieces,
             |           CASE WHEN pos = 0 THEN substr(word, pos+1, pick)
             |                ELSE '##' || substr(word, pos+1, pick) END) END,
             |    pick IS NULL AS unk
             |  FROM (
             |    SELECT word, pos, pieces,
             |      list_max([l for l in range(1, least(4, len(word)-pos)+1)
             |        if len(m[CASE WHEN pos = 0 THEN substr(word, pos+1, l)
             |                      ELSE '##' || substr(word, pos+1, l) END]) > 0]) AS pick
             |    FROM seg CROSS JOIN mp WHERE pos < len(word) AND NOT unk)
             |),
             |fin AS MATERIALIZED (SELECT word, pieces FROM seg WHERE pos = len(word)),
             |dw AS (SELECT doc_id, unnest([{'i': i, 'word': wl[i+1]}
             |  for i in range(0, len(wl)) if wl[i+1] <> ''], recursive := true) FROM w0),
             |agg AS (SELECT doc_id, flatten(list(pieces ORDER BY i)) AS pl
             |  FROM dw JOIN fin USING (word) GROUP BY doc_id)
             |SELECT doc_id, coalesce(array_to_string(pl, ' '), '') AS piece_str,
             |  CAST(coalesce(len(pl), 0) AS BIGINT) AS n_pieces
             |FROM documents LEFT JOIN agg USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- trained quality classifier, model inspection: 3 rounds of
    // exact-quantized full-batch logistic regression distilling the q29
    // heuristic quality gate (label y = quality >= 0.9 on the doc_id%3
    // slice) into weights over the five stats-kernel features. Sigmoid
    // quantizes to 1e-6 BEFORE the gradient so every per-doc term is an
    // exact integer — sums are partition-invariant and the DuckDB replay
    // is bit-identical (the q129 discipline applied to GD).
    Q("q158_logreg_train",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.QualityClassifier
          .weightsTable(docs, logregModel(docs)).orderBy("j")
      },
      Some(s"""WITH ${logregCtes(3)}
              |SELECT j, feature, round(w*1000000.0)/1000000.0 AS weight FROM (
              |  SELECT CAST(0 AS BIGINT) AS j, 'bias' AS feature, w1 AS w FROM wfin
              |  UNION ALL SELECT 1, 'ln_tokens', w2 FROM wfin
              |  UNION ALL SELECT 2, 'punct_ratio', w3 FROM wfin
              |  UNION ALL SELECT 3, 'stop_ratio', w4 FROM wfin
              |  UNION ALL SELECT 4, 'mean_word_len', w5 FROM wfin)
              |ORDER BY j""".stripMargin)),

    // ---- trained quality classifier, scoring pass: every doc scored
    // sigma(w.x) under the q158 model, keep from the ROUNDED score. The
    // scoring projection is pure per-row column arithmetic — shuffle-free
    // scan-speed, the model baked in as five literal doubles; training
    // cost is 3 aggregations over a localCheckpoint'd (y, 5 longs) table
    // (decimal(38,0) sums — exact past 10^25 docs where longs overflow).
    Q("q159_logreg_quality",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.QualityClassifier
          .score(docs, logregModel(docs)).orderBy("doc_id")
      },
      Some(s"""WITH ${logregCtes(3)}
              |SELECT doc_id, score, score >= 0.5 AS keep FROM (
              |  SELECT doc_id,
              |    round(1.0/(1.0 + exp(-(w1*(x1/1000000.0) + w2*(x2/1000000.0) + w3*(x3/1000000.0)
              |      + w4*(x4/1000000.0) + w5*(x5/1000000.0)))) * 1000000.0)/1000000.0 AS score
              |  FROM fx CROSS JOIN wfin)
              |ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- distributed PCA, stage 1 — the covariance table: one corpus
    // pass exploding each vector to its upper-triangle quantized moment
    // products, map-side combined to 2080 exact integer sums (nothing
    // row-sized shuffles); covariance composed from the sums with the
    // same divisions in the same order as the DuckDB replay, so the
    // doubles are bit-identical (IEEE ops only — no transcendentals
    // anywhere in the PCA rows).
    Q("q160_pca_covariance",
      (s, d) => graft.operators.Pca.covariance(t(s, d, "embeddings"), 64)
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          (round(col("cov") * 100000000.0) / 100000000.0).as("cov"))
        .orderBy("i", "j"),
      Some(s"""WITH ${pcaCtes(64, 0, 0)}
              |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
              |  round(c*100000000.0)/100000000.0 AS cov
              |FROM cov ORDER BY i, j""".stripMargin)),

    // ---- distributed PCA, stage 2 — the eigen-model: top-4 principal
    // directions by re-orthogonalized power iteration (40 rounds of
    // matvec + modified Gram-Schmidt + normalize per component from the
    // (1,2,…,d) start — orthonormal BY CONSTRUCTION, which matters on
    // this corpus's near-isotropic spectrum) on the DRIVER over the
    // collected 2080-row moments — model-sized work off the cluster; λ
    // is the Rayleigh quotient on the original covariance. The oracle
    // replays the identical iteration with recursive CTEs. Sign is
    // pinned by the deterministic start vector.
    Q("q161_pca_loadings",
      (s, d) => graft.operators.Pca.loadingsTable(
          t(s, d, "embeddings"), 64, k = 4).orderBy("rank", "i"),
      Some {
        val ranks = (1 to 4).map { r =>
          s"""SELECT CAST(${r - 1} AS BIGINT) AS rank, CAST(t.i AS BIGINT) AS i,
             |  v[t.i+1] AS loading, l AS lambda
             |FROM range(0, 64) t(i) CROSS JOIN v$r CROSS JOIN l$r""".stripMargin
        }.mkString("\nUNION ALL ")
        s"""WITH RECURSIVE ${pcaCtes(64, 4, 40)}
           |SELECT rank, i, round(loading*1000000.0)/1000000.0 AS loading,
           |  round(lambda*1000000.0)/1000000.0 AS lambda FROM (
           |$ranks)
           |ORDER BY rank, i""".stripMargin
      }),

    // ---- distributed PCA, stage 3 — the projection: every embedding
    // onto the top-4 mean-centered components. Scan-speed: the model
    // (4x64 loadings + 64 means) bakes into the plan as literals — one
    // codegen'd projection, shuffle-free, broadcast-free; per-element
    // scalar quantization (the q158 codegen lesson — no array
    // round-trip through element_at).
    Q("q162_pca_project",
      (s, d) => graft.operators.Pca.project(t(s, d, "embeddings"), 64, k = 4)
        .orderBy("vec_id"),
      Some {
        val ps = (1 to 4).map { r =>
          s"""round(list_reduce([w$r[i+1] * (q[i+1]/10000.0 - mu[i+1])
             |      for i in range(0, 64)], (a,b) -> a + b) * 1000000.0)/1000000.0 AS p${r - 1}"""
            .stripMargin
        }.mkString(",\n  ")
        val joins = (1 to 4).map(r =>
          s"CROSS JOIN (SELECT v AS w$r FROM v$r) a$r").mkString(" ")
        s"""WITH RECURSIVE ${pcaCtes(64, 4, 40)}
           |SELECT vec_id,
           |  $ps
           |FROM qid $joins CROSS JOIN mu
           |ORDER BY vec_id""".stripMargin
      },
      bench = true),

    // ---- product quantization, stage 1 — the codes: every vector's m=8
    // subspace codewords under freshly-trained per-subspace Lloyd
    // codebooks (Jégou 2011). Engine trains all 8 codebooks in ONE
    // assignment + ONE integer (code, dim) aggregation per round; the
    // oracle replays them as 8 independent suffixed k-means chains over
    // sliced vectors (slice-then-quantize == quantize-then-slice) —
    // codes hash-matching proves codebooks AND assignments bit-exact.
    // Output shape is scalar (vec_id, subspace, code) rows — NOT an
    // array column — because the harness compare sorts rows through
    // pandas, which cannot order list-valued cells (the r13 lesson).
    Q("q163_pq_codes",
      (s, d) => graft.operators.Pq.pqCodes(t(s, d, "embeddings"))
        .select(col("vec_id"),
          posexplode(col("codes")).as(Seq("subspace", "code")))
        .orderBy("vec_id", "subspace"),
      Some {
        val chains = (0 until 8).map { sp =>
          kmeansCtes(16, 2, 8, src = s"(SELECT vec_id, " +
            s"embedding[${sp * 8 + 1}:${(sp + 1) * 8}] AS embedding " +
            s"FROM embeddings) AS sub$sp", sfx = s"p$sp")
        }.mkString(",\n")
        val codeRows = (0 until 8).map(sp =>
          s"SELECT vid AS vec_id, CAST($sp AS INT) AS subspace, " +
            s"CAST(cid AS INT) AS code FROM sfinp$sp")
          .mkString("\nUNION ALL\n")
        s"""WITH $chains
           |$codeRows
           |ORDER BY vec_id, subspace""".stripMargin
      }),

    // ---- product quantization, stage 2 — IVFADC search (the complete
    // Jégou pipeline: q49's IVF coarse gate + the ADC lookup-table scan
    // over the q163 codes + the q65 exact re-rank): probe the 3 cells
    // nearest the query, rank probed candidates by the m-term LUT sum,
    // exact-cosine re-rank the best 50 to top-10. The oracle replays
    // EVERYTHING — coarse k-means, 8 subspace codebooks, codes, LUT,
    // ADC fold, both cuts — not a brute-force stand-in; recall vs brute
    // force is additionally spec-checked (PqSpec).
    Q("q164_sim_topk_ivfpq",
      (s, d) => graft.operators.Pq.ivfPqTopK(t(s, d, "embeddings"), 0L, 10),
      Some {
        val chains = (0 until 8).map { sp =>
          kmeansCtes(16, 2, 8, src = s"(SELECT vec_id, " +
            s"embedding[${sp * 8 + 1}:${(sp + 1) * 8}] AS embedding " +
            s"FROM embeddings) AS sub$sp", sfx = s"p$sp")
        }.mkString(",\n")
        // LUT per subspace: exact squared distance from the query's
        // sub-vector to each final codeword — the kernel's fold order
        val luts = (0 until 8).map(sp =>
          s"""lut$sp AS (SELECT c.cid, list_reduce(list_transform(
             |    [CAST(qq.q[${sp * 8}+i+1] AS DOUBLE) - c.cl[i+1] for i in range(0,8)],
             |    v -> v*v), (x,y) -> x+y) AS lv
             |  FROM cent2p$sp c CROSS JOIN qq)""".stripMargin).mkString(",\n")
        val codeJoins = (0 until 8).map(sp =>
          s"JOIN sfinp$sp a$sp ON a$sp.vid = s.vid " +
            s"JOIN lut$sp l$sp ON l$sp.cid = a$sp.cid").mkString("\n  ")
        val adcSum = (0 until 8).map(sp => s"l$sp.lv").mkString(" + ")
        s"""WITH ${kmeansCtes(8, 2, 64, sfx = "cv")},
           |$chains,
           |qq AS (SELECT q FROM ecv WHERE vid = 0),
           |probe AS (SELECT cid FROM (
           |    SELECT c.cid, list_reduce(list_transform(
           |        [CAST(qq.q[i+1] AS DOUBLE) - c.cl[i+1] for i in range(0,64)],
           |        v -> v*v), (x,y) -> x+y) AS d
           |    FROM cent2cv c CROSS JOIN qq)
           |  ORDER BY d, cid LIMIT 3),
           |$luts,
           |cand AS (SELECT s.vid, $adcSum AS adist
           |  FROM sfincv s
           |  $codeJoins
           |  WHERE s.cid IN (SELECT cid FROM probe) AND s.vid <> 0
           |  ORDER BY adist, s.vid LIMIT 50),
           |qv AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
           |SELECT e.vec_id,
           |  (round((list_cosine_similarity(e.embedding::DOUBLE[], qv.qe)) * 1000000.0) / 1000000.0) AS cos
           |FROM cand JOIN embeddings e ON e.vec_id = cand.vid CROSS JOIN qv
           |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
      },
      bench = true),

    // ---- the ITERATIVE WordPiece trainer (completing q155, which
    // materializes only the first scoring round): 3 rounds of
    // score-argmax-fuse-recount over the vocab-sized word table — the
    // Bpe.train loop shape under the likelihood rule. The oracle unrolls
    // all 3 rounds; its fusion rewrites the symbol list through a
    // sentinel-delimited string replace() (left-to-right non-overlapping
    // — exactly fuseOnce's scan; chr(1)/chr(2) verified absent from the
    // corpus), so every later round's counts, argmax, and rounded score
    // are reproduced bit-for-bit.
    Q("q165_wordpiece_train",
      (s, d) => {
        import s.implicits._
        graft.operators.WordPiece.train(t(s, d, "documents"), rounds = 3)
          .toDF()
          .select(col("round").cast("long").as("round"), col("lsym"),
            col("rsym"), col("piece"), col("pair_cnt"), col("score_ln"))
          .orderBy("round")
      },
      Some {
        val perRound = (1 to 3).map { r =>
          val fuse = if (r == 3) "" else s""",
            |ws${r + 1} AS MATERIALIZED (SELECT cnt,
            |    string_split(substr(s2, 2, len(s2) - 2), chr(2)||chr(1)) AS syms
            |  FROM (SELECT cnt,
            |      replace(chr(1) || array_to_string(syms, chr(2)||chr(1)) || chr(2),
            |        chr(1) || b.lsym || chr(2) || chr(1) || b.rsym || chr(2),
            |        chr(1) || b.piece || chr(2)) AS s2
            |    FROM ws$r CROSS JOIN best$r b))"""
          s"""sc$r AS MATERIALIZED (SELECT sym, sum(cnt) AS c FROM (
             |  SELECT cnt, unnest(syms) AS sym FROM ws$r) GROUP BY sym),
             |pc$r AS (SELECT lsym, rsym, sum(cnt) AS pc FROM (
             |  SELECT cnt, unnest([{'lsym': syms[i+1], 'rsym': syms[i+2]}
             |    for i in range(0, len(syms)-1)], recursive := true)
             |  FROM ws$r WHERE len(syms) >= 2) GROUP BY lsym, rsym),
             |best$r AS MATERIALIZED (SELECT lsym, rsym,
             |    CAST(pc AS BIGINT) AS pair_cnt,
             |    round(ln(pc) - ln(l.c) - ln(r.c), 4) AS score_ln,
             |    lsym || CASE WHEN rsym LIKE '##%' THEN substr(rsym, 3)
             |                 ELSE rsym END AS piece
             |  FROM pc$r JOIN sc$r l ON l.sym = pc$r.lsym
             |            JOIN sc$r r ON r.sym = pc$r.rsym
             |  ORDER BY score_ln DESC, lsym, rsym LIMIT 1)$fuse"""
        }.mkString(",\n")
        val rows = (1 to 3).map(r =>
          s"SELECT CAST($r AS BIGINT) AS round, lsym, rsym, piece, " +
            s"pair_cnt, score_ln FROM best$r").mkString("\nUNION ALL ")
        s"""WITH w AS (SELECT unnest(string_split(text,' ')) AS word FROM documents),
           |d AS MATERIALIZED (SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY word),
           |ws1 AS MATERIALIZED (SELECT cnt,
           |  [CASE WHEN i = 1 THEN substr(word, 1, 1) ELSE '##' || substr(word, i, 1) END
           |   for i in range(1, len(word)+1)] AS syms FROM d),
           |$perRound
           |SELECT * FROM (
           |$rows)
           |ORDER BY round""".stripMargin
      }),

    // ---- k-means|| oversampled seeding (Bahmani 2012), deterministic:
    // the constant-pass quality seeding the scaledK regime needs (at
    // k ~ 100 the Gonzalez sweep is k-1 corpus passes; this is `rounds`
    // passes for the same quality class). Every draw is the portable
    // md5 hash, distances the exact integer-quantized kernel, phi an
    // exact decimal sum, the recluster a deterministic weighted
    // farthest-point — so the oracle replays ALL of it: 3 sampling
    // rounds, candidate weights, and the 8 greedy seed picks.
    Q("q166_kmeans_parallel_seed",
      (s, d) => graft.operators.Clustering.kMeansParallelCandidates(
          t(s, d, "embeddings"), k = 8, ell = 16, rounds = 3)
        .orderBy("vec_id"),
      Some(kmeansParallelOracle(k = 8, ell = 16, rounds = 3, dims = 64))),

    // ---- BATCHED exact ANN: 8 queries answered in ONE corpus scan
    // (per-query loops re-scan |Q| times); the broadcast is the query
    // BATCH, bounded by the caller, and the per-query top-k is a
    // WindowGroupLimit — pruned to k per query map-side before the
    // shuffle carries |Q|*k rows. The production retrieval shape q25's
    // single-query form composes into.
    Q("q168_sim_topk_batch",
      (s, d) => Similarity.bruteForceTopKBatch(t(s, d, "embeddings"),
          Seq(0L, 7L, 23L, 100L, 211L, 333L, 404L, 499L), 5)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk"),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e
             |      WHERE vec_id IN (0, 7, 23, 100, 211, 333, 404, 499)),
             |sc AS (SELECT q.query_id, e.vec_id,
             |         (round((list_cosine_similarity(e.v, q.qv)) * 1000000.0) / 1000000.0) AS cos
             |       FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
             |rk AS (SELECT query_id, vec_id, cos,
             |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
             |       FROM sc)
             |SELECT query_id, vec_id, cos, CAST(rnk AS BIGINT) AS rnk
             |FROM rk WHERE rnk <= 5
             |ORDER BY query_id, rnk""".stripMargin),
      bench = true),

    // ---- Jaro-Winkler fuzzy entity match: the native codegen'd
    // expression (graft.expressions.JaroWinkler — Spark has no Jaro
    // family) scoring first-word-blocked name pairs. Same blocking
    // discipline as q118's Levenshtein pass: candidates are bounded per
    // block, never all-pairs; the similarity kernel runs inside
    // whole-stage codegen on the blocked join's output.
    Q("q171_jaro_winkler_match",
      (s, d) => {
        val names = t(s, d, "part").groupBy("p_name")
          .agg(min("p_partkey").as("id"))
          .select(col("id"), col("p_name").as("name"),
            split(col("p_name"), " ").getItem(0).as("blk"))
        val a = names.select(col("id").as("id_a"), col("name").as("na"), col("blk"))
        val b = names.select(col("id").as("id_b"), col("name").as("nb"), col("blk"))
        a.join(b, Seq("blk")).where(col("id_a") < col("id_b"))
          .withColumn("jw",
            graft.expressions.JaroWinkler.jaro_winkler(col("na"), col("nb")))
          .where(col("jw") >= 0.87)
          .select(col("id_a"), col("id_b"),
            (round(col("jw") * 1000000.0) / 1000000.0).as("jw"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH names AS (SELECT min(p_partkey) AS id, p_name AS name FROM part GROUP BY p_name),
             |n AS (SELECT id, name, string_split(name, ' ')[1] AS blk FROM names)
             |SELECT a.id AS id_a, b.id AS id_b,
             |  round(jaro_winkler_similarity(a.name, b.name) * 1000000.0) / 1000000.0 AS jw
             |FROM n a JOIN n b ON a.blk = b.blk AND a.id < b.id
             |  AND jaro_winkler_similarity(a.name, b.name) >= 0.87
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- sequence-length bucketing: padding waste per power-of-two
    // cap — the planning pass for length-grouped training batches.
    Q("q172_length_buckets",
      (s, d) => graft.operators.TrainingPrep.lengthBucketWaste(
          t(s, d, "documents"), Seq(16, 32, 64, 128, 256, 512))
        .orderBy("bucket_cap"),
      Some("""WITH tok AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
             |b AS (SELECT CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
             |               WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
             |               WHEN n <= 256 THEN 256 ELSE 512 END AS bucket_cap, n
             |      FROM tok)
             |SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
             |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS sum_tokens,
             |  CAST(bucket_cap * count(*) AS BIGINT) AS padded_tokens,
             |  round((1.0 - sum(n)::DOUBLE / (bucket_cap * count(*))::DOUBLE) * 1000000.0) / 1000000.0 AS waste_frac
             |FROM b GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin)),

    // ---- ORC sink/source round-trip (the q107 JSONL pattern for the
    // second columnar format): export the corpus as ORC, read it back,
    // oracle the content against the source table. The read path gets
    // parquet-class pushdown/pruning (WritersSpec asserts PushedFilters
    // reach the ORC scan), so ORC inputs are hot-path capable.
    Q("q173_orc_roundtrip",
      (s, d) => {
        val dir = d.stripSuffix("/")
        val loc = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), "graft-orc"),
          java.lang.Integer.toHexString(dir.hashCode) + "/docs")
        graft.sources.TableWriters.orc(
          t(s, d, "documents"), loc.toString)
        graft.sources.TableWriters.readOrc(s, loc.toString)
          .select(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id")),

    // ---- STREAM-STREAM interval join, executed as an actual Structured
    // Streaming query (the q136 precedent: the register row runs the
    // stream) and oracled against the batch interval join — the
    // equivalence Structured Streaming promises. Both sides watermarked
    // (1 h) so join state is evictable at scale; the memory-sink drive
    // processes the whole file source, so no row is lost to eviction and
    // the batch SQL is the exact answer.
    Q("q174_stream_interval_join",
      (s, d) => {
        import graft.streaming.EventsStream
        val joined = EventsStream.purchaseClickJoin(
          EventsStream.readEvents(s, d.stripSuffix("/")))
        EventsStream.runToMemory(s, joined, "q174_ssjoin")
          .select(col("user_id"), col("pid"), col("cid"),
            unix_micros(col("pts")).as("pts"),
            unix_micros(col("cts")).as("cts"))
          .orderBy("pid", "cid")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events),
             |p AS (SELECT user_id, event_id AS pid, tus AS pts FROM e WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, event_id AS cid, tus AS cts FROM e WHERE event_type = 'click')
             |SELECT p.user_id, pid, cid, pts, cts
             |FROM p JOIN c ON p.user_id = c.user_id
             |  AND cts <= pts AND cts >= pts - 3600000000
             |ORDER BY pid, cid""".stripMargin)),

    // ---- weighted sampling without replacement (Efraimidis-Spirakis
    // exponential race, portable-md5 draw): 5 winners per source,
    // weight-proportional by n_chars. q122's uniform sampler is the
    // w=1 special case of the same race.
    Q("q175_weighted_sample",
      (s, d) => graft.operators.TrainingPrep.weightedSampleK(
          t(s, d, "documents"), n = 5, salt = "ws1")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("source", "doc_id"),
      Some("""SELECT doc_id, source, n_chars FROM (
             |  SELECT doc_id, source, n_chars, row_number() OVER (PARTITION BY source
             |    ORDER BY -ln((CAST(('0x' || substr(md5('ws1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
             |        / 1152921504606846976.0) / CAST(n_chars AS DOUBLE), doc_id) AS rn
             |  FROM documents WHERE n_chars > 0)
             |WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin)),

    // ---- stratified train/val/test split with EXACT per-stratum
    // proportions (rank-vs-count, not hash-threshold-in-expectation):
    // 80/10/10 within each source, assignment a pure function of
    // (salt, doc_id, stratum membership).
    Q("q176_stratified_split",
      (s, d) => graft.operators.TrainingPrep.stratifiedSplit(
          t(s, d, "documents"), trainFrac = 0.8, valFrac = 0.1, salt = "sp1")
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source,
             |  CASE WHEN rn <= floor(n * 0.8) THEN 'train'
             |       WHEN rn <= floor(n * 0.8) + floor(n * 0.1) THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id, source,
             |        row_number() OVER (PARTITION BY source
             |          ORDER BY CAST(('0x' || substr(md5('sp1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT), doc_id) AS rn,
             |        count(*) OVER (PARTITION BY source) AS n
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ---- robust per-group outlier profile: median + MAD + outlier
    // count per nation over customer balances. Medians are exact but
    // WINDOW-RANK selected (spillable sort state, never a group-sized
    // percentile buffer — the scale distinction from `percentile()`).
    Q("q177_mad_outliers",
      (s, d) => {
        val c = t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("c_acctbal"))
        graft.operators.Profiling.madOutliers(c, "n_name", "c_acctbal")
          .select(col("n_name"), col("n"),
            (round(col("med") * 10000.0) / 10000.0).as("med"),
            (round(col("mad") * 10000.0) / 10000.0).as("mad"),
            col("n_outliers"))
          .orderBy("n_name")
      },
      Some("""WITH c AS (SELECT n_name, c_acctbal FROM customer JOIN nation ON c_nationkey = n_nationkey),
             |med AS (SELECT n_name, median(c_acctbal) AS med FROM c GROUP BY n_name),
             |dev AS (SELECT c.n_name, c_acctbal, abs(c_acctbal - med.med) AS ad, med.med AS med
             |        FROM c JOIN med USING (n_name)),
             |mad AS (SELECT n_name, median(ad) AS mad FROM dev GROUP BY n_name)
             |SELECT d.n_name, count(*) AS n,
             |  round(max(d.med) * 10000.0) / 10000.0 AS med,
             |  round(max(mad.mad) * 10000.0) / 10000.0 AS mad,
             |  CAST(sum(CASE WHEN d.ad > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM dev d JOIN mad USING (n_name)
             |GROUP BY d.n_name ORDER BY d.n_name""".stripMargin)),

    // ---- classifier calibration (reliability) table on the HELD-OUT
    // split (the trainer saw doc_id%3=0; this evaluates the rest):
    // equal-count score-rank deciles (ntile — equal-width bins collapse
    // on a young model's narrow score band) vs the empirical positive
    // rate. Means are exact-integer-sum/count — no floating
    // accumulation, so the table hashes identically under any
    // partitioning.
    Q("q178_calibration",
      (s, d) => {
        val docs = t(s, d, "documents")
        val heldOut = docs.where(col("doc_id") % 3 =!= 0).withColumn("y",
          (graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.9)
            .cast("long"))
        graft.operators.QualityClassifier
          .calibrationTable(heldOut, logregModel(docs))
          .orderBy("bucket")
      },
      Some(s"""WITH ${logregCtes(3)},
              |sc AS (SELECT doc_id, y,
              |    CAST(round(1.0/(1.0 + exp(-(w1*(x1/1000000.0) + w2*(x2/1000000.0) + w3*(x3/1000000.0)
              |      + w4*(x4/1000000.0) + w5*(x5/1000000.0)))) * 1000000.0) AS BIGINT) AS sq
              |  FROM fx CROSS JOIN wfin WHERE doc_id % 3 <> 0),
              |nt AS (SELECT y, sq, CAST(ntile(10) OVER (ORDER BY sq, doc_id) AS BIGINT) AS bucket FROM sc)
              |SELECT bucket, count(*) AS n,
              |  round(CAST(sum(y) AS DOUBLE) / count(*) * 1000000.0) / 1000000.0 AS mean_label,
              |  round(CAST(sum(sq) AS DOUBLE) / count(*)) / 1000000.0 AS mean_score
              |FROM nt GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // ---- Zipf's-law fit: OLS slope of ln(freq) on ln(rank) over the
    // top-100 terms — the corpus-health scalar (slope ~ -1 = natural
    // text; flattened = template takeover).
    Q("q179_zipf_fit",
      (s, d) => graft.operators.TrainingPrep.zipfFit(t(s, d, "documents")),
      Some("""WITH tf AS (SELECT term, count(*) AS cnt FROM (
             |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
             |  GROUP BY term ORDER BY cnt DESC, term LIMIT 100),
             |xy AS (SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, term) AS DOUBLE)) AS x,
             |         ln(CAST(cnt AS DOUBLE)) AS y FROM tf),
             |agg AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
             |          sum(x*x) AS sxx, sum(x*y) AS sxy FROM xy)
             |SELECT CAST(n AS BIGINT) AS n_terms,
             |  round((n*sxy - sx*sy) / (n*sxx - sx*sx) * 10000.0) / 10000.0 AS slope,
             |  round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n * 10000.0) / 10000.0 AS intercept
             |FROM agg""".stripMargin)),

    // ---- exact nearest-rank percentile bands (P50/P90/P99 of event
    // value per type): pure rank SELECTION — no interpolation
    // arithmetic, the band values are corpus values, bit-identical
    // cross-engine. Spillable sort-window state (the q177 argument),
    // never a group-sized percentile buffer.
    Q("q180_percentile_bands",
      (s, d) => graft.operators.Profiling.rankPercentiles(
          Tables.events(s, d), "event_type", "value",
          Seq(0.5, 0.9, 0.99))
        .orderBy("event_type"),
      Some("""WITH r AS (SELECT event_type, value,
             |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n FROM events)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS p50,
             |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN value END) AS p90,
             |  max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS p99
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- Heaps'-law vocabulary growth: distinct-term count after the
    // first n/8, n/4, n/2, n documents — ONE first-occurrence aggregate
    // (term -> min doc_id) answers every prefix, no per-prefix rescan.
    // The q179 Zipf fit's companion corpus-health curve (sub-linear
    // growth = natural text; linear = unbounded-id templates).
    Q("q181_heaps_vocab",
      (s, d) => {
        val docs = t(s, d, "documents")
        val firsts = docs
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
          .groupBy("term").agg(min("doc_id").as("fd"))
        val nn = docs.agg(count(lit(1)).as("nd"))
        val divisors = Seq(8, 4, 2, 1)
        firsts.join(broadcast(nn))
          .select(explode(array(divisors.map(v =>
            struct(lit(v.toLong).as("d"),
              expr(s"nd div $v").as("prefix_docs"))): _*)).as("b"), col("fd"))
          .select(col("b.d").as("d"), col("b.prefix_docs").as("prefix_docs"),
            col("fd"))
          .groupBy("d", "prefix_docs")
          .agg(sum(when(col("fd") < col("prefix_docs"), 1L).otherwise(0L))
            .as("vocab"))
          .orderBy(col("d").desc)
      },
      Some("""WITH firsts AS (SELECT term, min(doc_id) AS fd FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
             |  GROUP BY term),
             |nn AS (SELECT count(*) AS nd FROM documents),
             |b AS (SELECT unnest([8, 4, 2, 1]) AS d),
             |g AS (SELECT CAST(b.d AS BIGINT) AS d, nn.nd // b.d AS prefix_docs
             |      FROM b CROSS JOIN nn)
             |SELECT g.d, CAST(g.prefix_docs AS BIGINT) AS prefix_docs,
             |  CAST(sum(CASE WHEN f.fd < g.prefix_docs THEN 1 ELSE 0 END) AS BIGINT) AS vocab
             |FROM g CROSS JOIN firsts f
             |GROUP BY g.d, g.prefix_docs ORDER BY g.d DESC""".stripMargin)),

    // ---- Bloom filter MAINTAINED ON DISK across ingest runs: the q145
    // incremental admission flow, but each batch LOADS the persisted
    // (idx, word) sidecar from the previous version and OR-merges its
    // own words back — no rebuild-from-history ever. The filter stays a
    // gate (anti-join verify keeps admission exact), so a stale sidecar
    // costs performance, never correctness. Same admission semantics as
    // q145 (identical oracle), now durable across JVMs.
    Q("q182_bloom_sidecar",
      (s, d) => {
        import graft.operators.{Dedup, Incremental, Sketches, TextAnalysis}
        val root = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), "graft-bloomside"),
          java.lang.Integer.toHexString(d.stripSuffix("/").hashCode)).toString
        val fp = TextAnalysis.fingerprint(col("text"))
        val docs = t(s, d, "documents").withColumn("f", fp)
        val hist = docs.where(col("doc_id") % 3 === 1)
        val m = 1 << 17
        // v1: bootstrap — history admitted wholesale, filter persisted once
        Incremental.saveBloomWords(s, root, 1,
          Sketches.bloomBuild(hist.select("f"), col("f"), m))
        // batch 1 gates against the LOADED v1 words (no rebuild)
        val w1 = Incremental.loadBloomWords(s, root, 1)
        val acc1 = Dedup.bloomGatedAntiJoinWith(w1,
            docs.where(col("doc_id") % 3 === 2), hist.select("f"), "f")
          .localCheckpoint() // read twice: its words and the verify union
        Incremental.saveBloomWords(s, root, 2, Sketches.bloomMerge(w1,
          Sketches.bloomBuild(acc1.select("f"), col("f"), m)))
        // batch 2 gates against the LOADED v2 words
        val w2 = Incremental.loadBloomWords(s, root, 2)
        val acc2 = Dedup.bloomGatedAntiJoinWith(w2,
          docs.where(col("doc_id") % 3 === 0),
          hist.select("f").unionByName(acc1.select("f")), "f")
        acc1.select(col("doc_id"), lit(1L).as("batch"))
          .unionByName(acc2.select(col("doc_id"), lit(2L).as("batch")))
          .orderBy("doc_id")
      },
      Some("""WITH fp AS (SELECT doc_id,
             |    md5(lower(trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g')))) AS f
             |  FROM documents),
             |k1 AS (SELECT doc_id, f FROM fp b WHERE doc_id % 3 = 2
             |       AND NOT EXISTS (SELECT 1 FROM fp h
             |                       WHERE h.doc_id % 3 = 1 AND h.f = b.f)),
             |k2 AS (SELECT doc_id FROM fp b WHERE doc_id % 3 = 0
             |       AND NOT EXISTS (SELECT 1 FROM fp h
             |                       WHERE h.doc_id % 3 = 1 AND h.f = b.f)
             |       AND NOT EXISTS (SELECT 1 FROM k1 WHERE k1.f = b.f))
             |SELECT doc_id, CAST(1 AS BIGINT) AS batch FROM k1
             |UNION ALL SELECT doc_id, CAST(2 AS BIGINT) AS batch FROM k2
             |ORDER BY doc_id""".stripMargin)),

    // ---- precision/recall/F1 threshold sweep on the held-out split —
    // the q178 calibration's companion that picks the deployment
    // threshold. Exact integer TP/FP/FN, one exact division per metric;
    // zero-denominator cells null, never a fake 0.
    Q("q183_pr_curve",
      (s, d) => {
        val docs = t(s, d, "documents")
        val heldOut = docs.where(col("doc_id") % 3 =!= 0).withColumn("y",
          (graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.9)
            .cast("long"))
        graft.operators.QualityClassifier.prCurve(heldOut, logregModel(docs),
            Seq(0.36, 0.37, 0.38, 0.39, 0.4))
          .orderBy("threshold")
      },
      Some(s"""WITH ${logregCtes(3)},
              |sc AS (SELECT doc_id, y,
              |    round(1.0/(1.0 + exp(-(w1*(x1/1000000.0) + w2*(x2/1000000.0) + w3*(x3/1000000.0)
              |      + w4*(x4/1000000.0) + w5*(x5/1000000.0)))) * 1000000.0)/1000000.0 AS score
              |  FROM fx CROSS JOIN wfin WHERE doc_id % 3 <> 0),
              |sw AS (SELECT y, score, unnest([0.36, 0.37, 0.38, 0.39, 0.4]) AS threshold FROM sc),
              |ag AS (SELECT threshold,
              |    CAST(sum(CASE WHEN score >= threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
              |    CAST(sum(CASE WHEN score >= threshold AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
              |    CAST(sum(CASE WHEN score < threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
              |  FROM sw GROUP BY threshold)
              |SELECT threshold, tp, fp, fn,
              |  CASE WHEN tp + fp > 0 THEN round(tp::DOUBLE / (tp + fp) * 1000000.0) / 1000000.0 END AS precision,
              |  CASE WHEN tp + fn > 0 THEN round(tp::DOUBLE / (tp + fn) * 1000000.0) / 1000000.0 END AS recall,
              |  CASE WHEN 2*tp + fp + fn > 0 THEN round(2.0*tp / (2*tp + fp + fn) * 1000000.0) / 1000000.0 END AS f1
              |FROM ag ORDER BY threshold""".stripMargin)),

    // ---- trained-lang-ID confusion matrix vs the corpus's ground-truth
    // lang column — the evaluation row that says WHERE the q153
    // classifier errs, not just that it scores.
    Q("q184_langid_confusion",
      (s, d) => {
        val docs = t(s, d, "documents")
        val pred = graft.operators.TrainingPrep.trainedLangId(
          docs, docs.where(col("doc_id") % 10 === 0), n = 3, vocabSize = 500)
        docs.select(col("doc_id"), col("lang"))
          .join(pred.select(col("doc_id"), col("lang_pred")), Seq("doc_id"))
          .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
          .orderBy("lang", "lang_pred")
      },
      Some("""WITH lt AS MATERIALIZED (
             |  SELECT lang, unnest([substr(text, i, 3) for i in range(1, greatest(len(text)-1, 1))]) AS g
             |  FROM documents WHERE doc_id % 10 = 0),
             |counts AS MATERIALIZED (SELECT lang, g, count(*) AS cnt FROM lt GROUP BY 1, 2),
             |vocab AS MATERIALIZED (SELECT g FROM (
             |  SELECT g, sum(cnt) AS tot FROM counts GROUP BY g ORDER BY tot DESC, g LIMIT 500)),
             |cv AS MATERIALIZED (SELECT lang, g, cnt FROM counts JOIN vocab USING (g)),
             |pl AS (SELECT lang, sum(cnt) AS tot_l FROM cv GROUP BY lang),
             |vc AS (SELECT count(*) AS v FROM vocab),
             |occ AS MATERIALIZED (
             |  SELECT doc_id, g FROM (
             |    SELECT doc_id, unnest([substr(text, i, 3) for i in range(1, greatest(len(text)-1, 1))]) AS g
             |    FROM documents) JOIN vocab USING (g)),
             |m AS (SELECT doc_id, count(*) AS m FROM occ GROUP BY doc_id),
             |a AS (SELECT doc_id, lang, sum(ln(cnt + 1)) AS a FROM occ JOIN cv USING (g) GROUP BY 1, 2),
             |langs AS (SELECT DISTINCT lang FROM cv),
             |sc AS (SELECT m.doc_id, l.lang,
             |       round(coalesce(a.a, 0) - m.m * ln(tot_l + v), 4) AS score
             |       FROM m CROSS JOIN langs l
             |       LEFT JOIN a ON a.doc_id = m.doc_id AND a.lang = l.lang
             |       JOIN pl ON pl.lang = l.lang CROSS JOIN vc),
             |pred AS (SELECT doc_id, lang AS lang_pred
             |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn FROM sc)
             |  WHERE rn = 1)
             |SELECT d.lang, p.lang_pred, count(*) AS n
             |FROM documents d JOIN pred p USING (doc_id)
             |GROUP BY d.lang, p.lang_pred ORDER BY d.lang, p.lang_pred""".stripMargin)),

    // ---- entity resolution end-to-end: the q171 Jaro-Winkler blocked
    // pairs closed into entity clusters by the pointer-jumping connected
    // components (q71 machinery) — record linkage's last mile.
    Q("q185_entity_clusters",
      (s, d) => {
        val names = t(s, d, "part").groupBy("p_name")
          .agg(min("p_partkey").as("id"))
          .select(col("id"), col("p_name").as("name"),
            split(col("p_name"), " ").getItem(0).as("blk"))
        val a = names.select(col("id").as("id_a"), col("name").as("na"), col("blk"))
        val b = names.select(col("id").as("id_b"), col("name").as("nb"), col("blk"))
        val pairs = a.join(b, Seq("blk")).where(col("id_a") < col("id_b"))
          .where(graft.expressions.JaroWinkler
            .jaro_winkler(col("na"), col("nb")) >= 0.87)
          .select("id_a", "id_b")
        graft.operators.Dedup.duplicateClusters(pairs)
          .select(col("doc_id").as("id"), col("cluster").as("entity"))
          .orderBy("id")
      },
      Some("""WITH RECURSIVE names AS (SELECT min(p_partkey) AS id, p_name AS name FROM part GROUP BY p_name),
             |n AS (SELECT id, name, string_split(name, ' ')[1] AS blk FROM names),
             |pairs AS (SELECT a.id AS ia, b.id AS ib
             |  FROM n a JOIN n b ON a.blk = b.blk AND a.id < b.id
             |  AND jaro_winkler_similarity(a.name, b.name) >= 0.87),
             |edges AS (SELECT ia AS u, ib AS v FROM pairs
             |          UNION SELECT ib, ia FROM pairs),
             |reach AS (SELECT u AS src, u AS dst FROM edges
             |          UNION
             |          SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
             |SELECT src AS id, min(dst) AS entity
             |FROM reach GROUP BY src ORDER BY id""".stripMargin)),

    // ---- exact ROC AUC (Mann-Whitney midrank identity) of the trained
    // classifier on the held-out split — every term an integer or exact
    // half, no trapezoid sweep, no floating accumulation.
    Q("q186_roc_auc",
      (s, d) => {
        val docs = t(s, d, "documents")
        val heldOut = docs.where(col("doc_id") % 3 =!= 0).withColumn("y",
          (graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.9)
            .cast("long"))
        val scored = graft.operators.QualityClassifier
          .score(heldOut.select(col("doc_id"), col("text")), logregModel(docs))
          .join(heldOut.select(col("doc_id"), col("y")), Seq("doc_id"))
        graft.operators.Profiling.rocAuc(scored)
      },
      Some(s"""WITH ${logregCtes(3)},
              |sc AS (SELECT doc_id, y,
              |    round(1.0/(1.0 + exp(-(w1*(x1/1000000.0) + w2*(x2/1000000.0) + w3*(x3/1000000.0)
              |      + w4*(x4/1000000.0) + w5*(x5/1000000.0)))) * 1000000.0)/1000000.0 AS score
              |  FROM fx CROSS JOIN wfin WHERE doc_id % 3 <> 0),
              |g AS (SELECT score, count(*) AS c, sum(y) AS cp FROM sc GROUP BY score),
              |r AS (SELECT *, sum(c) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM g),
              |ag AS (SELECT sum(cp * ((run - c) + (c + 1.0)/2.0)) AS spos,
              |         sum(cp) AS np, sum(c) - sum(cp) AS nn FROM r)
              |SELECT CAST(np AS BIGINT) AS np, CAST(nn AS BIGINT) AS nn,
              |  round((spos - np * (np + 1.0)/2.0) / (np::DOUBLE * nn::DOUBLE) * 1000000.0) / 1000000.0 AS auc
              |FROM ag""".stripMargin)),

    // ---- two-proportion conversion z-test (user_id parity as the
    // variant split): exact distinct counts, one fixed IEEE chain (one
    // sqrt) for the z statistic.
    Q("q188_ab_conversion_z",
      (s, d) => graft.operators.EventOps.abZScore(
        graft.operators.EventOps.abConversion(
          Tables.events(s, d), pmod(col("user_id"), lit(2L)),
          col("event_type") === "purchase" && col("value") > 80.0)),
      Some("""WITH e AS (SELECT user_id % 2 AS variant, user_id,
             |      (event_type = 'purchase' AND value > 80.0) AS cv FROM events),
             |x AS (SELECT variant, count(DISTINCT user_id) AS n FROM e GROUP BY variant),
             |c AS (SELECT variant, count(DISTINCT user_id) AS k FROM e
             |      WHERE cv GROUP BY variant),
             |t AS (SELECT x.variant, n, coalesce(k, 0) AS k FROM x LEFT JOIN c USING (variant)),
             |two AS (SELECT
             |    max(CASE WHEN variant = 0 THEN k END) AS k0,
             |    max(CASE WHEN variant = 0 THEN n END) AS n0,
             |    max(CASE WHEN variant = 1 THEN k END) AS k1,
             |    max(CASE WHEN variant = 1 THEN n END) AS n1 FROM t)
             |SELECT CAST(k0 AS BIGINT) AS k0, CAST(n0 AS BIGINT) AS n0,
             |  CAST(k1 AS BIGINT) AS k1, CAST(n1 AS BIGINT) AS n1,
             |  round((k0::DOUBLE/n0 - k1::DOUBLE/n1)
             |    / sqrt(((k0+k1)::DOUBLE/(n0+n1)) * (1.0 - (k0+k1)::DOUBLE/(n0+n1))
             |           * (1.0/n0 + 1.0/n1)) * 10000.0) / 10000.0 AS z
             |FROM two""".stripMargin)),

    // ---- per-batch n-gram NOVELTY vs the accepted history: the share
    // of a batch's distinct word-3-grams never seen before — the ingest
    // drift alarm (a template-flooded crawl drop scores near 0; a new
    // domain scores high). Distinct gram relations are vocab-sized; the
    // unseen cut is one anti-join per batch, no hint (web-scale vocab).
    // Grams are the CODEGEN'D 64-bit ShingleHashes kernel (an
    // interpreted HOF gram builder measured 37 s at sf1; this is
    // scan-speed) — counts vs the oracle's textual grams under the
    // q61/q139 injective-in-practice contract.
    Q("q187_batch_novelty",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), explode(graft.expressions.ShingleHashes
            .shingle_hashes(col("text"), 3)).as("g"))
        val hist = docs.where(col("doc_id") % 3 === 1).select("g").distinct()
        val batches = docs.where(col("doc_id") % 3 =!= 1)
          .select((col("doc_id") % 3).as("batch"), col("g")).distinct()
        val novel = batches.join(hist, Seq("g"), "left_anti")
          .groupBy("batch").agg(count(lit(1)).as("n_novel"))
        batches.groupBy("batch").agg(count(lit(1)).as("n_grams"))
          .join(novel, Seq("batch"), "left")
          .select(col("batch"), col("n_grams"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"),
            (round(coalesce(col("n_novel"), lit(0L)).cast("double") /
              col("n_grams").cast("double") * 1000000.0) / 1000000.0)
              .as("novelty"))
          .orderBy("batch")
      },
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS g
             |       FROM ws WHERE len(w) >= 3),
             |hist AS (SELECT DISTINCT g FROM sh WHERE doc_id % 3 = 1),
             |b AS (SELECT DISTINCT doc_id % 3 AS batch, g FROM sh WHERE doc_id % 3 <> 1),
             |tot AS (SELECT batch, count(*) AS n_grams FROM b GROUP BY batch),
             |nov AS (SELECT batch, count(*) AS n_novel FROM b
             |        WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.g = b.g)
             |        GROUP BY batch)
             |SELECT t.batch, t.n_grams, coalesce(n.n_novel, 0) AS n_novel,
             |  round(coalesce(n.n_novel, 0)::DOUBLE / t.n_grams::DOUBLE * 1000000.0) / 1000000.0 AS novelty
             |FROM tot t LEFT JOIN nov n USING (batch) ORDER BY t.batch""".stripMargin)),

    // ---- first-order Markov transition matrix over each user's event
    // sequence: one lag window on the per-user partitioning, exact
    // count ratios at the |types|^2-sized output.
    Q("q189_event_transitions",
      (s, d) => graft.operators.EventOps
        .transitionMatrix(Tables.events(s, d))
        .orderBy("from_type", "to_type"),
      Some("""WITH p AS (SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
             |         event_type AS to_type FROM events),
             |n AS (SELECT from_type, to_type, count(*) AS n FROM p
             |      WHERE from_type IS NOT NULL GROUP BY 1, 2),
             |tt AS (SELECT from_type, sum(n) AS tot FROM n GROUP BY from_type)
             |SELECT n.from_type, n.to_type, n.n,
             |  round(n.n::DOUBLE / tt.tot::DOUBLE * 1000000.0) / 1000000.0 AS p
             |FROM n JOIN tt USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // ---- RFM quartile segmentation: per-user recency/frequency/
    // monetary quartiles with the boundaries nearest-rank-selected once
    // and broadcast back, so the labeling pass is a scan-speed
    // comparison (never a global re-rank of the user dimension).
    // Monetary sums rounded 1e-6 before any comparison so accumulation
    // order can't flip a boundary tie cross-engine.
    Q("q190_rfm_segments",
      (s, d) => graft.operators.EventOps.rfmSegments(Tables.events(s, d))
        .orderBy("user_id"),
      Some("""WITH pu AS (SELECT user_id, max(epoch_ns(ts)) AS r, count(*) AS f,
             |    round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) * 1000000.0) / 1000000.0 AS m
             |  FROM events GROUP BY user_id),
             |nb AS (SELECT count(*) AS n FROM pu),
             |rb AS (SELECT max(CASE WHEN rn = CAST(ceil(0.25*n) AS BIGINT) THEN r END) AS r25,
             |         max(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT) THEN r END) AS r50,
             |         max(CASE WHEN rn = CAST(ceil(0.75*n) AS BIGINT) THEN r END) AS r75
             |       FROM (SELECT r, row_number() OVER (ORDER BY r) AS rn, n FROM pu, nb)),
             |fb AS (SELECT max(CASE WHEN rn = CAST(ceil(0.25*n) AS BIGINT) THEN f END) AS f25,
             |         max(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT) THEN f END) AS f50,
             |         max(CASE WHEN rn = CAST(ceil(0.75*n) AS BIGINT) THEN f END) AS f75
             |       FROM (SELECT f, row_number() OVER (ORDER BY f) AS rn, n FROM pu, nb)),
             |mb AS (SELECT max(CASE WHEN rn = CAST(ceil(0.25*n) AS BIGINT) THEN m END) AS m25,
             |         max(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT) THEN m END) AS m50,
             |         max(CASE WHEN rn = CAST(ceil(0.75*n) AS BIGINT) THEN m END) AS m75
             |       FROM (SELECT m, row_number() OVER (ORDER BY m) AS rn, n FROM pu, nb))
             |SELECT user_id, CAST(f AS BIGINT) AS f, m,
             |  CAST(CASE WHEN r <= r25 THEN 1 WHEN r <= r50 THEN 2 WHEN r <= r75 THEN 3 ELSE 4 END AS BIGINT) AS rq,
             |  CAST(CASE WHEN f <= f25 THEN 1 WHEN f <= f50 THEN 2 WHEN f <= f75 THEN 3 ELSE 4 END AS BIGINT) AS fq,
             |  CAST(CASE WHEN m <= m25 THEN 1 WHEN m <= m50 THEN 2 WHEN m <= m75 THEN 3 ELSE 4 END AS BIGINT) AS mq
             |FROM pu, rb, fb, mb ORDER BY user_id""".stripMargin)),

    // ---- session-level fact table (gap sessionization aggregated to
    // one row per session): the intermediate every session-scoped
    // analysis joins against. Times presented at µs (q117 convention).
    Q("q191_session_stats",
      (s, d) => graft.operators.EventOps.sessionStats(
          Tables.events(s, d), gapNs = 1800L * Tables.NanosPerSecond)
        .select(col("user_id"), col("sess_id"),
          expr("start_ns div 1000").as("start_us"),
          expr("end_ns div 1000").as("end_us"),
          col("n_events"), col("converted"))
        .orderBy("user_id", "sess_id"),
      Some("""WITH g AS (
             |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns,
             |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
             |           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT user_id, event_type, tns,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
             |  FROM g)
             |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
             |  CAST(min(tns) // 1000 AS BIGINT) AS start_us,
             |  CAST(max(tns) // 1000 AS BIGINT) AS end_us,
             |  count(*) AS n_events,
             |  (sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0) AS converted
             |FROM s GROUP BY user_id, sess_id
             |ORDER BY user_id, sess_id""".stripMargin)),

    // ---- time-to-convert bands: nearest-rank P50/P90/P99 of the
    // view->purchase completion time over q117's funnel — the q180
    // selection machinery composed onto the funnel output (band values
    // are corpus durations, exact cross-engine).
    Q("q192_time_to_convert",
      (s, d) => {
        val f = graft.operators.EventOps
          .funnelStages(Tables.events(s, d), Seq("view", "click", "purchase"),
            windowNs = 2L * 86400 * 1000000000L)
          .where(col("t2").isNotNull)
          .select(lit(1).as("g"), expr("(t2 - t0) div 1000").as("dt_us"))
        graft.operators.Profiling
          .rankPercentiles(f, "g", "dt_us", Seq(0.5, 0.9, 0.99))
          .select(col("n"), col("p50"), col("p90"), col("p99"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_type FROM events),
             |v AS (SELECT user_id, min(tns) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(tns) AS t_click FROM e JOIN v USING (user_id)
             |      WHERE event_type = 'click' AND tns >= t_view AND tns <= t_view + 172800000000000
             |      GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(tns) AS t_purchase FROM e JOIN c USING (user_id)
             |      WHERE event_type = 'purchase' AND tns >= t_click AND tns <= t_click + 172800000000000
             |      GROUP BY e.user_id),
             |dts AS (SELECT (p.t_purchase - v.t_view) // 1000 AS dt FROM p JOIN v USING (user_id)),
             |r AS (SELECT dt, row_number() OVER (ORDER BY dt) AS rn,
             |        count(*) OVER () AS n FROM dts)
             |SELECT CAST(max(n) AS BIGINT) AS n,
             |  CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN dt END) AS BIGINT) AS p50,
             |  CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN dt END) AS BIGINT) AS p90,
             |  CAST(max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN dt END) AS BIGINT) AS p99
             |FROM r""".stripMargin)),

    // ---- top-10 session paths (flow mining): order-stable struct-sort
    // path fold (no order-sensitive string agg), session-bounded
    // collect, TakeOrderedAndProject cut.
    Q("q193_session_paths",
      (s, d) => graft.operators.EventOps.topSessionPaths(
          Tables.events(s, d), gapNs = 1800L * Tables.NanosPerSecond, k = 10)
        .withColumn("n", col("n").cast("long")),
      Some("""WITH g AS (
             |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns,
             |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
             |           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT user_id, event_type, tns, event_id,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
             |  FROM g),
             |paths AS (SELECT user_id, sess_id,
             |    string_agg(event_type, '>' ORDER BY tns, event_id) AS path
             |  FROM s GROUP BY user_id, sess_id)
             |SELECT path, count(*) AS n FROM paths
             |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin)),

    // ---- per-label centroid cosine matrix: cluster-separation /
    // source-drift readout over the embedded corpus. Exact quantized
    // dimension sums (q160 convention), label-sized pairwise fold.
    Q("q194_centroid_cosines",
      (s, d) => graft.operators.Similarity
        .labelCentroidCosines(t(s, d, "embeddings"))
        .orderBy("la", "lb"),
      Some("""WITH e AS (SELECT label AS lbl,
             |    unnest([round(x * 10000.0)::BIGINT for x in embedding::DOUBLE[]]) AS v,
             |    unnest(range(0, len(embedding))) AS i
             |  FROM embeddings),
             |sums AS (SELECT lbl, i, sum(v) AS s, count(*) AS c FROM e GROUP BY lbl, i),
             |cent AS (SELECT lbl, i, s::DOUBLE / (10000.0 * c::DOUBLE) AS v FROM sums),
             |p AS (SELECT a.lbl AS la, b.lbl AS lb,
             |        sum(a.v * b.v) AS dot, sum(a.v * a.v) AS na, sum(b.v * b.v) AS nb
             |      FROM cent a JOIN cent b ON a.i = b.i AND a.lbl < b.lbl
             |      GROUP BY a.lbl, b.lbl)
             |SELECT la, lb, round(dot / (sqrt(na) * sqrt(nb)) * 1000000.0) / 1000000.0 AS cos
             |FROM p ORDER BY la, lb""".stripMargin)),

    // ---- Pearson correlation matrix from the SAME exact moment sums
    // as the q160 covariance (no extra corpus work): the feature-
    // redundancy readout ahead of PCA/PQ dimension decisions.
    Q("q195_correlation_matrix",
      (s, d) => graft.operators.Pca.correlation(t(s, d, "embeddings"), 64)
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("corr"))
        .orderBy("i", "j"),
      Some(s"""WITH ${pcaCtes(64, 0, 0)},
              |dg AS (SELECT i, c FROM cov WHERE i = j)
              |SELECT CAST(c.i AS BIGINT) AS i, CAST(c.j AS BIGINT) AS j,
              |  round(c.c / (sqrt(di.c) * sqrt(dj.c)) * 1000000.0) / 1000000.0 AS corr
              |FROM cov c JOIN dg di ON di.i = c.i JOIN dg dj ON dj.i = c.j
              |ORDER BY i, j""".stripMargin)),

    // ---- BFS hop distances from NATION_0 over the thresholded trade
    // graph (q170's edge rule): fixed 6-round horizon >= diameter. The
    // oracle's recursive CTE uses UNION (distinct) so its state is
    // (node, d) pairs, never path enumerations.
    Q("q196_bfs_hops",
      (s, d) => {
        val nation = t(s, d, "nation")
        val raw = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation.select(col("n_nationkey").as("ck"),
            col("n_name").as("src"))), col("c_nationkey") === col("ck"))
          .join(broadcast(nation.select(col("n_nationkey").as("sk"),
            col("n_name").as("dst"))), col("s_nationkey") === col("sk"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        val avgW = raw.agg(avg(col("w")).as("aw"))
        val edges = raw.join(broadcast(avgW))
          .where(col("w").cast("double") > col("aw"))
          .select("src", "dst")
        graft.operators.GraphOps.bfsHops(edges, "NATION_0", rounds = 6)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE raw AS (SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation cn ON c_nationkey = cn.n_nationkey
             |  JOIN nation sn ON s_nationkey = sn.n_nationkey
             |  GROUP BY 1, 2),
             |aw AS (SELECT avg(w) AS aw FROM raw),
             |ed AS (SELECT src, dst FROM raw, aw WHERE w > aw AND src <> dst),
             |sym AS (SELECT DISTINCT src, dst FROM (
             |    SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed)),
             |walk AS (SELECT 'NATION_0' AS node, 0 AS d
             |         UNION
             |         SELECT s.dst, w.d + 1 FROM walk w JOIN sym s ON s.src = w.node
             |         WHERE w.d < 6)
             |SELECT node, CAST(min(d) AS BIGINT) AS d
             |FROM walk GROUP BY node ORDER BY node""".stripMargin)),

    // ---- local clustering coefficient (triangles / wedge capacity)
    // per node on the same thresholded trade graph — community density
    // next to q127's raw triangle counts. One exact integer ratio.
    Q("q197_clustering_coeff",
      (s, d) => {
        val nation = t(s, d, "nation")
        val raw = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation.select(col("n_nationkey").as("ck"),
            col("n_name").as("src"))), col("c_nationkey") === col("ck"))
          .join(broadcast(nation.select(col("n_nationkey").as("sk"),
            col("n_name").as("dst"))), col("s_nationkey") === col("sk"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        val avgW = raw.agg(avg(col("w")).as("aw"))
        val edges = raw.join(broadcast(avgW))
          .where(col("w").cast("double") > col("aw"))
          .select("src", "dst")
        graft.operators.GraphOps.clusteringCoefficients(edges)
          .orderBy("node")
      },
      Some("""WITH raw AS (SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation cn ON c_nationkey = cn.n_nationkey
             |  JOIN nation sn ON s_nationkey = sn.n_nationkey
             |  GROUP BY 1, 2),
             |aw AS (SELECT avg(w) AS aw FROM raw),
             |th AS (SELECT src, dst FROM raw, aw WHERE w > aw),
             |ed AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |       FROM th WHERE src <> dst),
             |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |        FROM ed e1 JOIN ed e2 ON e2.a = e1.b
             |        JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
             |tcnt AS (SELECT node, count(*) AS triangles FROM (
             |  SELECT x AS node FROM tri UNION ALL
             |  SELECT y FROM tri UNION ALL
             |  SELECT z FROM tri) GROUP BY node),
             |deg AS (SELECT node, count(*) AS deg FROM (
             |  SELECT a AS node FROM ed UNION ALL SELECT b FROM ed) GROUP BY node)
             |SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
             |  CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
             |  CASE WHEN d.deg >= 2
             |    THEN round(coalesce(t.triangles, 0)::DOUBLE * 2.0
             |         / (d.deg * (d.deg - 1))::DOUBLE * 1000000.0) / 1000000.0
             |    ELSE 0.0 END AS coeff
             |FROM deg d LEFT JOIN tcnt t USING (node) ORDER BY d.node""".stripMargin)),

    // ---- per-source OLS: chars-per-token linearity by source (slope =
    // effective mean token length + separator overhead; a source whose
    // fit degrades is mixing content shapes). One sufficient-sums
    // aggregation per source; fit composed at the group-sized output.
    Q("q198_grouped_ols",
      (s, d) => graft.operators.TrainingPrep.groupedOls(
          t(s, d, "documents"), "source",
          expr("size(split(text, ' '))"), col("n_chars"))
        .orderBy("source"),
      Some("""WITH b AS (SELECT source,
             |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS x,
             |    CAST(n_chars AS DOUBLE) AS y FROM documents),
             |a AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
             |        sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
             |        sum(y*y) AS syy, sum(x*y) AS sxy
             |      FROM b GROUP BY source)
             |SELECT source, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0
             |    THEN round((n*sxy - sx*sy) / (n*sxx - sx*sx) * 10000.0) / 10000.0 END AS slope,
             |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0
             |    THEN round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n * 10000.0) / 10000.0 END AS intercept,
             |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
             |    THEN round((n*sxy - sx*sy) * (n*sxy - sx*sy)
             |         / ((n*sxx - sx*sx) * (n*syy - sy*sy)) * 10000.0) / 10000.0 END AS r2
             |FROM a ORDER BY source""".stripMargin)),

    // ---- week-over-week growth per event type: weekly counts + the
    // lag-window growth rate — the trend series every ops review reads.
    Q("q199_wow_growth",
      (s, d) => {
        val wk = (expr(s"ts div ${604800L * Tables.NanosPerSecond}")
          * 604800L).as("week_start")
        val counts = Tables.events(s, d)
          .groupBy(col("event_type"), wk)
          .agg(count(lit(1)).as("n"))
        val byType = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("week_start")
        counts
          .withColumn("prev", lag(col("n"), 1).over(byType))
          .select(col("event_type"), col("week_start"), col("n"),
            (round((col("n") - col("prev")).cast("double") /
              col("prev").cast("double") * 1000000.0) / 1000000.0)
              .as("growth"))
          .orderBy("event_type", "week_start")
      },
      Some("""WITH c AS (SELECT event_type,
             |    CAST(floor(epoch(ts) / 604800) * 604800 AS BIGINT) AS week_start,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, week_start, n,
             |  round((n - lag(n) OVER w)::DOUBLE / (lag(n) OVER w)::DOUBLE * 1000000.0) / 1000000.0 AS growth
             |FROM c WINDOW w AS (PARTITION BY event_type ORDER BY week_start)
             |ORDER BY event_type, week_start""".stripMargin)),

    // ---- χ² token–label feature selection: which vocabulary is most
    // associated with the English-language label — the pre-classifier
    // step that picks the features worth training on. Exact integer
    // contingency cells; the cross term in decimal(38,0).
    Q("q200_chi2_tokens",
      (s, d) => graft.operators.TrainingPrep.chiSquaredTokens(
        t(s, d, "documents"), col("lang") === "en", topK = 30),
      Some("""WITH lab AS (SELECT doc_id,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, text FROM documents),
             |pr AS (SELECT DISTINCT doc_id, y, tok FROM (
             |    SELECT doc_id, y, unnest(string_split(text, ' ')) AS tok FROM lab)
             |  WHERE len(tok) > 0),
             |tk AS (SELECT tok, sum(y) AS a, sum(1 - y) AS b FROM pr GROUP BY tok),
             |tt AS (SELECT sum(y) AS n1, sum(1 - y) AS n0 FROM lab),
             |x AS (SELECT tok, a, b, n1 - a AS c, n0 - b AS d, n1, n0
             |      FROM tk, tt WHERE a + b < n1 + n0)
             |SELECT tok AS token, CAST(a AS BIGINT) AS df_pos,
             |  CAST(b AS BIGINT) AS df_neg,
             |  round(CAST(n1 + n0 AS DOUBLE)
             |    * CAST(a*d - b*c AS DOUBLE) * CAST(a*d - b*c AS DOUBLE)
             |    / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
             |       * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
             |    * 10000.0) / 10000.0 AS chi2
             |FROM x ORDER BY chi2 DESC, token LIMIT 30""".stripMargin),
      bench = true),

    // ---- exact two-sample KS drift on document length: did the
    // English slice's length distribution move vs the rest? Argmax on
    // the exact integer ECDF numerator — no float-ordering hazard.
    Q("q201_ks_drift",
      (s, d) => graft.operators.Profiling.ksDrift(
        t(s, d, "documents"), "n_chars", col("lang") === "en"),
      Some("""WITH g AS (SELECT CAST(n_chars AS BIGINT) AS v,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g FROM documents),
             |bv AS (SELECT v, sum(g) AS c1, sum(1 - g) AS c2 FROM g GROUP BY v),
             |tt AS (SELECT sum(g) AS n1, sum(1 - g) AS n2 FROM g),
             |cm AS (SELECT v, c1, c2,
             |    sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             |    sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
             |  FROM bv),
             |x AS (SELECT v, abs(cum1*n2 - cum2*n1) AS num, n1, n2 FROM cm, tt)
             |SELECT v AS at_value, CAST(n1 AS BIGINT) AS n1,
             |  CAST(n2 AS BIGINT) AS n2,
             |  round(CAST(num AS DOUBLE) / CAST(n1*n2 AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS d_stat
             |FROM x ORDER BY num DESC, v LIMIT 1""".stripMargin)),

    // ---- PMI contingency: which (event_type, payload-quartile) cells
    // carry the dependence between the two columns — the per-cell
    // decomposition whose sum is the mutual information.
    Q("q202_event_pmi",
      (s, d) => graft.operators.EventOps.pmiContingency(
        Tables.events(s, d), col("event_type"),
        expr("CAST(get_json_object(props, '$.k') AS LONG) div 25")),
      Some("""WITH b AS (SELECT event_type AS x,
             |    CAST(props->>'k' AS BIGINT) // 25 AS y FROM events),
             |c AS (SELECT x, y, count(*) AS nxy FROM b GROUP BY 1, 2),
             |mx AS (SELECT x, count(*) AS nx FROM b GROUP BY 1),
             |my AS (SELECT y, count(*) AS ny FROM b GROUP BY 1),
             |t AS (SELECT count(*) AS n FROM b)
             |SELECT x, y, CAST(nxy AS BIGINT) AS nxy, CAST(nx AS BIGINT) AS nx,
             |  CAST(ny AS BIGINT) AS ny,
             |  round(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
             |    * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
             |         / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS mi_term
             |FROM c JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t
             |ORDER BY x, y""".stripMargin)),

    // ---- autocorrelation of the dense daily event-count series at
    // lags 1..7 — weekly-cycle / burstiness health per ingest review.
    // Exact integer sufficient sums in decimal(38,0) / HUGEINT.
    Q("q203_daily_acf",
      (s, d) => graft.operators.EventOps.dailyAcf(Tables.events(s, d), 7),
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |d AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |l AS (SELECT lg.lag, a.c AS ca, bb.c AS cb
             |  FROM d a CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lag) lg
             |  JOIN d bb ON bb.day = a.day + lg.lag),
             |g AS (SELECT lag, CAST(count(*) AS HUGEINT) AS n,
             |    sum(CAST(ca AS HUGEINT)) AS sx, sum(CAST(cb AS HUGEINT)) AS sy,
             |    sum(CAST(ca AS HUGEINT) * CAST(ca AS HUGEINT)) AS sxx,
             |    sum(CAST(cb AS HUGEINT) * CAST(cb AS HUGEINT)) AS syy,
             |    sum(CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT)) AS sxy
             |  FROM l GROUP BY lag)
             |SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
             |  CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) > 0
             |        AND CAST(n*syy - sy*sy AS DOUBLE) > 0
             |    THEN round(CAST(n*sxy - sx*sy AS DOUBLE)
             |      / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
             |             * CAST(n*syy - sy*sy AS DOUBLE)) * 1000000.0)
             |      / 1000000.0 END AS acf
             |FROM g ORDER BY lag""".stripMargin)),

    // ---- best Gini decision stump per quality feature: the CART root
    // node on the q158 feature/label table — coarse histogram splits
    // (the distributed-tree-trainer trick), exact integer cells, IEEE-
    // exact gain algebra so the argmax is engine-independent.
    Q("q204_stump_train",
      (s, d) => graft.operators.QualityClassifier.stumpSplits(
        t(s, d, "documents").withColumn("y",
          (graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.9)
            .cast("long"))),
      Some(s"""WITH $featureCtes,
             |u AS (SELECT y, 1 AS idx, x2 AS xq FROM fx
             |      UNION ALL SELECT y, 2, x3 FROM fx
             |      UNION ALL SELECT y, 3, x4 FROM fx
             |      UNION ALL SELECT y, 4, x5 FROM fx),
             |cand AS (SELECT idx, xq // 10000 AS cb, sum(y) AS c1,
             |    sum(1 - y) AS c0 FROM u GROUP BY 1, 2),
             |tots AS (SELECT idx, sum(c1) AS p, sum(c0 + c1) AS n
             |         FROM cand GROUP BY idx),
             |cum AS (SELECT c.idx, cb,
             |    sum(c1) OVER w AS aL, sum(c0 + c1) OVER w AS nL, p, n
             |  FROM cand c JOIN tots USING (idx)
             |  WINDOW w AS (PARTITION BY c.idx ORDER BY cb
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |g AS (SELECT idx, cb, aL, nL, p, n,
             |    1.0 - (CAST(p AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(p AS DOUBLE)/CAST(n AS DOUBLE))
             |        - (CAST(n - p AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(n - p AS DOUBLE)/CAST(n AS DOUBLE))
             |      - CAST(nL AS DOUBLE)/CAST(n AS DOUBLE)
             |        * (1.0 - (CAST(aL AS DOUBLE)/CAST(nL AS DOUBLE))*(CAST(aL AS DOUBLE)/CAST(nL AS DOUBLE))
             |               - (CAST(nL - aL AS DOUBLE)/CAST(nL AS DOUBLE))*(CAST(nL - aL AS DOUBLE)/CAST(nL AS DOUBLE)))
             |      - CAST(n - nL AS DOUBLE)/CAST(n AS DOUBLE)
             |        * (1.0 - (CAST(p - aL AS DOUBLE)/CAST(n - nL AS DOUBLE))*(CAST(p - aL AS DOUBLE)/CAST(n - nL AS DOUBLE))
             |               - (CAST((n - nL) - (p - aL) AS DOUBLE)/CAST(n - nL AS DOUBLE))*(CAST((n - nL) - (p - aL) AS DOUBLE)/CAST(n - nL AS DOUBLE)))
             |      AS gain
             |  FROM cum WHERE nL < n),
             |r AS (SELECT *, row_number() OVER (
             |        PARTITION BY idx ORDER BY gain DESC, cb) AS rn FROM g)
             |SELECT CASE idx WHEN 1 THEN 'ln_tokens' WHEN 2 THEN 'punct_ratio'
             |         WHEN 3 THEN 'stop_ratio' ELSE 'mean_word_len' END AS feature,
             |  CAST((cb + 1) * 10000 AS BIGINT) AS threshold_q,
             |  CAST(nL AS BIGINT) AS n_left, CAST(aL AS BIGINT) AS pos_left,
             |  CAST(n - nL AS BIGINT) AS n_right,
             |  CAST(p - aL AS BIGINT) AS pos_right,
             |  round(gain * 1000000.0) / 1000000.0 AS gini_gain
             |FROM r WHERE rn = 1 ORDER BY feature""".stripMargin)),

    // ---- mergeable equi-width histogram quantiles over order values —
    // the one-pass, bins-long-state sketch vs q32's exact shuffle-rank.
    Q("q205_hist_quantile",
      (s, d) => graft.operators.Sketches.histogramQuantiles(
        t(s, d, "orders"), col("o_totalprice"), 16, Seq(0.5, 0.9, 0.99)),
      Some("""WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders),
             |mm AS (SELECT min(v) AS mn, max(v) AS mx, count(*) AS n FROM v),
             |bn AS (SELECT least(CAST(floor((v - mn) / ((mx - mn) / 16.0)) AS BIGINT),
             |         CAST(15 AS BIGINT)) AS bin FROM v, mm),
             |bc AS (SELECT bin, count(*) AS cnt FROM bn GROUP BY bin),
             |cm AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM bc),
             |pr AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
             |                      CAST(0.99 AS DOUBLE)]) AS p),
             |x AS (SELECT p, bin, cnt, cum, mn, mx, n,
             |        row_number() OVER (PARTITION BY p ORDER BY bin) AS rn
             |      FROM cm CROSS JOIN mm CROSS JOIN pr
             |      WHERE CAST(cum AS DOUBLE) >= p * CAST(n AS DOUBLE))
             |SELECT p, round((mn + (mx - mn) / 16.0 * CAST(bin AS DOUBLE)
             |    + (mx - mn) / 16.0
             |      * ((p * CAST(n AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
             |         / CAST(cnt AS DOUBLE))) * 1000000.0) / 1000000.0 AS quantile_est,
             |  bin, CAST(cnt AS BIGINT) AS bin_count
             |FROM x WHERE rn = 1 ORDER BY p""".stripMargin)),

    // ---- 2-D Pareto frontier over parts (maximize total quantity AND
    // line count): the sharded sort-sweep skyline; oracle is the direct
    // dominance definition.
    Q("q206_pareto_parts",
      (s, d) => {
        val agg = t(s, d, "lineitem").groupBy("l_partkey").agg(
          sum(col("l_quantity").cast("long")).as("x"),
          count(lit(1)).as("y"))
        graft.operators.Ranking
          .skyline2d(agg, col("l_partkey"), col("x"), col("y"))
          .select(col("id").as("part_key"), col("x").as("total_qty"),
            col("y").as("n_lines"))
      },
      Some("""WITH a AS (SELECT l_partkey AS id,
             |    sum(CAST(l_quantity AS BIGINT)) AS x, count(*) AS y
             |  FROM lineitem GROUP BY 1),
             |s AS (SELECT * FROM a p WHERE NOT EXISTS (
             |    SELECT 1 FROM a q
             |    WHERE q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR q.y > p.y))),
             |dd AS (SELECT id, x, y,
             |    row_number() OVER (PARTITION BY x, y ORDER BY id) AS rn FROM s)
             |SELECT id AS part_key, CAST(x AS BIGINT) AS total_qty,
             |  CAST(y AS BIGINT) AS n_lines
             |FROM dd WHERE rn = 1 ORDER BY x DESC, y DESC""".stripMargin)),

    // ---- Gini concentration of customer revenue within each nation —
    // the inequality scalar per market. Revenue quantized to cents so
    // every sum is exact; rank·value sums in decimal(38,0)/HUGEINT.
    Q("q207_gini_revenue",
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name", "c_custkey")
          .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0)).cast("long")).as("cents"))
        graft.operators.Ranking.giniConcentration(rev, "n_name", "cents")
      },
      Some("""WITH r AS (SELECT n_name, c_custkey,
             |    sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS v
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY 1, 2),
             |k AS (SELECT n_name, v,
             |    row_number() OVER (PARTITION BY n_name ORDER BY v) AS i FROM r),
             |g AS (SELECT n_name, count(*) AS n, sum(CAST(v AS HUGEINT)) AS sv,
             |    sum(CAST(i AS HUGEINT) * CAST(v AS HUGEINT)) AS siv
             |  FROM k GROUP BY 1)
             |SELECT n_name, CAST(n AS BIGINT) AS n, CAST(sv AS BIGINT) AS total,
             |  CASE WHEN sv <> 0
             |    THEN round(CAST(2*siv - (n + 1)*sv AS DOUBLE)
             |      / CAST(n*sv AS DOUBLE) * 1000000.0) / 1000000.0 END AS gini
             |FROM g ORDER BY n_name""".stripMargin),
      bench = true),

    // ---- Dunning LLR collocations: G² over the bigram contingency —
    // the mass-weighted collocation rank that PMI (q110) can't give.
    Q("q208_llr_collocations",
      (s, d) => graft.operators.TrainingPrep
        .llrCollocations(t(s, d, "documents"), topK = 30, minCount = 5L),
      Some(s"""WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
             |bg AS (SELECT unnest([{'w1': w[i], 'w2': w[i+1]}
             |         for i in range(1, len(w))], recursive := true)
             |       FROM d WHERE len(w) >= 2),
             |bgc AS (SELECT w1, w2, count(*) AS k11 FROM bg GROUP BY 1, 2),
             |lc AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
             |rc AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY 1),
             |tt AS (SELECT count(*) AS nn FROM bg)
             |SELECT w1, w2, CAST(k11 AS BIGINT) AS n_pair,
             |  round(2.0 * (${xlxSql("k11")} + ${xlxSql("c1 - k11")}
             |    + ${xlxSql("c2 - k11")} + ${xlxSql("nn - c1 - c2 + k11")}
             |    + ${xlxSql("nn")} - ${xlxSql("c1")} - ${xlxSql("nn - c1")}
             |    - ${xlxSql("c2")} - ${xlxSql("nn - c2")}) * 10000.0) / 10000.0 AS llr
             |FROM bgc JOIN lc USING (w1) JOIN rc USING (w2) CROSS JOIN tt
             |WHERE k11 >= 5 ORDER BY llr DESC, w1, w2 LIMIT 30""".stripMargin),
      bench = true),

    // ---- Benford first-digit screen on order totals: observed digit
    // fractions vs log10(1+1/d) — the fabricated-data smell test,
    // leading digits taken from exact integer cents.
    Q("q209_benford",
      (s, d) => graft.operators.Profiling
        .benford(t(s, d, "orders"), col("o_totalprice")),
      Some("""WITH c AS (SELECT CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT) AS cents
             |  FROM orders),
             |dg AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             |    count(*) AS n
             |  FROM c WHERE cents >= 1 GROUP BY 1),
             |tt AS (SELECT sum(n) AS nt FROM dg)
             |SELECT digit, CAST(n AS BIGINT) AS n,
             |  round(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS obs_frac,
             |  round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * 1000000.0)
             |    / 1000000.0 AS exp_frac,
             |  round((CAST(n AS DOUBLE) / CAST(nt AS DOUBLE)
             |    - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)) * 1000000.0)
             |    / 1000000.0 AS deviation
             |FROM dg CROSS JOIN tt ORDER BY digit""".stripMargin)),

    // ---- CUSUM changepoint on the dense daily count series: the day
    // where ingest volume shifted, argmaxed on exact cross-scaled
    // integers with before/after means for the report.
    Q("q210_cusum_changepoint",
      (s, d) => graft.operators.EventOps
        .cusumChangepoint(Tables.events(s, d)),
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |d AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |tt AS (SELECT CAST(sum(c) AS HUGEINT) AS s,
             |    CAST(count(*) AS HUGEINT) AS t_days FROM d),
             |cm AS (SELECT day, row_number() OVER (ORDER BY day) AS t,
             |    sum(c) OVER (ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d),
             |x AS (SELECT day, t, cum, s, t_days,
             |    abs(t_days * CAST(cum AS HUGEINT) - CAST(t AS HUGEINT) * s) AS stat
             |  FROM cm CROSS JOIN tt WHERE CAST(t AS HUGEINT) < t_days)
             |SELECT day AS split_day, CAST(t AS BIGINT) AS t,
             |  round(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS mean_before,
             |  round(CAST(s - CAST(cum AS HUGEINT) AS DOUBLE)
             |    / CAST(t_days - CAST(t AS HUGEINT) AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS mean_after,
             |  round(CAST(stat AS DOUBLE) / CAST(t_days AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS cusum
             |FROM x ORDER BY stat DESC, t LIMIT 1""".stripMargin)),

    // ---- session-basket lift between event types: which behaviors
    // co-occur within a 30-min-gap session beyond chance.
    Q("q211_session_lift",
      (s, d) => graft.operators.EventOps.sessionLift(
        Tables.events(s, d), gapNs = 1800L * Tables.NanosPerSecond),
      Some("""WITH g AS (
             |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns,
             |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
             |           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT user_id, event_type,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
             |  FROM g),
             |p AS (SELECT DISTINCT user_id, sess_id, event_type FROM s),
             |tt AS (SELECT count(*) AS ns FROM
             |  (SELECT DISTINCT user_id, sess_id FROM p)),
             |sg AS (SELECT event_type, count(*) AS n FROM p GROUP BY 1),
             |pr AS (SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_ab
             |  FROM p a JOIN p b ON a.user_id = b.user_id
             |    AND a.sess_id = b.sess_id AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT ta, tb, CAST(n_ab AS BIGINT) AS n_ab,
             |  CAST(sa.n AS BIGINT) AS na, CAST(sb.n AS BIGINT) AS nb,
             |  CAST(ns AS BIGINT) AS n_sessions,
             |  round(CAST(n_ab AS DOUBLE) * CAST(ns AS DOUBLE)
             |    / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)) * 1000000.0)
             |    / 1000000.0 AS lift
             |FROM pr JOIN sg sa ON sa.event_type = pr.ta
             |  JOIN sg sb ON sb.event_type = pr.tb CROSS JOIN tt
             |ORDER BY ta, tb""".stripMargin)),

    // ---- reciprocal-rank fusion of lexical (BM25 top-50) and dense
    // (exact-cosine top-50) retrieval — the scale-free hybrid-search
    // merge; doc_id and vec_id share the id space in this corpus.
    Q("q212_rrf_fusion",
      (s, d) => {
        val bm = graft.operators.TrainingPrep.bm25(t(s, d, "documents"),
          Seq("spark", "window", "vector"), topK = 50)
          .select(col("doc_id").as("id"), col("score"))
        val em = graft.operators.Similarity
          .bruteForceTopK(t(s, d, "embeddings"), 0L, 50)
          .select(col("vec_id").as("id"), col("cos").as("score"))
        graft.operators.Ranking.rrfFuse(Seq(bm, em), kRrf = 60, topK = 20)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |s AS (SELECT avg(len(w)) AS avgdl, CAST(count(*) AS DOUBLE) AS n FROM d),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
             |         any_value(dl) AS dl
             |       FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM d)
             |       WHERE term IN ('spark', 'window', 'vector')
             |       GROUP BY doc_id, term),
             |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
             |bm AS (SELECT doc_id AS id,
             |    round(sum(ln((n - df + 0.5) / (df + 0.5) + 1) * tf * 2.2 /
             |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
             |  FROM tf JOIN df USING (term), s
             |  GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50),
             |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
             |em AS (SELECT vec_id AS id,
             |    round(list_cosine_similarity(v, qv) * 1000000.0) / 1000000.0 AS score
             |  FROM e, q WHERE vec_id <> 0
             |  ORDER BY score DESC, vec_id LIMIT 50),
             |rb AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r FROM bm),
             |re AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r FROM em),
             |u AS (SELECT id, 1.0 / (60.0 + CAST(r AS DOUBLE)) AS contrib FROM rb
             |      UNION ALL
             |      SELECT id, 1.0 / (60.0 + CAST(r AS DOUBLE)) FROM re),
             |f AS (SELECT id, count(*) AS n_lists,
             |        round(sum(contrib) * 1000000.0) / 1000000.0 AS rrf
             |      FROM u GROUP BY id)
             |SELECT id, CAST(n_lists AS BIGINT) AS n_lists, rrf
             |FROM f ORDER BY rrf DESC, id LIMIT 20""".stripMargin)),

    // ---- 3-fold cross-validated logreg: train the q158 model on each
    // 2/3 slice, exact AUC (q186 machinery) on the held-out third —
    // the generalization check behind any trained quality gate. Oracle
    // unrolls THREE full GD chains via the suffixed logregRounds CTEs.
    Q("q213_logreg_cv",
      (s, d) => {
        val labeled = t(s, d, "documents").withColumn("y",
          (graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.9)
            .cast("long"))
        (0 until 3).map { f =>
          val w = graft.operators.QualityClassifier.train(
            labeled.where(col("doc_id") % 3 =!= f.toLong),
            iters = 3, lr = 0.25)
          val test = labeled.where(col("doc_id") % 3 === f.toLong)
          val scored = graft.operators.QualityClassifier
            .score(test.select(col("doc_id"), col("text")), w)
            .join(test.select(col("doc_id"), col("y")), Seq("doc_id"))
          graft.operators.Profiling.rocAuc(scored)
            .select(lit(f.toLong).as("fold"), col("np"), col("nn"),
              col("auc"))
        }.reduce(_ unionAll _).orderBy("fold")
      },
      Some {
        val folds = (0 until 3).map(f =>
          logregRounds(3, "0.25", s"doc_id % 3 <> $f", s"f$f"))
          .mkString(",\n")
        val aucs = (0 until 3).map { f =>
          s"""sc$f AS (SELECT doc_id, y,
             |    round(1.0/(1.0 + exp(-(w1*(x1/1000000.0) + w2*(x2/1000000.0) + w3*(x3/1000000.0)
             |      + w4*(x4/1000000.0) + w5*(x5/1000000.0)))) * 1000000.0)/1000000.0 AS score
             |  FROM fx CROSS JOIN wfinf$f WHERE doc_id % 3 = $f),
             |g$f AS (SELECT score, count(*) AS c, sum(y) AS cp FROM sc$f GROUP BY score),
             |r$f AS (SELECT *, sum(c) OVER (ORDER BY score
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM g$f),
             |ag$f AS (SELECT sum(cp * ((run - c) + (c + 1.0)/2.0)) AS spos,
             |    sum(cp) AS np, sum(c) - sum(cp) AS nn FROM r$f)""".stripMargin
        }.mkString(",\n")
        val rows = (0 until 3).map { f =>
          s"""SELECT CAST($f AS BIGINT) AS fold, CAST(np AS BIGINT) AS np,
             |  CAST(nn AS BIGINT) AS nn,
             |  round((spos - np * (np + 1.0)/2.0) / (np::DOUBLE * nn::DOUBLE)
             |    * 1000000.0) / 1000000.0 AS auc
             |FROM ag$f""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH $featureCtes,
           |$folds,
           |$aucs
           |SELECT * FROM (
           |$rows)
           |ORDER BY fold""".stripMargin
      },
      bench = true),

    // ---- degree assortativity of the nation trade graph (q197's
    // above-average-weight edges): do hub markets trade with hubs?
    // Exact decimal Pearson over the symmetrized endpoint degrees.
    Q("q214_degree_assortativity",
      (s, d) => {
        val nation = t(s, d, "nation")
        val raw = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation.select(col("n_nationkey").as("ck"),
            col("n_name").as("src"))), col("c_nationkey") === col("ck"))
          .join(broadcast(nation.select(col("n_nationkey").as("sk"),
            col("n_name").as("dst"))), col("s_nationkey") === col("sk"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        val avgW = raw.agg(avg(col("w")).as("aw"))
        val edges = raw.join(broadcast(avgW))
          .where(col("w").cast("double") > col("aw"))
          .select("src", "dst")
        graft.operators.GraphOps.degreeAssortativity(edges)
      },
      Some("""WITH raw AS (SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation cn ON c_nationkey = cn.n_nationkey
             |  JOIN nation sn ON s_nationkey = sn.n_nationkey
             |  GROUP BY 1, 2),
             |aw AS (SELECT avg(w) AS aw FROM raw),
             |th AS (SELECT src, dst FROM raw, aw WHERE w > aw),
             |ed AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |       FROM th WHERE src <> dst),
             |deg AS (SELECT node, count(*) AS deg FROM (
             |  SELECT a AS node FROM ed UNION ALL SELECT b FROM ed) GROUP BY node),
             |dir AS (SELECT a AS u, b AS v FROM ed
             |        UNION ALL SELECT b AS u, a AS v FROM ed),
             |pr AS (SELECT du.deg AS dx, dv.deg AS dy FROM dir
             |       JOIN deg du ON du.node = dir.u
             |       JOIN deg dv ON dv.node = dir.v),
             |g AS (SELECT CAST(count(*) AS HUGEINT) AS m,
             |    sum(CAST(dx AS HUGEINT)) AS sx, sum(CAST(dy AS HUGEINT)) AS sy,
             |    sum(CAST(dx AS HUGEINT) * CAST(dx AS HUGEINT)) AS sxx,
             |    sum(CAST(dy AS HUGEINT) * CAST(dy AS HUGEINT)) AS syy,
             |    sum(CAST(dx AS HUGEINT) * CAST(dy AS HUGEINT)) AS sxy
             |  FROM pr)
             |SELECT CAST(m AS BIGINT) AS n_directed_edges,
             |  CASE WHEN CAST(m*sxx - sx*sx AS DOUBLE) > 0
             |        AND CAST(m*syy - sy*sy AS DOUBLE) > 0
             |    THEN round(CAST(m*sxy - sx*sy AS DOUBLE)
             |      / sqrt(CAST(m*sxx - sx*sx AS DOUBLE)
             |             * CAST(m*syy - sy*sy AS DOUBLE)) * 1000000.0)
             |      / 1000000.0 END AS assortativity
             |FROM g""".stripMargin)),

    // ---- RAKE keyphrases: stopword-delimited candidate phrases scored
    // by summed word degree/frequency — zero-training keyphrase mining.
    Q("q215_rake_keyphrases",
      (s, d) => graft.operators.TrainingPrep.rakeKeyphrases(
        t(s, d, "documents"),
        Seq("the", "a", "of", "and", "to", "is"), topK = 20),
      Some("""WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
             |mk AS (SELECT [CASE WHEN x IN ('the','a','of','and','to','is')
             |         OR len(x) = 0 THEN chr(1) ELSE x END for x in w] AS m FROM d),
             |ph0 AS (SELECT unnest(string_split(array_to_string(m, ' '), chr(1))) AS p
             |        FROM mk),
             |ph AS (SELECT trim(p) AS phrase FROM ph0
             |       WHERE len(trim(p)) > 0
             |         AND len(string_split(trim(p), ' ')) <= 4),
             |wd AS (SELECT phrase, CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen,
             |         unnest(string_split(phrase, ' ')) AS w FROM ph),
             |st AS (SELECT w, count(*) AS freq, sum(plen) AS degree FROM wd GROUP BY w),
             |cand AS (SELECT phrase, count(*) AS n_occ FROM ph GROUP BY phrase),
             |pw AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM cand),
             |sc AS (SELECT phrase,
             |    round(sum(CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE)) * 10000.0)
             |      / 10000.0 AS score
             |  FROM pw JOIN st USING (w) GROUP BY phrase)
             |SELECT c.phrase, CAST(n_occ AS BIGINT) AS n_occ, score
             |FROM sc JOIN cand c USING (phrase)
             |ORDER BY score DESC, c.phrase LIMIT 20""".stripMargin)),

    // ---- query-likelihood retrieval (Dirichlet smoothing): the
    // language-modeling twin of q98's BM25 over the same query terms —
    // every doc scores via the background model decomposition.
    Q("q216_ql_dirichlet",
      (s, d) => graft.operators.TrainingPrep.qlDirichlet(
        t(s, d, "documents"), Seq("spark", "window", "vector"), topK = 20),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM d),
             |tot AS (SELECT CAST(sum(len(w)) AS DOUBLE) AS total FROM d),
             |tm AS (SELECT doc_id, term FROM
             |    (SELECT doc_id, unnest(w) AS term FROM d)
             |  WHERE term IN ('spark', 'window', 'vector')),
             |cf AS (SELECT term, CAST(count(*) AS DOUBLE) AS cf FROM tm GROUP BY term),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
             |       FROM tm GROUP BY 1, 2),
             |p1 AS (SELECT doc_id,
             |    sum(ln(1.0 + tf / (2000.0 * (cf / total)))) AS s
             |  FROM tf JOIN cf USING (term), tot GROUP BY doc_id)
             |SELECT dl.doc_id,
             |  round(coalesce(s, 0.0) + 3.0 * ln(2000.0 / (dl + 2000.0)), 4) AS score
             |FROM dl LEFT JOIN p1 USING (doc_id)
             |ORDER BY score DESC, dl.doc_id LIMIT 20""".stripMargin)),

    // ---- winsorized + trimmed means of document length per source:
    // robust level stats over the q180 nearest-rank band machinery.
    Q("q217_winsorized_stats",
      (s, d) => graft.operators.Profiling.winsorizedStats(
        t(s, d, "documents"), "source", "n_chars"),
      Some("""WITH b AS (SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents),
             |r AS (SELECT source, x,
             |    row_number() OVER (PARTITION BY source ORDER BY x) AS rn,
             |    count(*) OVER (PARTITION BY source) AS n FROM b),
             |bd AS (SELECT source,
             |    max(CASE WHEN rn = CAST(ceil(0.1 * n) AS BIGINT) THEN x END) AS p10,
             |    max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN x END) AS p90
             |  FROM r GROUP BY source),
             |j AS (SELECT b.source, x, p10, p90 FROM b JOIN bd USING (source))
             |SELECT source, CAST(count(*) AS BIGINT) AS n,
             |  round(CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS mean,
             |  round(CAST(sum(least(greatest(x, p10), p90)) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) * 1000000.0) / 1000000.0 AS winsorized_mean,
             |  round(CAST(sum(CASE WHEN x >= p10 AND x <= p90 THEN x ELSE 0 END) AS DOUBLE)
             |    / CAST(sum(CASE WHEN x >= p10 AND x <= p90 THEN 1 ELSE 0 END) AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS trimmed_mean
             |FROM j GROUP BY source ORDER BY source""".stripMargin)),

    // ---- cohort LTV accumulation: first-seen-week cohorts, purchase
    // cents per (cohort, age) with the running per-user LTV curve.
    Q("q218_cohort_ltv",
      (s, d) => graft.operators.EventOps.cohortLtv(Tables.events(s, d)),
      Some("""WITH b AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
             |    CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END AS cents
             |  FROM events),
             |ch AS (SELECT user_id, min(wk) AS cw FROM b GROUP BY user_id),
             |sz AS (SELECT cw, count(*) AS cohort_users FROM ch GROUP BY cw),
             |cl AS (SELECT cw, wk - cw AS age, sum(cents) AS cents
             |  FROM b JOIN ch USING (user_id) GROUP BY 1, 2),
             |cm AS (SELECT cw, age, cents,
             |    sum(cents) OVER (PARTITION BY cw ORDER BY age
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
             |  FROM cl)
             |SELECT cw AS cohort_week, age, CAST(cents AS BIGINT) AS cents,
             |  CAST(cum_cents AS BIGINT) AS cum_cents,
             |  CAST(cohort_users AS BIGINT) AS cohort_users,
             |  round(CAST(cum_cents AS DOUBLE) / CAST(cohort_users AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS ltv_cents_per_user
             |FROM cm JOIN sz USING (cw)
             |ORDER BY cohort_week, age""".stripMargin)),

    // ---- join-key skew report: top-20 l_partkey heavy hitters with
    // share and cumulative share — the pre-join hotspot check that
    // decides whether q82's salting is needed.
    Q("q219_heavy_hitters",
      (s, d) => graft.operators.Profiling.heavyHitters(
        t(s, d, "lineitem"), "l_partkey", topK = 20),
      Some("""WITH c AS (SELECT l_partkey AS key, count(*) AS n
             |  FROM lineitem GROUP BY 1),
             |tt AS (SELECT sum(n) AS nt FROM c),
             |tp AS (SELECT key, n FROM c ORDER BY n DESC, key LIMIT 20),
             |r AS (SELECT key, n,
             |    row_number() OVER (ORDER BY n DESC, key) AS rank,
             |    sum(n) OVER (ORDER BY n DESC, key
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
             |  FROM tp)
             |SELECT CAST(rank AS BIGINT) AS rank, key, CAST(n AS BIGINT) AS n,
             |  round(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS share,
             |  round(CAST(cum_n AS DOUBLE) / CAST(nt AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS cum_share
             |FROM r CROSS JOIN tt ORDER BY rank""".stripMargin)),

    // ---- per-doc character entropy via the codegen'd CharEntropy
    // expression — scan-speed randomness gate (no corpus×chars
    // explode); band filter marks template spam (low) / junk (high).
    Q("q220_char_entropy",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
          (round(graft.expressions.CharEntropy.char_entropy(col("text"))
            * 10000.0) / 10000.0).as("entropy"))
        .orderBy("doc_id"),
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
             |  FROM documents),
             |g AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
             |h AS (SELECT doc_id, sum(cnt) AS n,
             |    sum(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS s1
             |  FROM g GROUP BY doc_id)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
             |  round((ln(CAST(n AS DOUBLE)) - s1 / CAST(n AS DOUBLE)) * 10000.0)
             |    / 10000.0 AS entropy
             |FROM h ORDER BY doc_id""".stripMargin)),

    // ---- pairwise Jensen-Shannon divergence between source token
    // distributions over the shared top-50 vocab — the all-pairs drift
    // matrix (q123's KL is one-vs-rest).
    Q("q221_js_divergence",
      (s, d) => graft.operators.TrainingPrep
        .jsDivergenceMatrix(t(s, d, "documents"), vocabK = 50),
      Some("""WITH tk AS (SELECT source AS src, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             |vc AS (SELECT term FROM (
             |  SELECT term, count(*) AS cnt FROM tk GROUP BY term
             |  ORDER BY cnt DESC, term LIMIT 50)),
             |ct AS (SELECT src, term, count(*) AS c FROM tk JOIN vc USING (term)
             |       GROUP BY 1, 2),
             |ss AS (SELECT DISTINCT src FROM ct),
             |dn AS (SELECT s.src, v.term, coalesce(c.c, 0) AS c
             |  FROM ss s CROSS JOIN vc v
             |  LEFT JOIN ct c ON c.src = s.src AND c.term = v.term),
             |tt AS (SELECT src, sum(c) AS n FROM dn GROUP BY src),
             |wp AS (SELECT dn.src, term, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p
             |       FROM dn JOIN tt USING (src)),
             |pr AS (SELECT a.src AS src_a, b.src AS src_b, a.p AS pa, b.p AS pb
             |       FROM wp a JOIN wp b USING (term) WHERE a.src < b.src)
             |SELECT src_a, src_b,
             |  round(sum(
             |    CASE WHEN pa > 0 THEN 0.5 * pa * ln(pa / ((pa + pb) / 2.0)) ELSE 0.0 END
             |    + CASE WHEN pb > 0 THEN 0.5 * pb * ln(pb / ((pa + pb) / 2.0)) ELSE 0.0 END
             |  ) * 10000.0) / 10000.0 AS js
             |FROM pr GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin)),

    // ---- first-/last-touch conversion attribution with a 7-day
    // last-touch window: purchase cents credited per channel under both
    // models — the marketing-mix table next to q117's funnel.
    Q("q222_touch_attribution",
      (s, d) => graft.operators.EventOps.touchAttribution(
        Tables.events(s, d), windowNs = 7L * 86400 * 1000000000L),
      Some("""WITH e AS (SELECT user_id, event_id, event_type, value,
             |    epoch_ns(ts) AS tns FROM events),
             |w0 AS (SELECT *,
             |    last_value(CASE WHEN event_type <> 'purchase' THEN tns END
             |      IGNORE NULLS) OVER w AS lt_t,
             |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
             |      IGNORE NULLS) OVER w AS lt_e,
             |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
             |      IGNORE NULLS) OVER w AS ft_e
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |p AS (SELECT
             |    CASE WHEN lt_e IS NOT NULL AND tns - lt_t <= 604800000000000
             |      THEN lt_e ELSE 'direct' END AS last_touch,
             |    CASE WHEN ft_e IS NOT NULL THEN ft_e ELSE 'direct' END AS first_touch,
             |    CAST(round(value * 100.0) AS BIGINT) AS cents
             |  FROM w0 WHERE event_type = 'purchase')
             |SELECT * FROM (
             |  SELECT 'first_touch' AS model, first_touch AS channel,
             |    CAST(count(*) AS BIGINT) AS conversions,
             |    CAST(sum(cents) AS BIGINT) AS cents FROM p GROUP BY 2
             |  UNION ALL
             |  SELECT 'last_touch', last_touch, CAST(count(*) AS BIGINT),
             |    CAST(sum(cents) AS BIGINT) FROM p GROUP BY 2)
             |ORDER BY model, channel""".stripMargin)),

    // ---- day-of-week load profile over the dense daily series: the
    // weekly-seasonality index every anomaly gate should see first.
    Q("q223_weekday_profile",
      (s, d) => graft.operators.EventOps.weekdayProfile(Tables.events(s, d)),
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |d AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |tt AS (SELECT sum(c) AS s, count(*) AS t FROM d),
             |g AS (SELECT day % 7 AS dow, count(*) AS n_days, sum(c) AS events
             |  FROM d GROUP BY 1)
             |SELECT dow, CAST(n_days AS BIGINT) AS n_days,
             |  CAST(events AS BIGINT) AS events,
             |  round(CAST(events AS DOUBLE) / CAST(n_days AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS mean_per_day,
             |  round(CAST(events AS DOUBLE) / CAST(n_days AS DOUBLE)
             |    / (CAST(s AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000.0)
             |    / 1000000.0 AS index_vs_grand
             |FROM g CROSS JOIN tt ORDER BY dow""".stripMargin)),

    // ---- order-basket part co-occurrence: top-20 part pairs bought
    // together with lift — market-basket at order granularity (q211 is
    // the session twin).
    Q("q224_basket_pairs",
      (s, d) => graft.operators.Ranking.cooccurrencePairs(
        t(s, d, "lineitem"), col("l_orderkey"), col("l_partkey"), topK = 20),
      Some("""WITH p AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
             |  FROM lineitem),
             |tt AS (SELECT count(*) AS ng FROM (SELECT DISTINCT g FROM p)),
             |sg AS (SELECT i, count(*) AS ni FROM p GROUP BY i),
             |pr AS (SELECT a.i AS ia, b.i AS ib, count(*) AS n_ab
             |       FROM p a JOIN p b ON a.g = b.g AND a.i < b.i GROUP BY 1, 2),
             |tp AS (SELECT ia, ib, n_ab FROM pr
             |       ORDER BY n_ab DESC, ia, ib LIMIT 20)
             |SELECT ia, ib, CAST(n_ab AS BIGINT) AS n_ab,
             |  CAST(sa.ni AS BIGINT) AS na, CAST(sb.ni AS BIGINT) AS nb,
             |  round(CAST(n_ab AS DOUBLE) * CAST(ng AS DOUBLE)
             |    / (CAST(sa.ni AS DOUBLE) * CAST(sb.ni AS DOUBLE)) * 1000000.0)
             |    / 1000000.0 AS lift
             |FROM tp JOIN sg sa ON sa.i = tp.ia JOIN sg sb ON sb.i = tp.ib
             |  CROSS JOIN tt
             |ORDER BY n_ab DESC, ia, ib""".stripMargin)),

    // ---- Cohen's kappa: the q28 stopword-profile language heuristic
    // against the true label — chance-corrected agreement in one row.
    Q("q225_cohen_kappa",
      (s, d) => graft.operators.Profiling.cohenKappa(
        t(s, d, "documents").select(
          graft.operators.TextAnalysis.langId(col("text")).as("pred"),
          col("lang")),
        col("pred"), col("lang")),
      Some("""WITH sc AS (SELECT lang,
             |  len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to','is'))) AS s_en,
             |  len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist'))) AS s_de,
             |  len(list_filter(string_split(text,' '), x -> x IN ('el','los','las','y','es'))) AS s_es,
             |  len(list_filter(string_split(text,' '), x -> x IN ('le','la','les','et','est'))) AS s_fr
             |  FROM documents),
             |pd AS (SELECT CASE
             |    WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
             |    WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
             |    WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
             |    WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
             |    ELSE 'fr' END AS a, lang AS b FROM sc),
             |ma AS (SELECT a, count(*) AS na FROM pd GROUP BY a),
             |mb AS (SELECT b, count(*) AS nb FROM pd GROUP BY b),
             |dg AS (SELECT count(*) AS n,
             |    sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree FROM pd),
             |pe AS (SELECT sum(CAST(na AS HUGEINT) * CAST(nb AS HUGEINT)) AS sab
             |       FROM ma JOIN mb ON ma.a = mb.b)
             |SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS agree,
             |  round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS po,
             |  round(CAST(sab AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             |    * 1000000.0) / 1000000.0 AS pe,
             |  round((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
             |      - CAST(sab AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             |    / (1.0 - CAST(sab AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS kappa
             |FROM dg CROSS JOIN pe""".stripMargin)),

    // ---- per-source signature terms: source-level tf-idf — the words
    // that make each source different (q221 names the pairs, this
    // names the vocabulary).
    Q("q226_source_signatures",
      (s, d) => graft.operators.TrainingPrep
        .sourceSignatures(t(s, d, "documents"), perSource = 5),
      Some("""WITH tf AS (SELECT source AS src, term, count(*) AS tf FROM (
             |    SELECT source, unnest(string_split(text, ' ')) AS term
             |    FROM documents) GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |ns AS (SELECT count(DISTINCT src) AS s FROM tf),
             |sc AS (SELECT src, term, tf, df,
             |    round(CAST(tf AS DOUBLE) * ln(CAST(s AS DOUBLE) / CAST(df AS DOUBLE))
             |      * 10000.0) / 10000.0 AS score
             |  FROM tf JOIN df USING (term) CROSS JOIN ns),
             |r AS (SELECT *, row_number() OVER (
             |    PARTITION BY src ORDER BY score DESC, term) AS rnk FROM sc)
             |SELECT src AS source, CAST(rnk AS BIGINT) AS rnk, term,
             |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df_sources, score
             |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin)),

    // ---- weekly stickiness: WAU, average DAU over the active span,
    // and the DAU/WAU ratio per week.
    Q("q227_stickiness",
      (s, d) => graft.operators.EventOps.stickiness(Tables.events(s, d)),
      Some("""WITH b AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id
             |  FROM events),
             |dd AS (SELECT day, count(DISTINCT user_id) AS dau FROM b GROUP BY day),
             |dw AS (SELECT day // 7 AS week, count(*) AS active_days,
             |    sum(dau) AS dau_sum FROM dd GROUP BY 1),
             |ww AS (SELECT day // 7 AS week, count(DISTINCT user_id) AS wau
             |  FROM b GROUP BY 1)
             |SELECT week, CAST(active_days AS BIGINT) AS active_days,
             |  CAST(wau AS BIGINT) AS wau,
             |  round(CAST(dau_sum AS DOUBLE) / CAST(active_days AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS dau_avg,
             |  round(CAST(dau_sum AS DOUBLE) / CAST(active_days AS DOUBLE)
             |    / CAST(wau AS DOUBLE) * 1000000.0) / 1000000.0 AS stickiness
             |FROM dw JOIN ww USING (week) ORDER BY week""".stripMargin)),

    // ---- new vs returning weekly actives: the acquisition/retention
    // mix per week.
    Q("q228_new_vs_returning",
      (s, d) => graft.operators.EventOps.newVsReturning(Tables.events(s, d)),
      Some("""WITH b AS (SELECT DISTINCT epoch_us(ts) // 604800000000 AS wk, user_id
             |  FROM events),
             |f AS (SELECT user_id, min(wk) AS fw FROM b GROUP BY user_id)
             |SELECT wk AS week, CAST(count(*) AS BIGINT) AS active_users,
             |  CAST(sum(CASE WHEN wk = fw THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
             |  CAST(count(*) - sum(CASE WHEN wk = fw THEN 1 ELSE 0 END) AS BIGINT)
             |    AS returning_users,
             |  round(CAST(sum(CASE WHEN wk = fw THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) * 1000000.0) / 1000000.0 AS new_frac
             |FROM b JOIN f USING (user_id)
             |GROUP BY wk ORDER BY week""".stripMargin)),

    // ---- token-weighted document-length percentiles per source: the
    // length of the doc the MEDIAN TOKEN lives in (unweighted medians
    // report the median document instead).
    Q("q229_weighted_quantiles",
      (s, d) => graft.operators.Profiling.weightedQuantiles(
        t(s, d, "documents").select(col("source"), col("n_chars"),
          size(split(col("text"), " ")).as("w")),
        "source", "n_chars", "w", Seq(0.5, 0.9)),
      Some("""WITH b AS (SELECT source, CAST(n_chars AS BIGINT) AS x,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w FROM documents),
             |v AS (SELECT source, x, sum(w) AS w FROM b GROUP BY 1, 2),
             |c AS (SELECT source, x, w,
             |    sum(w) OVER (PARTITION BY source ORDER BY x
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             |    sum(w) OVER (PARTITION BY source) AS tw FROM v)
             |SELECT source, CAST(max(tw) AS BIGINT) AS total_weight,
             |  CAST(min(CASE WHEN CAST(cumw AS DOUBLE) >= 0.5 * CAST(tw AS DOUBLE)
             |    THEN x END) AS BIGINT) AS wp50,
             |  CAST(min(CASE WHEN CAST(cumw AS DOUBLE) >= 0.9 * CAST(tw AS DOUBLE)
             |    THEN x END) AS BIGINT) AS wp90
             |FROM c GROUP BY source ORDER BY source""".stripMargin)),

    // ---- decile gains table for the trained quality classifier: per
    // score decile the positive rate and cumulative capture — the
    // model-lift view next to q183's P-R sweep.
    Q("q230_gains_table",
      (s, d) => {
        val docs = t(s, d, "documents")
        val labeled = docs.withColumn("y",
          (graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.9)
            .cast("long"))
        val scored = graft.operators.QualityClassifier
          .score(docs, logregModel(docs))
          .join(labeled.select(col("doc_id"), col("y")), Seq("doc_id"))
        graft.operators.Profiling.gainsTable(scored)
      },
      Some(s"""WITH ${logregCtes(3)},
              |sc AS (SELECT doc_id, y,
              |    round(1.0/(1.0 + exp(-(w1*(x1/1000000.0) + w2*(x2/1000000.0) + w3*(x3/1000000.0)
              |      + w4*(x4/1000000.0) + w5*(x5/1000000.0)))) * 1000000.0)/1000000.0 AS score
              |  FROM fx CROSS JOIN wfin),
              |r AS (SELECT doc_id, y, score,
              |    row_number() OVER (ORDER BY score DESC, doc_id) AS rnk,
              |    count(*) OVER () AS nn FROM sc),
              |bd AS (SELECT CAST(ceil(10 * rnk / nn) AS BIGINT) AS decile, y FROM r),
              |g AS (SELECT decile, count(*) AS n, sum(y) AS positives
              |      FROM bd GROUP BY decile),
              |tp AS (SELECT sum(positives) AS tp FROM g),
              |c AS (SELECT decile, n, positives,
              |    sum(positives) OVER (ORDER BY decile
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
              |  FROM g)
              |SELECT decile, CAST(n AS BIGINT) AS n,
              |  CAST(positives AS BIGINT) AS positives,
              |  round(CAST(positives AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
              |    / 1000000.0 AS rate,
              |  round(CAST(cum_pos AS DOUBLE) / CAST(tp AS DOUBLE) * 1000000.0)
              |    / 1000000.0 AS cum_capture
              |FROM c CROSS JOIN tp ORDER BY decile""".stripMargin)),

    // ---- Kaplan-Meier view->purchase survival with right-censoring:
    // the censoring-correct "fraction converted by day t" curve.
    Q("q231_kaplan_meier",
      (s, d) => graft.operators.EventOps.kaplanMeier(Tables.events(s, d)),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
             |en AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN tns END) AS t0,
             |    max(tns) AS tmax
             |  FROM e GROUP BY user_id
             |  HAVING min(CASE WHEN event_type = 'view' THEN tns END) IS NOT NULL),
             |cv AS (SELECT e.user_id, min(tns) AS tp
             |  FROM e JOIN en USING (user_id)
             |  WHERE event_type = 'purchase' AND tns >= t0 GROUP BY e.user_id),
             |du AS (SELECT en.user_id,
             |    CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400000000000
             |         ELSE (tmax - t0) // 86400000000000 END AS dur,
             |    CAST(tp IS NOT NULL AS BIGINT) AS ev
             |  FROM en LEFT JOIN cv USING (user_id)),
             |cl AS (SELECT dur, sum(ev) AS e, sum(1 - ev) AS c FROM du GROUP BY dur),
             |tt AS (SELECT sum(e + c) AS n FROM cl),
             |rk AS (SELECT dur, e, c, n,
             |    n - coalesce(sum(e + c) OVER (ORDER BY dur
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
             |  FROM cl CROSS JOIN tt),
             |sv AS (SELECT dur, n_risk, e, c,
             |    CASE WHEN sum(CASE WHEN e = n_risk THEN 1 ELSE 0 END)
             |        OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
             |      THEN 0.0
             |      ELSE round(exp(sum(CASE WHEN e > 0 AND e < n_risk
             |        THEN ln(1.0 - CAST(e AS DOUBLE) / CAST(n_risk AS DOUBLE))
             |        ELSE 0.0 END)
             |      OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |      * 1000000.0) / 1000000.0 END AS survival
             |  FROM rk)
             |SELECT dur AS duration_days, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(e AS BIGINT) AS events, CAST(c AS BIGINT) AS censored, survival
             |FROM sv ORDER BY duration_days""".stripMargin)),

    // ---- distribution window functions: percent_rank / cume_dist /
    // ntile(4) over a per-segment total order (tiebreak by custkey so
    // ntile's positional split is engine-deterministic).
    Q("q232_window_distributions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, d, "customer").select(col("c_mktsegment"), col("c_custkey"),
          round(col("c_acctbal") * lit(100.0)).cast("long").as("bal_cents"),
          (round(percent_rank().over(w) * 1000000.0) / 1000000.0)
            .as("pct_rank"),
          (round(cume_dist().over(w) * 1000000.0) / 1000000.0).as("cdist"),
          ntile(4).over(w).cast("long").as("quartile"))
          .orderBy("c_mktsegment", "c_custkey")
      },
      Some("""SELECT c_mktsegment, c_custkey,
             |  CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents,
             |  round(percent_rank() OVER w * 1000000.0) / 1000000.0 AS pct_rank,
             |  round(cume_dist() OVER w * 1000000.0) / 1000000.0 AS cdist,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
             |ORDER BY c_mktsegment, c_custkey""".stripMargin)),

    // ---- cross-language perplexity matrix: every lang slice scored
    // under every lang's smoothed unigram LM — diagonal-dominance is
    // the label-sanity check; off-diagonal dips flag mislabeled slices.
    Q("q233_cross_perplexity",
      (s, d) => graft.operators.TrainingPrep
        .crossPerplexity(t(s, d, "documents")),
      Some("""WITH tk AS (SELECT lang AS dl, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             |ct AS (SELECT dl, term, count(*) AS c FROM tk GROUP BY 1, 2),
             |nl AS (SELECT dl AS ml, sum(c) AS n FROM ct GROUP BY 1),
             |vc AS (SELECT count(DISTINCT term) AS v FROM tk)
             |SELECT tk.dl AS doc_lang, nl.ml AS model_lang,
             |  CAST(count(*) AS BIGINT) AS n_tok,
             |  round(avg(-ln((CAST(coalesce(mc.c, 0) AS DOUBLE) + 1.0)
             |    / (CAST(nl.n AS DOUBLE) + CAST(v AS DOUBLE))) / ln(2)), 4)
             |    AS bits_per_tok
             |FROM tk CROSS JOIN nl
             |  LEFT JOIN ct mc ON mc.dl = nl.ml AND mc.term = tk.term
             |  CROSS JOIN vc
             |GROUP BY 1, 2 ORDER BY doc_lang, model_lang""".stripMargin)),

    // ---- rolling 7-day distinct active users per day: the sliding
    // WAU series via the explode-to-target-days equi shape (a rolling
    // DISTINCT cannot slide — each day recounts).
    Q("q234_rolling_active",
      (s, d) => graft.operators.EventOps
        .rollingActiveUsers(Tables.events(s, d), windowDays = 7),
      Some("""WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
             |  FROM events),
             |b AS (SELECT max(day) AS mx FROM du),
             |ex AS (SELECT unnest(generate_series(day, day + 6)) AS d, user_id
             |       FROM du)
             |SELECT d AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS rolling_users
             |FROM ex CROSS JOIN b WHERE d <= mx
             |GROUP BY d ORDER BY day""".stripMargin)),

    // ---- per-label embedding anisotropy (Ethayarajh 2019): centroid
    // norm over average norm — is this space isotropic enough for
    // cosine thresholds to mean anything?
    Q("q235_anisotropy",
      (s, d) => graft.operators.Similarity
        .anisotropyProfile(t(s, d, "embeddings")),
      Some("""WITH q AS (SELECT label AS lab,
             |    [CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT) for x in embedding] AS q
             |  FROM embeddings),
             |r AS (SELECT lab,
             |    sqrt(CAST(list_reduce(list_transform(q, x -> x * x),
             |      (a, b) -> a + b) AS DOUBLE)) / 10000.0 AS norm FROM q),
             |pl AS (SELECT lab, count(*) AS n, round(avg(norm), 4) AS avg_norm
             |  FROM r GROUP BY lab),
             |dv AS (SELECT lab, i, sum(CAST(q[i+1] AS HUGEINT)) AS s
             |  FROM q CROSS JOIN range(0, 64) t(i) GROUP BY 1, 2),
             |ct AS (SELECT dv.lab,
             |    round(sqrt(sum((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))) / 10000.0, 4)
             |      AS centroid_norm
             |  FROM dv JOIN pl USING (lab) GROUP BY dv.lab)
             |SELECT pl.lab AS label, CAST(n AS BIGINT) AS n, avg_norm,
             |  centroid_norm, round(centroid_norm / avg_norm, 4) AS anisotropy
             |FROM pl JOIN ct USING (lab) ORDER BY label""".stripMargin)),

    // ---- duplicate-cluster size distribution: how big do the q71
    // connected components get — the dedup-telemetry histogram that
    // catches template floods (one giant cluster) early.
    Q("q236_cluster_sizes",
      (s, d) => Dedup.duplicateClusters(
          Dedup.shingleJaccardPairs(t(s, d, "documents"), 0.5))
        .groupBy("cluster").agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size"),
      Some("""WITH RECURSIVE ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS s
             |       FROM ws WHERE len(w) >= 3),
             |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2),
             |pairs AS (SELECT ia, ib
             |          FROM inter JOIN cnt ca ON ca.doc_id = ia JOIN cnt cb ON cb.doc_id = ib
             |          WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5),
             |edges AS (SELECT ia AS u, ib AS v FROM pairs
             |          UNION SELECT ib, ia FROM pairs),
             |reach AS (SELECT u AS src, u AS dst FROM edges
             |          UNION
             |          SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
             |lab AS (SELECT src AS doc_id, min(dst) AS cluster
             |        FROM reach GROUP BY src),
             |sz AS (SELECT cluster, count(*) AS sz FROM lab GROUP BY cluster)
             |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
             |FROM sz GROUP BY sz ORDER BY cluster_size""".stripMargin)),

    // ---- Theil-Sen robust daily trend: median pairwise slope +
    // median-residual intercept — the flood-day-proof trend line.
    Q("q237_theil_sen",
      (s, d) => graft.operators.EventOps.theilSenTrend(Tables.events(s, d)),
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |d AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |p AS (SELECT a.day AS di, a.c AS ci, b2.day AS dj, b2.c AS cj
             |      FROM d a JOIN d b2 ON b2.day > a.day),
             |s AS (SELECT CAST(cj - ci AS DOUBLE) / CAST(dj - di AS DOUBLE) AS s,
             |        di, dj FROM p),
             |nn AS (SELECT count(*) AS n FROM s),
             |sl AS (SELECT s AS slope FROM
             |    (SELECT s, row_number() OVER (ORDER BY s, di, dj) AS rn FROM s), nn
             |  WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0) AS BIGINT)),
             |r AS (SELECT day, CAST(c AS DOUBLE) - slope * CAST(day AS DOUBLE) AS r,
             |        slope FROM d CROSS JOIN sl),
             |nd AS (SELECT count(*) AS nd FROM r)
             |SELECT round(slope * 1000000.0) / 1000000.0 AS slope,
             |  round(r * 1000000.0) / 1000000.0 AS intercept
             |FROM (SELECT r, slope, row_number() OVER (ORDER BY r, day) AS rn FROM r), nd
             |WHERE rn = CAST(ceil(CAST(nd AS DOUBLE) / 2.0) AS BIGINT)""".stripMargin)),

    // ---- source vocabulary-overlap Jaccard matrix: the set complement
    // of q221's distributional JS (disjoint jargon vs reweighting).
    Q("q238_vocab_jaccard",
      (s, d) => graft.operators.TrainingPrep
        .vocabJaccard(t(s, d, "documents")),
      Some("""WITH vt AS (SELECT DISTINCT src, term FROM (
             |    SELECT source AS src, unnest(string_split(text, ' ')) AS term
             |    FROM documents) WHERE len(term) > 0),
             |sz AS (SELECT src, count(*) AS n FROM vt GROUP BY src),
             |iv AS (SELECT a.src AS sa, b.src AS sb, count(*) AS i
             |       FROM vt a JOIN vt b ON a.term = b.term AND a.src < b.src
             |       GROUP BY 1, 2)
             |SELECT sa AS src_a, sb AS src_b, CAST(i AS BIGINT) AS common,
             |  CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
             |  round(CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS jaccard
             |FROM iv JOIN sz na ON na.src = sa JOIN sz nb ON nb.src = sb
             |ORDER BY src_a, src_b""".stripMargin)),

    // ---- per-user inter-arrival exponential fit + exact KS distance:
    // is arrival Poisson, and at which gap does it deviate most?
    Q("q239_interarrival_fit",
      (s, d) => graft.operators.EventOps
        .interArrivalExpFit(Tables.events(s, d)),
      Some("""WITH g0 AS (SELECT user_id, epoch_ns(ts) AS tns, event_id FROM events),
             |g1 AS (SELECT (tns - lag(tns) OVER (
             |    PARTITION BY user_id ORDER BY tns, event_id)) AS d FROM g0),
             |g AS (SELECT d // 1000000000 AS v FROM g1 WHERE d IS NOT NULL),
             |tt AS (SELECT count(*) AS n, sum(v) AS s FROM g),
             |bv AS (SELECT v, count(*) AS c FROM g GROUP BY v),
             |cm AS (SELECT v, sum(c) OVER (ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM bv),
             |x AS (SELECT v, cum, n, s,
             |    round(abs(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE)
             |      - (1.0 - exp(-(CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
             |                   * CAST(v AS DOUBLE)))) * 1000000000.0)
             |      / 1000000000.0 AS d9
             |  FROM cm CROSS JOIN tt)
             |SELECT CAST(n AS BIGINT) AS n,
             |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS mean_gap_s,
             |  round(CAST(n AS DOUBLE) / CAST(s AS DOUBLE) * 1000000000.0)
             |    / 1000000000.0 AS lambda,
             |  v AS at_gap_s,
             |  round(d9 * 1000000.0) / 1000000.0 AS ks_d
             |FROM x ORDER BY d9 DESC, v LIMIT 1""".stripMargin)),

    // ---- stationary distribution of the q189 session Markov chain:
    // 30 quantized power-iteration rounds (1e-9 units — the logreg
    // quantize-before-accumulate pattern), bit-stable on any engine.
    Q("q240_stationary_dist",
      (s, d) => graft.operators.EventOps
        .stationaryDistribution(Tables.events(s, d), rounds = 30),
      Some(s"""$stationaryCtePrefix
           |SELECT s AS state, q AS prob_q,
           |  round(CAST(q AS DOUBLE) / 1000.0) / 1000000.0 AS prob
           |FROM pi30 ORDER BY state""".stripMargin)),

    // ---- shingle-containment dedup pairs: A's entire shingle set
    // inside B's — the quote/repost class Jaccard thresholds miss.
    Q("q241_containment_pairs",
      (s, d) => Dedup.containmentPairs(t(s, d, "documents")),
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS s
             |       FROM ws WHERE len(w) >= 3),
             |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |iv AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
             |       GROUP BY 1, 2)
             |SELECT ia AS contained_id, ib AS container_id,
             |  CAST(ca.n AS BIGINT) AS n_shingles_a,
             |  CAST(cb.n AS BIGINT) AS n_shingles_b
             |FROM iv JOIN cnt ca ON ca.doc_id = ia JOIN cnt cb ON cb.doc_id = ib
             |WHERE ca.n >= 3 AND i = ca.n
             |  AND (ca.n < cb.n OR (ca.n = cb.n AND ia < ib))
             |ORDER BY contained_id, container_id""".stripMargin)),

    // ---- forward as-of: for each click, the NEXT purchase at-or-after
    // — the q19 backward join's mirror, completing the as-of family.
    Q("q242_asof_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
        val c = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("cid"), col("ts"))
        val p = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
            col("ts").as("pts2"), col("ts"))
        graft.operators.AsofJoin.forward(c, p, Seq("user_id"), "ts",
          Seq("pid", "pts2"))
          .select(col("user_id"), col("cid"), col("pid"),
            (expr("pts2 div 1000") - expr("ts div 1000")).as("gap_us"))
          .orderBy("cid")
      },
      Some("""WITH c AS (SELECT user_id, event_id AS cid, ts FROM events
             |           WHERE event_type = 'click'),
             |p AS (SELECT user_id, event_id AS pid, ts FROM events
             |      WHERE event_type = 'purchase')
             |SELECT c.user_id, cid, pid, epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
             |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts
             |ORDER BY cid""".stripMargin)),

    // ---- trailing-14-day z-score anomaly days: the self-calibrating
    // volume alarm — exact integer frame sums, one IEEE chain per row.
    Q("q243_rolling_zscore",
      (s, d) => graft.operators.EventOps
        .rollingZScore(Tables.events(s, d), window = 14),
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |d AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |w AS (SELECT day, c,
             |    count(*) OVER fr AS k,
             |    sum(CAST(c AS HUGEINT)) OVER fr AS s1,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) OVER fr AS s2
             |  FROM d WINDOW fr AS (ORDER BY day ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING))
             |SELECT day, CAST(c AS BIGINT) AS c,
             |  round(CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS baseline_mean,
             |  CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
             |             / CAST(k AS DOUBLE)) / CAST(k AS DOUBLE) > 0
             |    THEN round((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
             |      / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
             |              / CAST(k AS DOUBLE)) / CAST(k AS DOUBLE)) * 1000000.0)
             |      / 1000000.0 END AS z
             |FROM w WHERE k = 14 ORDER BY day""".stripMargin)),

    // ---- top tf-idf cosine document pairs: the lexical relatedness
    // rank between the shingle (surface) and embedding (semantic) pair
    // finders; vector space df-bounded on both ends.
    Q("q244_tfidf_pairs",
      (s, d) => graft.operators.TrainingPrep
        .tfidfCosinePairs(t(s, d, "documents"), topK = 20, maxDf = 100),
      Some("""WITH tf AS (SELECT doc_id AS id, term, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |    FROM documents) GROUP BY 1, 2),
             |nd AS (SELECT count(*) AS nd FROM documents),
             |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term
             |        HAVING count(*) >= 2 AND count(*) <= 100),
             |w AS (SELECT id, tf.term,
             |    CAST(tf AS DOUBLE) * ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE)) AS w
             |  FROM tf JOIN dfx ON dfx.term = tf.term CROSS JOIN nd),
             |nm AS (SELECT id, sum(w * w) AS n2 FROM w GROUP BY id),
             |dt AS (SELECT a.id AS ia, b.id AS ib, sum(a.w * b.w) AS dot
             |       FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
             |       GROUP BY 1, 2)
             |SELECT ia AS id_a, ib AS id_b,
             |  round(dot / (sqrt(na.n2) * sqrt(nb.n2)) * 10000.0) / 10000.0 AS cos
             |FROM dt JOIN nm na ON na.id = ia JOIN nm nb ON nb.id = ib
             |ORDER BY cos DESC, id_a, id_b LIMIT 20""".stripMargin)),

    // ---- Flesch reading-ease per doc + the per-source mean: the
    // classic readability gate (vowel-group syllable estimate).
    Q("q245_readability",
      (s, d) => {
        val score = graft.operators.TextAnalysis
          .fleschReadingEase(col("text"))
        val perDoc = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            (round(score * 10000.0) / 10000.0).as("flesch"))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            (round(avg(col("flesch")) * 10000.0) / 10000.0)
              .as("mean_flesch"),
            min(col("flesch")).as("min_flesch"),
            max(col("flesch")).as("max_flesch"))
          .orderBy("source")
      },
      Some("""WITH pd AS (SELECT source,
             |  round((206.835
             |    - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
             |        / CAST(greatest(len(regexp_extract_all(text, '[.!?]')), 1) AS DOUBLE))
             |    - 84.6 * (CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS DOUBLE)
             |        / CAST(len(string_split(text, ' ')) AS DOUBLE))) * 10000.0)
             |    / 10000.0 AS flesch
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  round(avg(flesch) * 10000.0) / 10000.0 AS mean_flesch,
             |  min(flesch) AS min_flesch, max(flesch) AS max_flesch
             |FROM pd GROUP BY source ORDER BY source""".stripMargin)),

    // ---- session depth histogram + bounce rate: the q191 session fact
    // table rolled to "how deep do visits go" (depth 1 = bounce).
    Q("q246_session_depth",
      (s, d) => {
        val sess = graft.operators.EventOps.sessionStats(
          Tables.events(s, d), gapNs = 1800L * Tables.NanosPerSecond)
        val tot = sess.agg(count(lit(1)).as("ns"))
        sess.groupBy(col("n_events").as("depth"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
          .join(broadcast(tot))
          .select(col("depth"), col("n_sessions"), col("n_converted"),
            (round(col("n_sessions").cast("double") / col("ns").cast("double")
              * 1000000.0) / 1000000.0).as("frac"))
          .orderBy("depth")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns,
             |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
             |           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT user_id, event_type,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
             |  FROM g),
             |f AS (SELECT user_id, sess_id, count(*) AS depth,
             |    (sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0) AS conv
             |  FROM s GROUP BY 1, 2),
             |tt AS (SELECT count(*) AS ns FROM f)
             |SELECT depth, CAST(count(*) AS BIGINT) AS n_sessions,
             |  CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
             |  round(CAST(count(*) AS DOUBLE) / CAST(ns AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS frac
             |FROM f CROSS JOIN tt GROUP BY depth, ns
             |ORDER BY depth""".stripMargin)),

    // ---- top repeated 8-token phrases across documents: the
    // boilerplate STRINGS themselves with their document reach (q77
    // gates on fingerprints; this surfaces the actual offenders).
    Q("q247_repeated_phrases",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), explode(expr(
          """array_distinct(CASE WHEN size(split(text, ' ')) >= 8
            |  THEN transform(sequence(1, size(split(text, ' ')) - 7),
            |       i -> array_join(slice(split(text, ' '), i, 8), ' '))
            |  ELSE cast(array() as array<string>) END)""".stripMargin))
          .as("ph"))
        .groupBy("ph").agg(count(lit(1)).as("n_docs"))
        .where(col("n_docs") >= 3)
        .orderBy(col("n_docs").desc, col("ph")).limit(20),
      Some("""WITH px AS (SELECT doc_id, unnest(list_distinct(
             |    [array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)])) AS ph
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
             |  WHERE len(w) >= 8)
             |SELECT ph, CAST(count(*) AS BIGINT) AS n_docs
             |FROM px GROUP BY ph HAVING count(*) >= 3
             |ORDER BY n_docs DESC, ph LIMIT 20""".stripMargin)),

    // ---- squared-distance silhouette of the q129 clustering: O(N·k)
    // via the cluster-sum decomposition (never an all-pairs join);
    // exact quantized integer sums, two divisions per (point, cluster).
    Q("q248_silhouette",
      (s, d) => graft.operators.Clustering
        .silhouette(t(s, d, "embeddings"), k = 4, iters = 3),
      Some(s"""WITH ${kmeansCtes(4, 3, 64)},
              |no AS (SELECT vid, CAST(list_reduce(list_transform(q, x -> x * x),
              |    (a, b) -> a + b) AS BIGINT) AS n2 FROM e),
              |cs AS (SELECT cid, count(*) AS n,
              |    list_reduce(list(q ORDER BY vid),
              |      (a, b) -> [a[i+1] + b[i+1] for i in range(0, 64)]) AS sv,
              |    sum(n2) AS qq
              |  FROM sfin JOIN e USING (vid) JOIN no USING (vid) GROUP BY cid),
              |pc AS (SELECT s.vid, s.cid AS own, c.cid AS other, c.n,
              |    c.n * no.n2
              |      - 2 * list_reduce([e.q[i+1] * c.sv[i+1] for i in range(0, 64)],
              |            (a, b) -> a + b)
              |      + c.qq AS ssd
              |  FROM sfin s JOIN e USING (vid) JOIN no USING (vid) CROSS JOIN cs c),
              |ab AS (SELECT vid, own,
              |    max(CASE WHEN other = own AND n > 1
              |      THEN CAST(ssd AS DOUBLE) / CAST(n - 1 AS DOUBLE) END) AS a,
              |    min(CASE WHEN other <> own
              |      THEN CAST(ssd AS DOUBLE) / CAST(n AS DOUBLE) END) AS b
              |  FROM pc GROUP BY 1, 2),
              |si AS (SELECT own AS cluster,
              |    CASE WHEN a IS NULL THEN 0.0
              |         ELSE (b - a) / greatest(a, b) END AS s FROM ab)
              |SELECT cluster, CAST(count(*) AS BIGINT) AS n,
              |  round(avg(s) * 1000000.0) / 1000000.0 AS mean_silhouette
              |FROM si GROUP BY cluster ORDER BY cluster""".stripMargin)),

    // ---- retrieval quality: NDCG@10 + MRR of the q98 BM25 ranking
    // against a graded term-overlap relevance proxy — ranking-quality
    // scalars the PR/AUC rows don't measure.
    Q("q249_retrieval_eval",
      (s, d) => graft.operators.TrainingPrep.retrievalEval(
        t(s, d, "documents"), Seq("spark", "window", "vector"), atK = 10),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |s AS (SELECT avg(len(w)) AS avgdl, CAST(count(*) AS DOUBLE) AS n FROM d),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
             |         any_value(dl) AS dl
             |       FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM d)
             |       WHERE term IN ('spark', 'window', 'vector')
             |       GROUP BY doc_id, term),
             |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
             |bm0 AS (SELECT doc_id AS id,
             |    round(sum(ln((n - df + 0.5) / (df + 0.5) + 1) * tf * 2.2 /
             |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
             |  FROM tf JOIN df USING (term), s
             |  GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10),
             |bm AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank
             |       FROM bm0),
             |rl AS (SELECT doc_id AS id,
             |    CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
             |      ['spark', 'window', 'vector'])) AS BIGINT) AS rel
             |  FROM documents),
             |dcg AS (SELECT sum((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
             |    / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0))) AS dcg
             |  FROM bm JOIN rl USING (id)),
             |id0 AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, id) AS rank
             |  FROM (SELECT id, rel FROM rl ORDER BY rel DESC, id LIMIT 10)),
             |idcg AS (SELECT sum((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
             |    / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0))) AS idcg FROM id0),
             |mr AS (SELECT min(rank) AS first_rel FROM bm JOIN rl USING (id)
             |       WHERE rel > 0)
             |SELECT round(dcg / idcg * 1000000.0) / 1000000.0 AS ndcg_at_k,
             |  round(1.0 / CAST(first_rel AS DOUBLE) * 1000000.0) / 1000000.0 AS mrr,
             |  CAST(first_rel AS BIGINT) AS first_rel
             |FROM dcg CROSS JOIN idcg CROSS JOIN mr""".stripMargin)),

    // ---- operating-point selection: the threshold maximizing F1 over
    // a 16-point sweep of the q183 machinery — "ship the gate at
    // THIS cut", ties to the lower threshold.
    Q("q250_best_threshold",
      (s, d) => {
        val docs = t(s, d, "documents")
        val heldOut = docs.where(col("doc_id") % 3 =!= 0).withColumn("y",
          (graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.9)
            .cast("long"))
        val grid = (30 to 45).map(_ / 100.0)
        graft.operators.QualityClassifier
          .prCurve(heldOut, logregModel(docs), grid)
          .orderBy(col("f1").desc_nulls_last, col("threshold")).limit(1)
      },
      Some {
        val grid = (30 to 45).map(i => f"${i / 100.0}%.2f").mkString(", ")
        s"""WITH ${logregCtes(3)},
           |sc AS (SELECT doc_id, y,
           |    round(1.0/(1.0 + exp(-(w1*(x1/1000000.0) + w2*(x2/1000000.0) + w3*(x3/1000000.0)
           |      + w4*(x4/1000000.0) + w5*(x5/1000000.0)))) * 1000000.0)/1000000.0 AS score
           |  FROM fx CROSS JOIN wfin WHERE doc_id % 3 <> 0),
           |sw AS (SELECT y, score, unnest([$grid]) AS threshold FROM sc),
           |ag AS (SELECT threshold,
           |    CAST(sum(CASE WHEN score >= threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |    CAST(sum(CASE WHEN score >= threshold AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |    CAST(sum(CASE WHEN score < threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
           |  FROM sw GROUP BY threshold)
           |SELECT threshold, tp, fp, fn,
           |  CASE WHEN tp + fp > 0 THEN round(tp::DOUBLE / (tp + fp) * 1000000.0) / 1000000.0 END AS precision,
           |  CASE WHEN tp + fn > 0 THEN round(tp::DOUBLE / (tp + fn) * 1000000.0) / 1000000.0 END AS recall,
           |  CASE WHEN 2*tp + fp + fn > 0 THEN round(2.0*tp / (2*tp + fp + fn) * 1000000.0) / 1000000.0 END AS f1
           |FROM ag ORDER BY f1 DESC NULLS LAST, threshold LIMIT 1""".stripMargin
      }),

    // ---- Wilson 95% intervals per experiment variant: the
    // small-sample-safe CI readout next to q188's z test.
    Q("q251_wilson_ci",
      (s, d) => graft.operators.EventOps.wilsonIntervals(
        graft.operators.EventOps.abConversion(
          Tables.events(s, d), pmod(col("user_id"), lit(2L)),
          col("event_type") === "purchase" && col("value") > 80.0)),
      Some("""WITH e AS (SELECT user_id % 2 AS variant, user_id,
             |      (event_type = 'purchase' AND value > 80.0) AS cv FROM events),
             |x AS (SELECT variant, count(DISTINCT user_id) AS n FROM e GROUP BY variant),
             |c AS (SELECT variant, count(DISTINCT user_id) AS k FROM e
             |      WHERE cv GROUP BY variant),
             |t AS (SELECT x.variant, CAST(n AS BIGINT) AS n,
             |        CAST(coalesce(k, 0) AS BIGINT) AS k
             |      FROM x LEFT JOIN c USING (variant)),
             |w AS (SELECT variant, n, k,
             |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             |    1.96 * 1.96 AS z2, 1.96 AS z FROM t)
             |SELECT variant, n, k,
             |  round(p * 1000000.0) / 1000000.0 AS rate,
             |  round((p + z2 / (2.0 * CAST(n AS DOUBLE))
             |    - z * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
             |               + z2 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             |    / (1.0 + z2 / CAST(n AS DOUBLE)) * 1000000.0) / 1000000.0 AS lo95,
             |  round((p + z2 / (2.0 * CAST(n AS DOUBLE))
             |    + z * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
             |               + z2 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             |    / (1.0 + z2 / CAST(n AS DOUBLE)) * 1000000.0) / 1000000.0 AS hi95
             |FROM w ORDER BY variant""".stripMargin)),

    // ---- MinHash ACCURACY against exact Jaccard: a 16-slot PORTABLE
    // (md5) MinHash signature's estimate vs the true Jaccard on the
    // verified q22 pairs — measures the sketch's error, fully oracled
    // because the hash is the engine-portable md5Hash60.
    Q("q252_minhash_accuracy",
      (s, d) => {
        val docs = t(s, d, "documents")
        val slots = 0 until 16
        val ex = docs.select(col("doc_id"),
          explode(Dedup.shingles(col("text"), 3)).as("sh"))
        val aggs = slots.map(i => min(graft.expressions.PortableHash
          .md5Hash60(concat(lit(s"$i:"), col("sh")))).as(s"m$i"))
        val sig = ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
        val matches = slots.map(i =>
          when(col(s"ma.m$i") === col(s"mb.m$i"), 1L).otherwise(0L))
          .reduce(_ + _)
        Dedup.shingleJaccardPairs(docs, 0.5)
          .join(sig.as("ma"), col("id_a") === col("ma.doc_id"))
          .join(sig.as("mb"), col("id_b") === col("mb.doc_id"))
          .select(col("id_a"), col("id_b"), col("jaccard"),
            (matches.cast("double") / lit(16.0)).as("est"),
            (round((matches.cast("double") / lit(16.0) - col("jaccard"))
              * 1000000.0) / 1000000.0).as("err"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS s
             |       FROM ws WHERE len(w) >= 3),
             |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2),
             |pr AS (SELECT ia, ib,
             |    round((i::DOUBLE / (ca.n + cb.n - i)) * 1000000.0) / 1000000.0 AS jaccard
             |  FROM inter JOIN cnt ca ON ca.doc_id = ia JOIN cnt cb ON cb.doc_id = ib
             |  WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5),
             |mh AS (SELECT doc_id, slot,
             |    min(CAST('0x' || substr(md5(CAST(slot AS VARCHAR) || ':' || s), 1, 15) AS BIGINT)) AS m
             |  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS slot)
             |  GROUP BY doc_id, slot),
             |ag AS (SELECT p.ia, p.ib, p.jaccard,
             |    sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS matches
             |  FROM pr p JOIN mh a ON a.doc_id = p.ia
             |  JOIN mh b ON b.doc_id = p.ib AND b.slot = a.slot
             |  GROUP BY 1, 2, 3)
             |SELECT ia AS id_a, ib AS id_b, jaccard,
             |  CAST(matches AS DOUBLE) / 16.0 AS est,
             |  round((CAST(matches AS DOUBLE) / 16.0 - jaccard) * 1000000.0)
             |    / 1000000.0 AS err
             |FROM ag ORDER BY id_a, id_b""".stripMargin)),

    // ---- PII density per source over the q88 synthetic-PII corpus:
    // hits per 1000 tokens by kind — the compliance heat map.
    Q("q253_pii_density",
      (s, d) => {
        val aug = t(s, d, "documents").select(col("doc_id"), col("source"),
          concat(col("text"),
            lit(" contact u"), col("doc_id"), lit("@ex"),
            pmod(col("doc_id"), lit(5)), lit(".com tel 555-123-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" ip 10.0."), pmod(col("doc_id"), lit(256)), lit("."),
            pmod(col("doc_id") * 7, lit(256))).as("text"))
        def dens(c: org.apache.spark.sql.Column) =
          round(c.cast("double") * 1000.0 /
            col("toks").cast("double") * 10000.0) / 10000.0
        aug.select(col("source"),
          size(split(col("text"), " ")).cast("long").as("tk"),
          graft.operators.TextAnalysis.piiCount(col("text"), "email")
            .cast("long").as("em"),
          graft.operators.TextAnalysis.piiCount(col("text"), "phone")
            .cast("long").as("ph"),
          graft.operators.TextAnalysis.piiCount(col("text"), "ipv4")
            .cast("long").as("ip"))
          .groupBy("source")
          .agg(sum(col("tk")).as("toks"), sum(col("em")).as("n_email"),
            sum(col("ph")).as("n_phone"), sum(col("ip")).as("n_ipv4"))
          .select(col("source"), col("toks"), col("n_email"),
            col("n_phone"), col("n_ipv4"),
            dens(col("n_email")).as("email_per_1k"),
            dens(col("n_phone")).as("phone_per_1k"),
            dens(col("n_ipv4")).as("ipv4_per_1k"))
          .orderBy("source")
      },
      Some("""WITH aug AS (SELECT source,
             |    text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex'
             |      || CAST(doc_id % 5 AS VARCHAR) || '.com tel 555-123-'
             |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |      || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
             |      || CAST((doc_id * 7) % 256 AS VARCHAR) AS text
             |  FROM documents),
             |pd AS (SELECT source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tk,
             |    CAST(len(regexp_extract_all(text,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS em,
             |    CAST(len(regexp_extract_all(text, '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS ph,
             |    CAST(len(regexp_extract_all(text,
             |      '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS ip
             |  FROM aug),
             |g AS (SELECT source, sum(tk) AS toks, sum(em) AS n_email,
             |    sum(ph) AS n_phone, sum(ip) AS n_ipv4 FROM pd GROUP BY source)
             |SELECT source, CAST(toks AS BIGINT) AS toks,
             |  CAST(n_email AS BIGINT) AS n_email,
             |  CAST(n_phone AS BIGINT) AS n_phone,
             |  CAST(n_ipv4 AS BIGINT) AS n_ipv4,
             |  round(CAST(n_email AS DOUBLE) * 1000.0 / CAST(toks AS DOUBLE)
             |    * 10000.0) / 10000.0 AS email_per_1k,
             |  round(CAST(n_phone AS DOUBLE) * 1000.0 / CAST(toks AS DOUBLE)
             |    * 10000.0) / 10000.0 AS phone_per_1k,
             |  round(CAST(n_ipv4 AS DOUBLE) * 1000.0 / CAST(toks AS DOUBLE)
             |    * 10000.0) / 10000.0 AS ipv4_per_1k
             |FROM g ORDER BY source""".stripMargin)),

    // ---- basket-size dispersion: lineitems-per-order mean, variance,
    // and the variance/mean index (1 = Poisson; >1 = clumped demand).
    Q("q254_basket_dispersion",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val c = t(s, d, "lineitem").groupBy("l_orderkey")
          .agg(count(lit(1)).as("c"))
        val agg = c.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("c")).cast(dec).as("s"),
          sum(col("c").cast(dec) * col("c").cast(dec)).as("ss"))
        val nD = col("n").cast("double")
        val mean = col("s").cast("double") / nD
        val varE = (col("ss").cast("double") - col("s").cast("double") *
          col("s").cast("double") / nD) / nD
        agg.select(col("n").cast("long").as("n_orders"),
          (round(mean * 1000000.0) / 1000000.0).as("mean_items"),
          (round(varE * 1000000.0) / 1000000.0).as("var_items"),
          (round(varE / mean * 1000000.0) / 1000000.0).as("dispersion"))
      },
      Some("""WITH c AS (SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY 1),
             |g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(c) AS HUGEINT) AS s,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ss FROM c)
             |SELECT CAST(n AS BIGINT) AS n_orders,
             |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS mean_items,
             |  round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |    / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS var_items,
             |  round(((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |    / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             |    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0)
             |    / 1000000.0 AS dispersion
             |FROM g""".stripMargin)),

    // ---- k-core of the thresholded nation-trade graph: the maximal
    // subgraph where every nation keeps >= k above-average trade links —
    // the "core market" membership question. FIXED 5 synchronous peel
    // rounds on both engines (the round count is the contract; equal
    // rounds agree whether or not the fixpoint was hit).
    Q("q255_kcore",
      (s, d) => graft.operators.GraphOps
        .kCorePeel(tradeEdges(s, d), k = 3, rounds = 5)
        .orderBy("node"),
      Some {
        val peel = (1 to 5).map { r =>
          s"""d$r AS (SELECT u AS node, count(*) AS d FROM sym
             |  JOIN a${r - 1} x ON sym.u = x.node
             |  JOIN a${r - 1} y ON sym.v = y.node GROUP BY u),
             |a$r AS (SELECT node FROM d$r WHERE d >= 3)""".stripMargin
        }.mkString(",\n")
        s"""WITH $tradeEdgeCtes,
           |sym AS (SELECT a AS u, b AS v FROM ed UNION ALL SELECT b, a FROM ed),
           |a0 AS (SELECT DISTINCT u AS node FROM sym),
           |$peel
           |SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree FROM sym
           |JOIN a5 x ON sym.u = x.node JOIN a5 y ON sym.v = y.node
           |GROUP BY u ORDER BY node""".stripMargin
      }),

    // ---- Adamic-Adar link prediction on the same graph: for trade-pairs
    // NOT yet linked above-average, the classic next-link score
    // sum(1/ln deg z) over common neighbors z — "which corridors open
    // next". Hub-degree bound comes from the edge thresholding (the
    // operator's documented contract).
    Q("q256_link_prediction",
      (s, d) => graft.operators.GraphOps.adamicAdar(tradeEdges(s, d))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $tradeEdgeCtes,
             |sym AS (SELECT a AS z, b AS n FROM ed UNION ALL SELECT b, a FROM ed),
             |deg AS (SELECT z, count(*) AS deg FROM sym GROUP BY z),
             |w AS (SELECT e1.n AS id_a, e2.n AS id_b, d.deg AS dz
             |      FROM sym e1 JOIN sym e2 ON e1.z = e2.z AND e1.n < e2.n
             |      JOIN deg d ON d.z = e1.z),
             |nw AS (SELECT w.* FROM w LEFT JOIN ed
             |       ON ed.a = w.id_a AND ed.b = w.id_b WHERE ed.a IS NULL)
             |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS common,
             |  round(sum(1.0 / ln(CAST(dz AS DOUBLE))) * 1000000.0)
             |    / 1000000.0 AS aa_score
             |FROM nw GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin)),

    // ---- Mann-Whitney U: does order value distribute differently
    // between the BUILDING and MACHINERY customer segments? Rank-sum
    // with tie-averaged ranks + tie-corrected normal z — the
    // distribution-free AB answer when means lie (heavy tails). Exact
    // integer rank algebra; the only doubles are the final z chain.
    Q("q257_mann_whitney",
      (s, d) => graft.operators.Stats.mannWhitneyU(
        t(s, d, "orders")
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .where(col("c_mktsegment").isin("BUILDING", "MACHINERY")),
        col("o_totalprice"), col("c_mktsegment") === "BUILDING"),
      Some("""WITH g AS (SELECT CAST(o_totalprice AS DOUBLE) AS v,
             |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
             |d AS (SELECT v, CAST(sum(g1) AS HUGEINT) AS n1v,
             |    CAST(count(*) AS HUGEINT) AS tv FROM g GROUP BY v),
             |c AS (SELECT *, coalesce(sum(tv) OVER (ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
             |  FROM d),
             |a AS (SELECT sum(n1v) AS n1, sum(tv) - sum(n1v) AS n2,
             |    sum(n1v * (2 * cumb + tv + 1)) AS r1x2,
             |    sum(tv * tv * tv - tv) AS ties FROM c)
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |  CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
             |  round((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)
             |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             |    / (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
             |      * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
             |        - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
             |          * (CAST(n1 + n2 AS DOUBLE) - 1.0)))))
             |    * 1000000.0) / 1000000.0 AS z
             |FROM a""".stripMargin)),

    // ---- one-way ANOVA: does source explain token count? Between/
    // within variance decomposition with exact integer sufficient sums;
    // F and effect size eta-squared — the "is this corpus partition
    // real" gate before any per-source policy.
    Q("q258_anova_f",
      (s, d) => graft.operators.Stats.oneWayAnova(t(s, d, "documents"),
        col("source"), size(split(col("text"), " "))),
      Some("""WITH v AS (SELECT source AS g,
             |    CAST(len(string_split(text, ' ')) AS HUGEINT) AS v
             |  FROM documents),
             |pg AS (SELECT g, CAST(count(*) AS HUGEINT) AS n_g,
             |    sum(v) AS s_g, sum(v * v) AS ss_g FROM v GROUP BY g),
             |a AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(n_g) AS n,
             |    sum(s_g) AS s, sum(ss_g) AS ss,
             |    sum(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
             |      / CAST(n_g AS DOUBLE)) AS sb FROM pg)
             |SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_rows,
             |  round((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |    / CAST(n AS DOUBLE)) * 100.0) / 100.0 AS ssb,
             |  round((CAST(ss AS DOUBLE) - sb) * 100.0) / 100.0 AS sse,
             |  round(((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
             |    / ((CAST(ss AS DOUBLE) - sb)
             |      / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS f_stat,
             |  round((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |      / CAST(n AS DOUBLE))
             |    / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |      / CAST(n AS DOUBLE))
             |    * 1000000.0) / 1000000.0 AS eta_sq
             |FROM a""".stripMargin)),

    // ---- dyadic EWMA (alpha = 1/2, 20-lag truncation) over the dense
    // daily event series + one-step-ahead forecast error: the
    // deterministic member of the EWMA family (every weight a power of
    // two -> the scaled convolution is an exact integer sum; no float
    // pow, no window accumulation-order sensitivity).
    Q("q259_ewma_smooth",
      (s, d) => graft.operators.EventOps.ewmaSmooth(Tables.events(s, d))
        .orderBy("day"),
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |cv AS (SELECT a.day, count(*) AS m,
             |    sum(CAST(l.c AS HUGEINT) * (CAST(1 AS HUGEINT) << (19 - lg.j))) AS scaled
             |  FROM dn a CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS j) lg
             |  JOIN dn l ON l.day = a.day - lg.j
             |  GROUP BY a.day),
             |em AS (SELECT day, CAST(scaled AS DOUBLE) / 1048575.0 AS ewma
             |  FROM cv WHERE m = 20)
             |SELECT d.day, d.c,
             |  round(e.ewma * 1000000.0) / 1000000.0 AS ewma,
             |  round(abs(CAST(d.c AS DOUBLE) - p.ewma) * 1000000.0)
             |    / 1000000.0 AS forecast_abs_err
             |FROM dn d JOIN em p ON p.day = d.day - 1 JOIN em e ON e.day = d.day
             |ORDER BY d.day""".stripMargin)),

    // ---- MMR diversified retrieval: greedy rel-minus-max-sim selection
    // of 5 from the exact top-20 pool of query 0 (lambda = 1/2). All
    // comparisons in integer micro-units, so the greedy path is
    // engine-independent; the oracle unrolls the 5 rounds as CTEs.
    Q("q260_mmr_rerank",
      (s, d) => graft.operators.Similarity
        .mmrRerank(t(s, d, "embeddings"), 0L, poolK = 20, selectK = 5),
      Some {
        val rounds = (2 to 5).map { r =>
          s"""c$r AS (SELECT p.vec_id, p.rel_u, max(pp.sim_u) AS maxsim_u
             |  FROM pool p JOIN pp ON pp.ia = p.vec_id
             |  WHERE pp.ib IN (SELECT vec_id FROM sel${r - 1})
             |    AND p.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
             |  GROUP BY 1, 2),
             |s$r AS (SELECT vec_id, rel_u, maxsim_u FROM c$r
             |  ORDER BY rel_u - maxsim_u DESC, vec_id LIMIT 1),
             |sel$r AS (SELECT vec_id FROM sel${r - 1}
             |  UNION ALL SELECT vec_id FROM s$r)""".stripMargin
        }.mkString(",\n")
        val out = (1 to 5).map(r =>
          s"""SELECT $r AS rnk, vec_id, CAST(rel_u AS DOUBLE) / 1000000.0 AS rel,
             |  CAST(maxsim_u AS DOUBLE) / 1000000.0 AS max_sim_sel,
             |  CAST(rel_u - maxsim_u AS DOUBLE) / 1000000.0 AS mmr FROM s$r"""
            .stripMargin).mkString("\nUNION ALL\n")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |pool AS (SELECT vec_id,
           |    CAST(round(list_cosine_similarity(v, qv) * 1000000.0) AS BIGINT) AS rel_u, v
           |  FROM e, q WHERE vec_id <> 0
           |  ORDER BY rel_u DESC, vec_id LIMIT 20),
           |pp AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
           |    CAST(round(list_cosine_similarity(a.v, b.v) * 1000000.0) AS BIGINT) AS sim_u
           |  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
           |s1 AS (SELECT vec_id, rel_u, CAST(0 AS BIGINT) AS maxsim_u
           |  FROM pool ORDER BY rel_u DESC, vec_id LIMIT 1),
           |sel1 AS (SELECT vec_id FROM s1),
           |$rounds
           |SELECT * FROM ($out) ORDER BY rnk""".stripMargin
      }),

    // ---- rendezvous (HRW) sharding stability: per-shard doc counts at
    // 8 and at 9 shards, plus how many docs moved INTO each shard when
    // shard 8 was added — the HRW guarantee says only the new shard
    // receives movers (~1/9 of the corpus), vs (n-1)/n for mod-hashing.
    Q("q261_rendezvous_shard",
      (s, d) => {
        val a = t(s, d, "documents").select(
          graft.operators.Layout.rendezvousShard(col("doc_id"), 8).as("a8"),
          graft.operators.Layout.rendezvousShard(col("doc_id"), 9).as("a9"))
        val g8 = a.groupBy(col("a8").as("shard"))
          .agg(count(lit(1)).as("n8"))
        val g9 = a.groupBy(col("a9").as("shard"))
          .agg(count(lit(1)).as("n9"),
            sum(when(col("a8") =!= col("a9"), 1L).otherwise(0L)).as("mv"))
        s.range(9).select(col("id").as("shard"))
          .join(g8, Seq("shard"), "left").join(g9, Seq("shard"), "left")
          .select(col("shard"),
            coalesce(col("n8"), lit(0L)).cast("long").as("n_8shards"),
            coalesce(col("n9"), lit(0L)).cast("long").as("n_9shards"),
            coalesce(col("mv"), lit(0L)).cast("long").as("moved_in"))
          .orderBy("shard")
      },
      Some("""WITH h AS (SELECT doc_id, sh.s AS s,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
             |      || CAST(sh.s AS VARCHAR)), 1, 15)) AS BIGINT) AS h
             |  FROM documents CROSS JOIN (SELECT unnest(range(0, 9)) AS s) sh),
             |a AS (SELECT doc_id, arg_max(s, h) FILTER (WHERE s < 8) AS a8,
             |    arg_max(s, h) AS a9 FROM h GROUP BY doc_id),
             |g8 AS (SELECT a8 AS shard, count(*) AS n8 FROM a GROUP BY 1),
             |g9 AS (SELECT a9 AS shard, count(*) AS n9,
             |    sum(CASE WHEN a8 <> a9 THEN 1 ELSE 0 END) AS mv
             |  FROM a GROUP BY 1)
             |SELECT r.shard, CAST(coalesce(n8, 0) AS BIGINT) AS n_8shards,
             |  CAST(coalesce(n9, 0) AS BIGINT) AS n_9shards,
             |  CAST(coalesce(mv, 0) AS BIGINT) AS moved_in
             |FROM (SELECT unnest(range(0, 9)) AS shard) r
             |LEFT JOIN g8 USING (shard) LEFT JOIN g9 USING (shard)
             |ORDER BY r.shard""".stripMargin)),

    // ---- Johnson-Lindenstrauss distortion audit: 64 -> 16 dims via the
    // literal +-1 sign matrix (md5 parity, baked into BOTH plans at
    // build time), squared-distance ratios over the vec_id < 40 audit
    // prefix. Index-ordered folds on both engines keep every double
    // bit-identical before the display rounding.
    Q("q262_jl_distortion",
      (s, d) => graft.operators.Similarity
        .jlDistortion(t(s, d, "embeddings"), m = 16, auditIds = 40),
      Some {
        import graft.operators.Similarity.jlSign
        val yCols = (0 until 16).map { j =>
          (0 until 64).map(i => s"v[${i + 1}] * (${jlSign(i, j)}.0)")
            .mkString(" + ") + s" AS y$j"
        }.mkString(",\n    ")
        val dx = (0 until 64).map(i =>
          s"(a.v[${i + 1}] - b.v[${i + 1}]) * (a.v[${i + 1}] - b.v[${i + 1}])")
          .mkString(" + ")
        val dy = (0 until 16).map(j =>
          s"(a.y$j - b.y$j) * (a.y$j - b.y$j)").mkString(" + ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
           |  FROM embeddings WHERE vec_id < 40),
           |p AS (SELECT vec_id, v,
           |    $yCols
           |  FROM e),
           |pr AS (SELECT ($dx) AS dx, ($dy) AS dy
           |  FROM p a JOIN p b ON a.vec_id < b.vec_id),
           |r AS (SELECT dy / (16.0 * dx) AS ratio FROM pr WHERE dx > 0.0)
           |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           |  round(avg(ratio) * 1000000.0) / 1000000.0 AS avg_ratio,
           |  round(min(ratio) * 1000000.0) / 1000000.0 AS min_ratio,
           |  round(max(ratio) * 1000000.0) / 1000000.0 AS max_ratio,
           |  round(sum(CASE WHEN ratio >= 0.5 AND ratio <= 2.0 THEN 1 ELSE 0 END)::DOUBLE
           |    / count(*)::DOUBLE * 1000000.0) / 1000000.0 AS frac_within_2x
           |FROM r""".stripMargin
      }),

    // ---- HITS hubs/authorities on the DIRECTED thresholded trade graph
    // (customer-nation -> supplier-nation): who concentrates demand
    // (hubs) vs supply (authorities). 8 fixed rounds, integer-billionth
    // max-normalization — exact sums, one correctly-rounded double op
    // per rescale, so the oracle unrolls bit-identically.
    Q("q263_hits",
      (s, d) => graft.operators.GraphOps.hits(tradeEdges(s, d), rounds = 8)
        .orderBy("node"),
      Some {
        val rounds = (1 to 8).map { r =>
          s"""ar$r AS MATERIALIZED (SELECT e.dst AS node, sum(h.v) AS s FROM ed2 e
             |  JOIN h${r - 1} h ON h.node = e.src GROUP BY 1),
             |am$r AS (SELECT max(s) AS m FROM ar$r),
             |a$r AS MATERIALIZED (SELECT n.node, CAST(round(CAST(coalesce(x.s, 0) AS DOUBLE)
             |    / CAST(am$r.m AS DOUBLE) * 1000000000.0) AS BIGINT) AS v
             |  FROM nodes n LEFT JOIN ar$r x ON x.node = n.node CROSS JOIN am$r),
             |hr$r AS MATERIALIZED (SELECT e.src AS node, sum(a.v) AS s FROM ed2 e
             |  JOIN a$r a ON a.node = e.dst GROUP BY 1),
             |hm$r AS (SELECT max(s) AS m FROM hr$r),
             |h$r AS MATERIALIZED (SELECT n.node, CAST(round(CAST(coalesce(x.s, 0) AS DOUBLE)
             |    / CAST(hm$r.m AS DOUBLE) * 1000000000.0) AS BIGINT) AS v
             |  FROM nodes n LEFT JOIN hr$r x ON x.node = n.node CROSS JOIN hm$r)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH $tradeEdgeCtes,
           |ed2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM th WHERE src <> dst),
           |nodes AS MATERIALIZED (SELECT src AS node FROM ed2 UNION SELECT dst FROM ed2),
           |h0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS v FROM nodes),
           |$rounds
           |SELECT n.node, CAST(coalesce(a8.v, 0) AS DOUBLE) / 1000000000.0 AS auth,
           |  CAST(coalesce(h8.v, 0) AS DOUBLE) / 1000000000.0 AS hub
           |FROM nodes n LEFT JOIN a8 ON a8.node = n.node
           |LEFT JOIN h8 ON h8.node = n.node ORDER BY n.node""".stripMargin
      }),

    // ---- TextRank keywords: per-doc PageRank over adjacent-token
    // graphs, every sampled doc iterated simultaneously as one keyed
    // relation. Integer-millionth ranks -> the 5 damped rounds unroll
    // exactly; top-3 per doc.
    Q("q264_textrank",
      (s, d) => graft.operators.TextRank.keywords(
        t(s, d, "documents").where(col("doc_id") % 25 === 0),
        rounds = 5, topK = 3)
        .orderBy("doc_id", "pos"),
      Some {
        val rounds = (1 to 5).map { r =>
          s"""c$r AS (SELECT s.doc_id, s.v AS w, sum(rr.r // d.deg) AS c
             |  FROM sym s JOIN dg d ON d.doc_id = s.doc_id AND d.u = s.u
             |  JOIN r${r - 1} rr ON rr.doc_id = s.doc_id AND rr.w = s.u
             |  GROUP BY 1, 2),
             |r$r AS (SELECT doc_id, w,
             |  CAST(round(150000.0 + 0.85 * CAST(c AS DOUBLE)) AS BIGINT) AS r
             |  FROM c$r)""".stripMargin
        }.mkString(",\n")
        s"""WITH pl AS (SELECT doc_id, string_split(text, ' ') AS t
           |  FROM documents WHERE doc_id % 25 = 0),
           |pr AS (SELECT doc_id,
           |    unnest([{'a': t[i], 'b': t[i + 1]} for i in range(1, len(t))]) AS p
           |  FROM pl WHERE len(t) >= 2),
           |ed AS (SELECT DISTINCT doc_id, least(p.a, p.b) AS wa,
           |    greatest(p.a, p.b) AS wb FROM pr WHERE p.a <> p.b),
           |sym AS (SELECT doc_id, wa AS u, wb AS v FROM ed
           |  UNION ALL SELECT doc_id, wb, wa FROM ed),
           |dg AS (SELECT doc_id, u, count(*) AS deg FROM sym GROUP BY 1, 2),
           |r0 AS (SELECT doc_id, u AS w, CAST(1000000 AS BIGINT) AS r FROM dg),
           |$rounds
           |SELECT doc_id, CAST(pos AS BIGINT) AS pos, w,
           |  CAST(r AS DOUBLE) / 1000000.0 AS score
           |FROM (SELECT doc_id, w, r, row_number() OVER
           |    (PARTITION BY doc_id ORDER BY r DESC, w) AS pos FROM r5)
           |WHERE pos <= 3 ORDER BY doc_id, pos""".stripMargin
      },
      bench = true),

    // ---- interpolated Kneser-Ney bigram LM: fit on 90% of docs, score
    // the held-out 10% — continuation-count smoothing, the model-free
    // held-out-perplexity quality signal. OOV bigrams counted, not
    // imputed.
    Q("q265_kneser_ney",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.KneserNey.bigramScore(
          docs.where(col("doc_id") % 10 =!= 0),
          docs.where(col("doc_id") % 10 === 0))
      },
      Some("""WITH trt AS (SELECT string_split(text, ' ') AS t
             |  FROM documents WHERE doc_id % 10 <> 0),
             |trp AS (SELECT unnest([{'a': t[i], 'b': t[i + 1]}
             |    for i in range(1, len(t))]) AS p FROM trt WHERE len(t) >= 2),
             |trb AS (SELECT p.a AS v, p.b AS w FROM trp),
             |cvw AS (SELECT v, w, count(*) AS cvw FROM trb GROUP BY 1, 2),
             |cv AS (SELECT v, sum(cvw) AS cv, count(*) AS n1fwd
             |  FROM cvw GROUP BY 1),
             |nb AS (SELECT w, count(*) AS n1back FROM cvw GROUP BY 1),
             |bt AS (SELECT count(*) AS b_types FROM cvw),
             |tet AS (SELECT string_split(text, ' ') AS t
             |  FROM documents WHERE doc_id % 10 = 0),
             |tep AS (SELECT unnest([{'a': t[i], 'b': t[i + 1]}
             |    for i in range(1, len(t))]) AS p FROM tet WHERE len(t) >= 2),
             |teb AS (SELECT p.a AS v, p.b AS w FROM tep),
             |sc AS (SELECT teb.v, teb.w, cv.cv, cv.n1fwd, nb.n1back,
             |    cvw.cvw, bt.b_types
             |  FROM teb LEFT JOIN cv ON cv.v = teb.v
             |  LEFT JOIN nb ON nb.w = teb.w
             |  LEFT JOIN cvw ON cvw.v = teb.v AND cvw.w = teb.w
             |  CROSS JOIN bt),
             |lps AS (SELECT b_types, CASE WHEN cv IS NOT NULL
             |    AND n1back IS NOT NULL THEN
             |    log2(greatest(CAST(coalesce(cvw, 0) AS DOUBLE) - 0.75, 0.0)
             |        / CAST(cv AS DOUBLE)
             |      + 0.75 * CAST(n1fwd AS DOUBLE) / CAST(cv AS DOUBLE)
             |        * (CAST(n1back AS DOUBLE) / CAST(b_types AS DOUBLE)))
             |  END AS lp FROM sc)
             |SELECT CAST(max(b_types) AS BIGINT) AS n_bigram_types,
             |  CAST(sum(CASE WHEN lp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_scored,
             |  CAST(sum(CASE WHEN lp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_skipped_oov,
             |  round(avg(lp) * 1000000.0) / 1000000.0 AS avg_log2p,
             |  round(pow(2.0, -avg(lp)) * 10000.0) / 10000.0 AS perplexity
             |FROM lps""".stripMargin),
      bench = true),

    // ---- Poisson-bootstrap 90% CI for mean order value on the 5%
    // keyed sample: weight ~ Poisson(1) inverted DETERMINISTICALLY from
    // md5(key@replicate)/2^60 against literal CDF constants shared with
    // the oracle — one distributed pass, no RNG state, replayable draws.
    Q("q266_bootstrap_ci",
      (s, d) => graft.operators.Stats.poissonBootstrapMean(
        t(s, d, "orders").where(col("o_orderkey") % 20 === 0),
        col("o_orderkey"), col("o_totalprice")),
      Some {
        val cdf = graft.operators.Stats.PoissonCdf
        val cases = cdf.zipWithIndex.map { case (c, i) =>
          s"WHEN CAST(h AS DOUBLE) / 1152921504606846976.0 < $c THEN $i"
        }.mkString("\n             ")
        s"""WITH base AS (SELECT CAST(o_orderkey AS VARCHAR) AS k,
           |    CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT) AS cents
           |  FROM orders WHERE o_orderkey % 20 = 0),
           |pt AS (SELECT CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           |    / 100.0 AS pm FROM base),
           |rep AS (SELECT bb.b, base.cents,
           |    CAST(('0x' || substr(md5(base.k || '@' || CAST(bb.b AS VARCHAR)),
           |      1, 15)) AS BIGINT) AS h
           |  FROM base CROSS JOIN (SELECT unnest(range(0, 100)) AS b) bb),
           |wts AS (SELECT b, cents, CASE
           |    $cases
           |    ELSE 5 END AS w FROM rep),
           |g AS (SELECT b, sum(CAST(w AS HUGEINT) * CAST(cents AS HUGEINT)) AS ws,
           |    sum(w) AS wc FROM wts GROUP BY b),
           |m AS (SELECT b, CAST(ws AS DOUBLE) / CAST(wc AS DOUBLE) / 100.0 AS m
           |  FROM g WHERE wc > 0),
           |rk AS (SELECT b, m, row_number() OVER (ORDER BY m, b) AS rk,
           |    row_number() OVER (ORDER BY m DESC, b DESC) AS rd FROM m),
           |ci AS (SELECT CAST(count(*) AS BIGINT) AS n_boot,
           |    max(CASE WHEN rk = (rk + rd + 18) // 20 THEN m END) AS lo,
           |    max(CASE WHEN rd = (rk + rd + 18) // 20 THEN m END) AS hi
           |  FROM rk)
           |SELECT n_boot, round(pm * 10000.0) / 10000.0 AS point_mean,
           |  round(lo * 10000.0) / 10000.0 AS lo90,
           |  round(hi * 10000.0) / 10000.0 AS hi90
           |FROM ci, pt""".stripMargin
      }),

    // ---- unpivot (melt): the q35 pivot's inverse as a first-class
    // relational op — wide per-source language counts back to tidy
    // (source, lang, n) via Dataset.unpivot (one projection, no shuffle
    // beyond the aggregation that built the wide frame).
    Q("q267_unpivot_melt",
      (s, d) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val aggs = langs.map(l =>
          sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"n_$l"))
        val wide = t(s, d, "documents").groupBy("source")
          .agg(aggs.head, aggs.tail: _*)
        wide.unpivot(Array(col("source")),
            langs.map(l => col(s"n_$l")).toArray, "lang", "n")
          .withColumn("lang", expr("substring(lang, 3)"))
          .orderBy("source", "lang")
      },
      Some {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val wideCols = langs.map(l =>
          s"sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS n_$l")
          .mkString(", ")
        val arms = langs.map(l =>
          s"SELECT source, '$l' AS lang, CAST(n_$l AS BIGINT) AS n FROM w")
          .mkString("\nUNION ALL ")
        s"""WITH w AS (SELECT source, $wideCols FROM documents GROUP BY source)
           |SELECT * FROM ($arms) ORDER BY source, lang""".stripMargin
      }),

    // ---- BLEU-2 over the verified Jaccard>=0.5 near-dup pairs:
    // order-sensitive clipped-precision overlap + brevity penalty —
    // separates reordered-vocabulary twins from true sequence copies.
    Q("q268_bleu_pairs",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.Bleu.bleu2Pairs(docs,
          Dedup.shingleJaccardPairs(docs, 0.5)
            .select(col("id_a"), col("id_b")))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |         [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])) AS s
             |       FROM ws WHERE len(t) >= 3),
             |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2),
             |pr AS (SELECT ia, ib FROM inter
             |  JOIN cnt ca ON ca.doc_id = ia JOIN cnt cb ON cb.doc_id = ib
             |  WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5),
             |uni AS (SELECT doc_id, g, count(*) AS c FROM
             |  (SELECT doc_id, unnest(t) AS g FROM ws) GROUP BY 1, 2),
             |bi AS (SELECT doc_id, g, count(*) AS c FROM
             |  (SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
             |     for i in range(1, len(t))]) AS g FROM ws WHERE len(t) >= 2)
             |  GROUP BY 1, 2),
             |lens AS (SELECT doc_id, len(t) AS tot1,
             |    greatest(len(t) - 1, 0) AS tot2 FROM ws),
             |c1 AS (SELECT p.ia, p.ib, sum(least(cu.c, ru.c)) AS clip1
             |  FROM pr p JOIN uni cu ON cu.doc_id = p.ib
             |  JOIN uni ru ON ru.doc_id = p.ia AND ru.g = cu.g GROUP BY 1, 2),
             |c2 AS (SELECT p.ia, p.ib, sum(least(cb.c, rb.c)) AS clip2
             |  FROM pr p JOIN bi cb ON cb.doc_id = p.ib
             |  JOIN bi rb ON rb.doc_id = p.ia AND rb.g = cb.g GROUP BY 1, 2),
             |f AS (SELECT p.ia, p.ib,
             |    CAST(coalesce(c1.clip1, 0) AS DOUBLE) / CAST(lc.tot1 AS DOUBLE) AS p1,
             |    CASE WHEN lc.tot2 > 0 THEN
             |      CAST(coalesce(c2.clip2, 0) AS DOUBLE) / CAST(lc.tot2 AS DOUBLE)
             |      ELSE 0.0 END AS p2,
             |    least(1.0, exp(1.0 - CAST(lr.tot1 AS DOUBLE)
             |      / CAST(lc.tot1 AS DOUBLE))) AS bp
             |  FROM pr p JOIN lens lc ON lc.doc_id = p.ib
             |  JOIN lens lr ON lr.doc_id = p.ia
             |  LEFT JOIN c1 ON c1.ia = p.ia AND c1.ib = p.ib
             |  LEFT JOIN c2 ON c2.ia = p.ia AND c2.ib = p.ib)
             |SELECT ia AS id_a, ib AS id_b,
             |  round(p1 * 1000000.0) / 1000000.0 AS p1,
             |  round(p2 * 1000000.0) / 1000000.0 AS p2,
             |  round(bp * 1000000.0) / 1000000.0 AS bp,
             |  round(bp * sqrt(p1 * p2) * 1000000.0) / 1000000.0 AS bleu2
             |FROM f ORDER BY id_a, id_b""".stripMargin)),

    // ---- Markov entropy rate of the session chain: H = -sum_i pi_i
    // sum_j p_ij ln p_ij with the q240 quantized stationary pi and the
    // exact-count transition probabilities — how predictable the next
    // event is, in one scalar (plus the ln(k)-normalized efficiency).
    Q("q269_entropy_rate",
      (s, d) => {
        val ev = Tables.events(s, d)
        val st = graft.operators.EventOps.stationaryDistribution(ev, 30)
        val tm = graft.operators.EventOps.transitionMatrix(ev)
        val tot = tm.groupBy("from_type").agg(sum("n").as("tot"))
        val pij = col("n").cast("double") / col("tot").cast("double")
        val h = tm.join(broadcast(tot), Seq("from_type"))
          .join(broadcast(st.select(col("state").as("from_type"),
            col("prob_q"))), Seq("from_type"))
          .agg(sum((col("prob_q") / lit(1000000000.0)) * pij * log(pij))
            .as("hs"))
        val ns = st.agg(count(lit(1)).as("k"))
        h.join(broadcast(ns)).select(
          col("k").cast("long").as("n_states"),
          (round(-col("hs") * 1000000.0) / 1000000.0).as("entropy_nats"),
          (round(-col("hs") / log(lit(2.0)) * 1000000.0) / 1000000.0)
            .as("entropy_bits"),
          (round(-col("hs") / log(col("k").cast("double")) * 1000000.0)
            / 1000000.0).as("efficiency"))
      },
      Some(s"""$stationaryCtePrefix,
           |hx AS (SELECT sum((pp.q / 1000000000.0)
           |        * (CAST(m.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
           |        * ln(CAST(m.n AS DOUBLE) / CAST(t.tot AS DOUBLE))) AS hs
           |  FROM pi30 pp JOIN n m ON m.from_type = pp.s
           |  JOIN tt t ON t.from_type = pp.s)
           |SELECT CAST(k AS BIGINT) AS n_states,
           |  round((-hs) * 1000000.0) / 1000000.0 AS entropy_nats,
           |  round((-hs) / ln(2.0) * 1000000.0) / 1000000.0 AS entropy_bits,
           |  round((-hs) / ln(CAST(k AS DOUBLE)) * 1000000.0) / 1000000.0
           |    AS efficiency
           |FROM hx, ns""".stripMargin)),

    // ---- two-component GMM via quantized EM on doc token counts: IS
    // the length distribution bimodal, with actual (pi, mu, sigma)
    // parameters. E-step responsibilities quantized to 1e-6 before the
    // M-step sums (the q158 trainer discipline) -> the oracle's 3
    // unrolled EM rounds land on the same parameters.
    Q("q270_gmm_em",
      (s, d) => graft.operators.Gmm.em1d(t(s, d, "documents"),
        size(split(col("text"), " "))),
      Some {
        val rounds = (1 to 3).map { k =>
          s"""e$k AS MATERIALIZED (SELECT x, CAST(round(1000000.0 / (1.0 + exp(
             |    ln((1.0 - pi1) / pi1)
             |    - (CAST(x AS DOUBLE) - mu2) * (CAST(x AS DOUBLE) - mu2)
             |      / (2.0 * s2g * s2g)
             |    - ln(s2g)
             |    + (CAST(x AS DOUBLE) - mu1) * (CAST(x AS DOUBLE) - mu1)
             |      / (2.0 * s1g * s1g)
             |    + ln(s1g)))) AS BIGINT) AS rq
             |  FROM xs CROSS JOIN p${k - 1}),
             |g$k AS (SELECT sum(CAST(rq AS HUGEINT)) AS n1,
             |    sum(CAST(rq AS HUGEINT) * CAST(x AS HUGEINT)) AS s1,
             |    sum(CAST(rq AS HUGEINT) * CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS ss1,
             |    sum(CAST(1000000 - rq AS HUGEINT)) AS n2,
             |    sum(CAST(1000000 - rq AS HUGEINT) * CAST(x AS HUGEINT)) AS s2,
             |    sum(CAST(1000000 - rq AS HUGEINT) * CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS ss2
             |  FROM e$k),
             |p$k AS MATERIALIZED (SELECT
             |    CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) AS pi1,
             |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mu1,
             |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mu2,
             |    sqrt(greatest(CAST(ss1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |      - (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             |        * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 0.000001)) AS s1g,
             |    sqrt(greatest(CAST(ss2 AS DOUBLE) / CAST(n2 AS DOUBLE)
             |      - (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             |        * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)), 0.000001)) AS s2g
             |  FROM g$k)""".stripMargin
        }.mkString(",\n")
        s"""WITH xs AS MATERIALIZED (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS x
           |  FROM documents),
           |bd AS (SELECT min(x) AS mn, max(x) AS mx FROM xs),
           |p0 AS MATERIALIZED (SELECT 0.5 AS pi1,
           |    CAST(mn AS DOUBLE) + (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) / 4.0 AS mu1,
           |    CAST(mn AS DOUBLE) + (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) * 3.0 / 4.0 AS mu2,
           |    greatest((CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) / 4.0, 1.0) AS s1g,
           |    greatest((CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) / 4.0, 1.0) AS s2g
           |  FROM bd),
           |$rounds
           |SELECT CAST(count(*) AS BIGINT) AS n_rows,
           |  round(pi1 * 1000000.0) / 1000000.0 AS pi1,
           |  round(mu1 * 1000000.0) / 1000000.0 AS mu1,
           |  round(s1g * 1000000.0) / 1000000.0 AS sigma1,
           |  round(mu2 * 1000000.0) / 1000000.0 AS mu2,
           |  round(s2g * 1000000.0) / 1000000.0 AS sigma2,
           |  round(avg(ln(pi1 * exp((CAST(x AS DOUBLE) - mu1) * (CAST(x AS DOUBLE) - mu1)
           |      / (-2.0 * s1g * s1g)) * (0.3989422804014327 / s1g)
           |    + (1.0 - pi1) * exp((CAST(x AS DOUBLE) - mu2) * (CAST(x AS DOUBLE) - mu2)
           |      / (-2.0 * s2g * s2g)) * (0.3989422804014327 / s2g)))
           |    * 1000000.0) / 1000000.0 AS avg_ll
           |FROM xs CROSS JOIN p3
           |GROUP BY pi1, mu1, s1g, mu2, s2g""".stripMargin
      }),

    // ---- DBSCAN on the cosine eps-graph (eps: cos >= 0.8, minPts 3):
    // core / border / noise roles with min-id component clusters — the
    // density clustering that, unlike k-means, refuses to assign
    // outliers. Pairs come from the q27-exact SRP-bucketed eps-graph.
    Q("q271_dbscan",
      (s, d) => graft.operators.Clustering
        .dbscan(t(s, d, "embeddings"), threshold = 0.8, minPts = 3)
        .orderBy("vec_id"),
      Some("""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |pr AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id
             |  WHERE round(list_cosine_similarity(a.v, b.v) * 1000000.0)
             |    / 1000000.0 >= 0.8),
             |sym AS (SELECT ia AS id, ib AS nb FROM pr
             |  UNION ALL SELECT ib, ia FROM pr),
             |core AS MATERIALIZED (SELECT id FROM sym GROUP BY id
             |  HAVING count(*) >= 3),
             |ce AS (SELECT ia, ib FROM pr
             |  WHERE ia IN (SELECT id FROM core) AND ib IN (SELECT id FROM core)),
             |edges AS (SELECT ia AS u, ib AS v FROM ce
             |  UNION SELECT ib, ia FROM ce),
             |reach AS (SELECT u AS src, u AS dst FROM edges
             |  UNION SELECT r.src, e2.v FROM reach r JOIN edges e2 ON r.dst = e2.u),
             |clab AS (SELECT src AS id, min(dst) AS cluster FROM reach GROUP BY src),
             |ccl AS MATERIALIZED (SELECT c.id, coalesce(cl.cluster, c.id) AS cluster
             |  FROM core c LEFT JOIN clab cl USING (id)),
             |border AS (SELECT s.id, min(ccl.cluster) AS cluster
             |  FROM sym s JOIN ccl ON ccl.id = s.nb
             |  WHERE s.id NOT IN (SELECT id FROM core) GROUP BY s.id)
             |SELECT emb.vec_id,
             |  CASE WHEN ccl.id IS NOT NULL THEN 'core'
             |    WHEN border.id IS NOT NULL THEN 'border'
             |    ELSE 'noise' END AS role,
             |  coalesce(ccl.cluster, border.cluster) AS cluster
             |FROM embeddings emb
             |LEFT JOIN ccl ON ccl.id = emb.vec_id
             |LEFT JOIN border ON border.id = emb.vec_id
             |ORDER BY emb.vec_id""".stripMargin),
      bench = true),

    // ---- isotonic (PAV) calibration of the stopword-density score
    // against the is-English label, via the CLOSED minimax form
    // max_{j<=i} min_{k>=i} avg(j..k) — the PAV solution as a pure
    // join-aggregate program over the bin table (O(bins^3), model-sized).
    Q("q272_pav_isotonic",
      (s, d) => {
        val tk = split(col("text"), " ")
        val stops = filter(tk, x =>
          x.isin("the", "a", "of", "and", "to", "is"))
        val score = least(size(stops).cast("double") /
          size(tk).cast("double") * 10.0, lit(1.0))
        graft.operators.Stats.isotonicCalibration(t(s, d, "documents"),
          score, col("lang") === "en", bins = 20)
          .orderBy("bin")
      },
      Some("""WITH sc AS (SELECT least(
             |    len(list_filter(string_split(text, ' '),
             |      x -> x IN ('the','a','of','and','to','is')))::DOUBLE
             |    / len(string_split(text, ' '))::DOUBLE * 10.0, 1.0) AS s,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
             |g AS MATERIALIZED (SELECT CAST(least(floor(s * 20), 19) AS BIGINT) AS bin,
             |    count(*) AS n, sum(y) AS pos FROM sc GROUP BY 1),
             |rg AS MATERIALIZED (SELECT j.bin AS j, k.bin AS k,
             |    sum(m.pos)::DOUBLE / sum(m.n)::DOUBLE AS r
             |  FROM g j JOIN g k ON j.bin <= k.bin
             |  JOIN g m ON m.bin BETWEEN j.bin AND k.bin GROUP BY 1, 2),
             |inner_min AS (SELECT i.bin, rg.j, min(rg.r) AS mn_r
             |  FROM g i JOIN rg ON rg.j <= i.bin AND rg.k >= i.bin
             |  GROUP BY 1, 2),
             |fit AS (SELECT bin, max(mn_r) AS iso FROM inner_min GROUP BY bin)
             |SELECT g.bin, CAST(g.n AS BIGINT) AS n, CAST(g.pos AS BIGINT) AS pos,
             |  round(g.pos::DOUBLE / g.n::DOUBLE * 1000000.0) / 1000000.0 AS raw_rate,
             |  round(f.iso * 1000000.0) / 1000000.0 AS iso_rate
             |FROM g JOIN fit f ON f.bin = g.bin ORDER BY g.bin""".stripMargin)),

    // ---- CUPED variance reduction: pre-period spend as the covariate
    // for post-period spend, theta = cov/var and the achieved rho^2 —
    // how much experiment sensitivity the pre-period buys. Exact cent
    // moments; one double chain on the single output row.
    Q("q273_cuped",
      (s, d) => graft.operators.EventOps.cuped(Tables.events(s, d)),
      Some("""WITH dy AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             |    CAST(round(value * 100.0) AS BIGINT) AS cents FROM events),
             |bd AS (SELECT min(day) AS mn, max(day) AS mx FROM dy),
             |sp AS (SELECT user_id, cents, day < (mn + mx + 1) // 2 AS pre
             |  FROM dy, bd),
             |pu AS (SELECT user_id,
             |    sum(CASE WHEN pre THEN cents ELSE 0 END) AS x,
             |    sum(CASE WHEN NOT pre THEN cents ELSE 0 END) AS y
             |  FROM sp GROUP BY 1),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
             |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy FROM pu)
             |SELECT CAST(n AS BIGINT) AS n_users,
             |  round(((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             |    / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             |    * 1000000.0) / 1000000.0 AS theta,
             |  round(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) * 10000.0) / 10000.0
             |    AS var_y,
             |  round((((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             |    - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             |      * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             |      / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))) * 10000.0) / 10000.0
             |    AS var_adj,
             |  round(((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             |    * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             |    / (((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             |      * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS reduction
             |FROM m""".stripMargin)),

    // ---- frequent 3-itemsets over part-category baskets: the q224
    // pair story one arity up — ordered triple join within each order,
    // support-ranked with full tie-break.
    Q("q274_itemsets3",
      (s, d) => graft.operators.Ranking.frequentTriples(
        t(s, d, "lineitem"), col("l_orderkey"),
        pmod(col("l_partkey"), lit(50)), topK = 15),
      Some("""WITH p AS (SELECT DISTINCT l_orderkey AS g, l_partkey % 50 AS i
             |  FROM lineitem)
             |SELECT a, b, c, CAST(count(*) AS BIGINT) AS support FROM (
             |  SELECT pa.g, pa.i AS a, pb.i AS b, pc.i AS c
             |  FROM p pa JOIN p pb ON pb.g = pa.g AND pa.i < pb.i
             |  JOIN p pc ON pc.g = pa.g AND pb.i < pc.i)
             |GROUP BY 1, 2, 3 ORDER BY support DESC, a, b, c
             |LIMIT 15""".stripMargin)),

    // ---- phrase query through the positional inverted index: elect
    // the corpus's top adjacent bigram, then answer it as an index
    // probe (postings of w1 joined to postings of w2 at pos+1).
    Q("q275_phrase_search",
      (s, d) => graft.operators.TrainingPrep
        .phraseSearchTopBigram(t(s, d, "documents")),
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |pe AS MATERIALIZED (SELECT doc_id,
             |    unnest([{'p': i - 1, 'w': t[i]} for i in range(1, len(t) + 1)]) AS e
             |  FROM tk),
             |px AS MATERIALIZED (SELECT doc_id, e.p AS pos, e.w AS term FROM pe),
             |top AS (SELECT p1.term AS w1, p2.term AS w2, count(*) AS n
             |  FROM px p1 JOIN px p2 ON p2.doc_id = p1.doc_id
             |    AND p2.pos = p1.pos + 1
             |  GROUP BY 1, 2 ORDER BY n DESC, w1, w2 LIMIT 1)
             |SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_occurrences,
             |  CAST(count(DISTINCT i1.doc_id) AS BIGINT) AS n_docs
             |FROM px i1 JOIN top ON i1.term = top.w1
             |JOIN px i2 ON i2.doc_id = i1.doc_id AND i2.term = top.w2
             |  AND i2.pos = i1.pos + 1
             |GROUP BY w1, w2""".stripMargin)),

    // ---- Brandes betweenness on the thresholded trade graph, all 25
    // sources simultaneously: exact integer path counts forward,
    // billionth-quantized dependency accumulation backward (depth-4
    // contract shared with the oracle) — which nations BROKER trade.
    Q("q276_betweenness",
      (s, d) => graft.operators.GraphOps.betweenness(tradeEdges(s, d),
        depth = 4).orderBy("node"),
      Some {
        val fwd = (1 to 4).map { r =>
          s"""f$r AS MATERIALIZED (SELECT f.s, e.v AS node, sum(f.sigma) AS sigma
             |  FROM f${r - 1} f JOIN sym e ON e.u = f.node
             |  WHERE NOT EXISTS (SELECT 1 FROM vis${r - 1} x
             |    WHERE x.s = f.s AND x.node = e.v)
             |  GROUP BY 1, 2),
             |vis$r AS MATERIALIZED (SELECT s, node FROM vis${r - 1}
             |  UNION ALL SELECT s, node FROM f$r)""".stripMargin
        }.mkString(",\n")
        val bwd = (3 to 0 by -1).map { lev =>
          s"""b$lev AS MATERIALIZED (SELECT fv.s, fv.node,
             |    CAST(round(coalesce(x.acc, 0.0) * 1000000000.0) AS BIGINT) AS dq
             |  FROM f$lev fv LEFT JOIN (
             |    SELECT f2.s, f2.node,
             |      sum((CAST(f2.sigma AS DOUBLE) / CAST(fw.sigma AS DOUBLE))
             |        * (1.0 + bw.dq / 1000000000.0)) AS acc
             |    FROM f$lev f2 JOIN sym e ON e.u = f2.node
             |    JOIN f${lev + 1} fw ON fw.s = f2.s AND fw.node = e.v
             |    JOIN b${lev + 1} bw ON bw.s = f2.s AND bw.node = e.v
             |    GROUP BY 1, 2) x ON x.s = fv.s AND x.node = fv.node)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH $tradeEdgeCtes,
           |sym AS MATERIALIZED (SELECT a AS u, b AS v FROM ed
           |  UNION ALL SELECT b, a FROM ed),
           |nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym),
           |f0 AS MATERIALIZED (SELECT node AS s, node, CAST(1 AS HUGEINT) AS sigma
           |  FROM nodes),
           |vis0 AS MATERIALIZED (SELECT s, node FROM f0),
           |$fwd,
           |b4 AS MATERIALIZED (SELECT s, node, CAST(0 AS BIGINT) AS dq FROM f4),
           |$bwd
           |SELECT n.node, round((CAST(coalesce(sd.sd, 0) AS DOUBLE)
           |    / 1000000000.0) / 2.0 * 1000000.0) / 1000000.0 AS betweenness
           |FROM nodes n LEFT JOIN (
           |  SELECT node, sum(dq) AS sd FROM (
           |    SELECT node, dq FROM b1 UNION ALL SELECT node, dq FROM b2
           |    UNION ALL SELECT node, dq FROM b3
           |    UNION ALL SELECT node, dq FROM b4) GROUP BY node) sd
           |  ON sd.node = n.node
           |ORDER BY n.node""".stripMargin
      },
      bench = true),

    // ---- weekly seasonality strength: one-way ANOVA of dense daily
    // counts across day-of-week classes — eta^2 IS the fraction of
    // volume variance the weekly cycle explains.
    Q("q277_seasonality",
      (s, d) => graft.operators.EventOps
        .seasonalityStrength(Tables.events(s, d)),
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |v AS (SELECT day % 7 AS g, CAST(c AS HUGEINT) AS v FROM dn),
             |pg AS (SELECT g, CAST(count(*) AS HUGEINT) AS n_g,
             |    sum(v) AS s_g, sum(v * v) AS ss_g FROM v GROUP BY g),
             |a AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(n_g) AS n,
             |    sum(s_g) AS s, sum(ss_g) AS ss,
             |    sum(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
             |      / CAST(n_g AS DOUBLE)) AS sb FROM pg)
             |SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_rows,
             |  round((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |    / CAST(n AS DOUBLE)) * 100.0) / 100.0 AS ssb,
             |  round((CAST(ss AS DOUBLE) - sb) * 100.0) / 100.0 AS sse,
             |  round(((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
             |    / ((CAST(ss AS DOUBLE) - sb)
             |      / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS f_stat,
             |  round((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |      / CAST(n AS DOUBLE))
             |    / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |      / CAST(n AS DOUBLE))
             |    * 1000000.0) / 1000000.0 AS eta_sq
             |FROM a""".stripMargin)),

    // ---- skip-gram (center, context, label) extraction with
    // deterministic md5 in-doc negative sampling — word2vec's data side
    // materialized at scan speed over the sampled docs.
    Q("q278_skipgram_pairs",
      (s, d) => graft.operators.TrainingPrep
        .skipgramPairs(t(s, d, "documents").where(col("doc_id") % 100 === 0))
        .select(col("did").as("doc_id"), col("pos").cast("long").as("pos"),
          col("center"), col("context"), col("label"))
        .orderBy("doc_id", "pos", "label", "context"),
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
             |  FROM documents WHERE doc_id % 100 = 0),
             |ps AS (SELECT doc_id, t,
             |    unnest([{'p': i - 1, 'w': t[i]} for i in range(1, len(t) + 1)]) AS e
             |  FROM tk),
             |px AS (SELECT doc_id, t, e.p AS pos, e.w AS center FROM ps),
             |pp AS (SELECT doc_id, pos, center, t[pos + off + 1] AS context,
             |    CAST(1 AS BIGINT) AS label
             |  FROM px CROSS JOIN (SELECT unnest([-2, -1, 1, 2]) AS off) o
             |  WHERE pos + off >= 0 AND pos + off < len(t)),
             |ng AS (SELECT doc_id, pos, center,
             |    t[CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
             |      || CAST(pos AS VARCHAR)), 1, 15)) AS BIGINT) % len(t) AS INT) + 1]
             |      AS context,
             |    CAST(0 AS BIGINT) AS label FROM px)
             |SELECT doc_id, CAST(pos AS BIGINT) AS pos, center, context, label
             |FROM (SELECT * FROM pp UNION ALL SELECT * FROM ng)
             |ORDER BY doc_id, pos, label, context""".stripMargin)),

    // ---- nearest-covariate matching ATT (the propensity-matching
    // estimator shape): urgent orders matched to the closest LOW-
    // priority order by total price WITHIN the same order month (exact
    // blocking + nearest covariate, the q19/q242 as-of pair composed in
    // both directions), outcome = basket size. Controls deduped to
    // min-key per (month, price) so the as-of pick is total-order
    // deterministic.
    Q("q279_matching_att",
      (s, d) => {
        import graft.operators.AsofJoin
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val orders = t(s, d, "orders")
        def side(p: String) = orders.where(col("o_orderpriority") === p)
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            col("o_totalprice").as("price"), col("o_orderkey").as("okey"))
        val items = t(s, d, "lineitem")
          .groupBy(col("l_orderkey").as("okey"))
          .agg(count(lit(1)).as("items"))
        val control = side("5-LOW").groupBy("month", "price")
          .agg(min("okey").as("okc"))
        val bwd = AsofJoin.backward(side("1-URGENT"),
          control.select(col("month"), col("price"), col("okc").as("ob"),
            col("price").as("pb")), Seq("month"), "price", Seq("ob", "pb"))
        val fwd = AsofJoin.forward(bwd,
          control.select(col("month"), col("price"), col("okc").as("ocf"),
            col("price").as("pf")), Seq("month"), "price", Seq("ocf", "pf"))
        val gapB = col("price") - col("pb")
        val gapF = col("pf") - col("price")
        val useB = col("pb").isNotNull && (col("pf").isNull || gapB <= gapF)
        val ch = fwd.select(col("okey"),
          when(useB, col("ob")).otherwise(col("ocf")).as("mok"),
          when(useB, gapB).otherwise(gapF).as("gap"))
        val j = ch
          .join(items.select(col("okey"), col("items").as("yt")),
            Seq("okey"), "left")
          .join(items.select(col("okey").as("mok"), col("items").as("yc")),
            Seq("mok"), "left")
          .select(col("mok"), col("gap"),
            coalesce(col("yt"), lit(0L)).as("yt"),
            coalesce(col("yc"), lit(0L)).as("yc"))
        j.agg(count(lit(1)).cast("long").as("n_treated"),
          sum(when(col("mok").isNotNull, 1L).otherwise(0L)).cast("long")
            .as("n_matched"),
          sum(when(col("mok").isNotNull, col("yt") - col("yc"))
            .otherwise(0L)).cast(dec).as("sd"),
          sum(when(col("mok").isNotNull, col("gap")).otherwise(0.0))
            .as("sg"))
          .select(col("n_treated"), col("n_matched"),
            (round(col("sd").cast("double") /
              col("n_matched").cast("double") * 1000000.0) / 1000000.0)
              .as("att_items"),
            (round(col("sg") / col("n_matched").cast("double") * 10000.0)
              / 10000.0).as("avg_price_gap"))
      },
      Some("""WITH it AS (SELECT l_orderkey AS okey, count(*) AS items
             |  FROM lineitem GROUP BY 1),
             |t AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |    o_totalprice AS price, o_orderkey AS okey FROM orders
             |  WHERE o_orderpriority = '1-URGENT'),
             |c AS (SELECT month, price, min(okey) AS okc FROM (
             |    SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |      o_totalprice AS price, o_orderkey AS okey FROM orders
             |    WHERE o_orderpriority = '5-LOW') GROUP BY 1, 2),
             |tb AS (SELECT t.month, t.price, t.okey, b.price AS pb,
             |    b.okc AS ob
             |  FROM t ASOF LEFT JOIN c b
             |    ON t.month = b.month AND t.price >= b.price),
             |tf AS (SELECT tb.*, f.price AS pf, f.okc AS ocf
             |  FROM tb ASOF LEFT JOIN c f
             |    ON tb.month = f.month AND tb.price <= f.price),
             |ch AS (SELECT okey,
             |    CASE WHEN pb IS NOT NULL AND (pf IS NULL
             |        OR (price - pb) <= (pf - price)) THEN ob ELSE ocf END AS mok,
             |    CASE WHEN pb IS NOT NULL AND (pf IS NULL
             |        OR (price - pb) <= (pf - price)) THEN price - pb
             |      ELSE pf - price END AS gap
             |  FROM tf),
             |j AS (SELECT ch.mok, ch.gap,
             |    coalesce(ti.items, 0) AS yt, coalesce(ci.items, 0) AS yc
             |  FROM ch LEFT JOIN it ti ON ti.okey = ch.okey
             |  LEFT JOIN it ci ON ci.okey = ch.mok)
             |SELECT CAST(count(*) AS BIGINT) AS n_treated,
             |  CAST(sum(CASE WHEN mok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_matched,
             |  round(CAST(sum(CASE WHEN mok IS NOT NULL THEN yt - yc ELSE 0 END)
             |      AS DOUBLE)
             |    / CAST(sum(CASE WHEN mok IS NOT NULL THEN 1 ELSE 0 END)
             |      AS DOUBLE) * 1000000.0) / 1000000.0 AS att_items,
             |  round(sum(CASE WHEN mok IS NOT NULL THEN gap ELSE 0.0 END)
             |    / CAST(sum(CASE WHEN mok IS NOT NULL THEN 1 ELSE 0 END)
             |      AS DOUBLE) * 10000.0) / 10000.0 AS avg_price_gap
             |FROM j""".stripMargin)),

    // ---- declarative data-contract gate: five row rules + a key-
    // uniqueness contract over orders, evaluated in ONE aggregation
    // pass — the publish/block decision table an ingest pipeline runs
    // before committing a snapshot.
    Q("q280_expectations",
      (s, d) => graft.operators.Profiling.expectations(t(s, d, "orders"),
        Seq(
          "custkey_not_null" -> col("o_custkey").isNotNull,
          "date_in_range" -> col("o_orderdate")
            .between("1992-01-01", "1998-12-31"),
          "orderkey_not_null" -> col("o_orderkey").isNotNull,
          "price_positive" -> (col("o_totalprice") > 0),
          "priority_domain" -> col("o_orderpriority").isin("1-URGENT",
            "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
        uniqueCols = Seq("o_orderkey"))
        .orderBy("rule"),
      Some("""WITH a AS (SELECT count(*) AS n,
             |  sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS v1,
             |  sum(CASE WHEN o_orderdate BETWEEN '1992-01-01' AND '1998-12-31'
             |    THEN 0 ELSE 1 END) AS v2,
             |  sum(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS v3,
             |  sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS v4,
             |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH',
             |    '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW') THEN 0 ELSE 1 END) AS v5,
             |  count(*) - count(DISTINCT o_orderkey) AS u1 FROM orders)
             |SELECT * FROM (
             |  SELECT 'custkey_not_null' AS rule, CAST(n AS BIGINT) AS n_rows,
             |    CAST(v1 AS BIGINT) AS n_violations, v1 = 0 AS passed FROM a
             |  UNION ALL SELECT 'date_in_range', CAST(n AS BIGINT),
             |    CAST(v2 AS BIGINT), v2 = 0 FROM a
             |  UNION ALL SELECT 'orderkey_not_null', CAST(n AS BIGINT),
             |    CAST(v3 AS BIGINT), v3 = 0 FROM a
             |  UNION ALL SELECT 'price_positive', CAST(n AS BIGINT),
             |    CAST(v4 AS BIGINT), v4 = 0 FROM a
             |  UNION ALL SELECT 'priority_domain', CAST(n AS BIGINT),
             |    CAST(v5 AS BIGINT), v5 = 0 FROM a
             |  UNION ALL SELECT 'unique(o_orderkey)', CAST(n AS BIGINT),
             |    CAST(u1 AS BIGINT), u1 = 0 FROM a)
             |ORDER BY rule""".stripMargin)),

    // ---- sliding-window event counts (1 h window, 15 min slide) via
    // Spark's native window() generator — each event lands in exactly
    // window/slide = 4 overlapping windows; the oracle derives the same
    // epoch-aligned starts arithmetically.
    Q("q282_sliding_windows",
      (s, d) => {
        val ev = Tables.events(s, d)
        val tsc = timestamp_micros(expr("ts div 1000"))
        ev.groupBy(window(tsc, "1 hour", "15 minutes").as("w"))
          .agg(count(lit(1)).cast("long").as("n"))
          .select(unix_micros(col("w.start")).as("start_us"),
            unix_micros(col("w.end")).as("end_us"), col("n"))
          .orderBy("start_us")
      },
      Some("""WITH sl AS (SELECT (epoch_us(ts) // 900000000 - j.j) * 900000000
             |    AS start_us
             |  FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j)
             |SELECT start_us, start_us + 3600000000 AS end_us,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM sl GROUP BY start_us ORDER BY start_us""".stripMargin)),

    // ---- pairwise Cohen's d across customer segments on order value:
    // the effect-size matrix (how BIG the differences are) next to
    // q257's rank test (whether they exist). Exact cent moments.
    Q("q283_cohens_d",
      (s, d) => graft.operators.Stats.pairwiseCohensD(
        t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey")),
        col("c_mktsegment"), col("o_totalprice"))
        .orderBy("g_a", "g_b"),
      Some("""WITH v AS (SELECT c_mktsegment AS g,
             |    CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT) AS c
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |g AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(c) AS HUGEINT) AS s,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ss
             |  FROM v GROUP BY g)
             |SELECT a.g AS g_a, b.g AS g_b,
             |  CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
             |  round((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
             |    - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)) / 100.0 * 100.0)
             |    / 100.0 AS mean_diff,
             |  round((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
             |    - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
             |    / sqrt(((CAST(a.n AS DOUBLE) - 1.0)
             |      * ((CAST(a.ss AS DOUBLE) - CAST(a.s AS DOUBLE)
             |        * CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE))
             |        / (CAST(a.n AS DOUBLE) - 1.0))
             |      + (CAST(b.n AS DOUBLE) - 1.0)
             |      * ((CAST(b.ss AS DOUBLE) - CAST(b.s AS DOUBLE)
             |        * CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
             |        / (CAST(b.n AS DOUBLE) - 1.0)))
             |      / (CAST(a.n AS DOUBLE) + CAST(b.n AS DOUBLE) - 2.0))
             |    * 1000000.0) / 1000000.0 AS cohens_d
             |FROM g a JOIN g b ON a.g < b.g ORDER BY g_a, g_b""".stripMargin)),

    // ---- AB-test power analysis from OBSERVED variance: the n-per-arm
    // needed to detect a 2% lift in mean order value at alpha 0.05,
    // power 0.80 (normal approximation; z literals shared verbatim with
    // the oracle).
    Q("q284_power_analysis",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val cents = round(col("o_totalprice").cast("double") * 100.0)
          .cast("long")
        val m = t(s, d, "orders").select(cents.as("c"))
          .agg(count(lit(1)).cast(dec).as("n"), sum(col("c")).cast(dec).as("s"),
            sum(col("c").cast(dec) * col("c").cast(dec)).as("ss"))
        val nD = col("n").cast("double")
        val mean = col("s").cast("double") / nD / 100.0
        val variance = (col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double") / nD) / nD /
          10000.0
        val za = expr("CAST(1.959963984540054 AS DOUBLE)")
        val zb = expr("CAST(0.8416212335729143 AS DOUBLE)")
        val delta = mean * 0.02
        m.select(
          (round(mean * 100.0) / 100.0).as("mean_value"),
          (round(sqrt(variance) * 100.0) / 100.0).as("sd_value"),
          (round(delta * 100.0) / 100.0).as("delta"),
          ceil((za + zb) * (za + zb) * lit(2.0) * variance /
            (delta * delta)).cast("long").as("n_per_arm"))
      },
      Some("""WITH m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(c) AS HUGEINT) AS s,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ss
             |  FROM (SELECT CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0)
             |    AS BIGINT) AS c FROM orders))
             |SELECT
             |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 * 100.0)
             |    / 100.0 AS mean_value,
             |  round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
             |    * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
             |    / 10000.0) * 100.0) / 100.0 AS sd_value,
             |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 * 0.02
             |    * 100.0) / 100.0 AS delta,
             |  CAST(ceil((1.959963984540054 + 0.8416212335729143)
             |    * (1.959963984540054 + 0.8416212335729143) * 2.0
             |    * ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 10000.0)
             |    / ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 * 0.02)
             |      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 * 0.02)))
             |    AS BIGINT) AS n_per_arm
             |FROM m""".stripMargin)),

    // ---- data-driven Shapley channel attribution over the 16-subset
    // coalition lattice: v(S) = conversion rate of users whose touch
    // set fits in S; each channel earns its exact marginal-contribution
    // sum — the principled alternative to q222's last-touch.
    Q("q285_shapley_attribution",
      (s, d) => graft.operators.EventOps
        .shapleyAttribution(Tables.events(s, d)),
      Some("""WITH pu AS (SELECT user_id,
             |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |  + max(CASE WHEN event_type = 'error' THEN 2 ELSE 0 END)
             |  + max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END)
             |  + max(CASE WHEN event_type = 'view' THEN 8 ELSE 0 END) AS m,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |  FROM events GROUP BY user_id),
             |g AS (SELECT m, count(*) AS n, sum(conv) AS nc FROM pu GROUP BY m),
             |lat AS (SELECT unnest(range(0, 16)) AS s),
             |v AS MATERIALIZED (SELECT lat.s, CASE WHEN sum(coalesce(n, 0)) > 0
             |    THEN CAST(sum(coalesce(nc, 0)) AS DOUBLE)
             |      / CAST(sum(coalesce(n, 0)) AS DOUBLE)
             |    ELSE 0.0 END AS v
             |  FROM lat LEFT JOIN g ON (g.m & (15 - lat.s)) = 0 GROUP BY lat.s),
             |t AS (SELECT cc.c,
             |    (CASE bit_count(s0.s) WHEN 0 THEN 6.0 WHEN 1 THEN 2.0
             |      WHEN 2 THEN 2.0 ELSE 6.0 END / 24.0) * (v1.v - v0.v) AS t
             |  FROM (SELECT unnest(range(0, 4)) AS c) cc
             |  CROSS JOIN lat s0
             |  JOIN v v0 ON v0.s = s0.s
             |  JOIN v v1 ON v1.s = s0.s + (1 << cc.c)
             |  WHERE (s0.s & (1 << cc.c)) = 0)
             |SELECT CASE c WHEN 0 THEN 'click' WHEN 1 THEN 'error'
             |    WHEN 2 THEN 'signup' ELSE 'view' END AS channel,
             |  round(sum(t) * 1000000.0) / 1000000.0 AS shapley
             |FROM t GROUP BY c ORDER BY channel""".stripMargin)),

    // ---- per-user covered active time: union length of 5-minute
    // activity intervals via the running-max-of-ends sweep, exact
    // integer nanoseconds end to end.
    Q("q286_interval_union",
      (s, d) => graft.operators.EventOps.coveredTime(Tables.events(s, d))
        .orderBy("user_id"),
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  round(CAST(sum(addn) AS DOUBLE) / 1000000000.0 * 1000.0)
             |    / 1000.0 AS covered_s
             |FROM (
             |  SELECT user_id,
             |    greatest(0, tsn + 300000000000
             |      - greatest(tsn, coalesce(pe, tsn))) AS addn
             |  FROM (
             |    SELECT user_id, tsn,
             |      max(tsn + 300000000000) OVER (PARTITION BY user_id
             |        ORDER BY tsn, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
             |    FROM (SELECT user_id, event_id, epoch_us(ts) * 1000 AS tsn
             |          FROM events)))
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- LOCF forward-fill: the last purchase amount seen, carried
    // over every subsequent event per user (the imputation primitive) —
    // last_value IGNORE NULLS over the (ts, event_id) total order.
    Q("q287_locf_fill",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        Tables.events(s, d).where(pmod(col("user_id"), lit(10)) === 0)
          .withColumn("lp", last(when(col("event_type") === "purchase",
            col("value")), ignoreNulls = true).over(w))
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"), col("event_type"),
            (round(col("lp") * 100.0) / 100.0).as("last_purchase"))
          .orderBy("user_id", "ts_us", "event_id")
      },
      Some("""SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
             |  round(last_value(CASE WHEN event_type = 'purchase' THEN value END
             |      IGNORE NULLS)
             |    OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    * 100.0) / 100.0 AS last_purchase
             |FROM events WHERE user_id % 10 = 0
             |ORDER BY user_id, ts_us, event_id""".stripMargin)),

    // ---- chi-squared independence of customer segment × order
    // priority with Cramér's V: is the 5x5 contingency structure real?
    // Empty cells restored from the margins cross; exact counts.
    Q("q288_chisq_independence",
      (s, d) => graft.operators.Stats.chiSquaredIndependence(
        t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey")),
        col("c_mktsegment"), col("o_orderpriority")),
      Some("""WITH cells AS (SELECT c_mktsegment AS r, o_orderpriority AS c,
             |    count(*) AS o
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |rm AS (SELECT r, sum(o) AS ri FROM cells GROUP BY r),
             |cm AS (SELECT c, sum(o) AS cj FROM cells GROUP BY c),
             |tt AS (SELECT sum(o) AS n, count(DISTINCT r) AS nr,
             |    count(DISTINCT c) AS nc FROM cells),
             |grid AS (SELECT tt.n, tt.nr, tt.nc,
             |    CAST(coalesce(cells.o, 0) AS DOUBLE) AS od,
             |    CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE) / CAST(n AS DOUBLE) AS e
             |  FROM rm CROSS JOIN cm CROSS JOIN tt
             |  LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c),
             |agg AS (SELECT n, nr, nc, sum((od - e) * (od - e) / e) AS chi2
             |  FROM grid GROUP BY 1, 2, 3)
             |SELECT CAST(n AS BIGINT) AS n, CAST(nr AS BIGINT) AS n_row_classes,
             |  CAST(nc AS BIGINT) AS n_col_classes,
             |  CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
             |  round(chi2 * 1000000.0) / 1000000.0 AS chi2,
             |  round(sqrt(chi2 / (CAST(n AS DOUBLE)
             |    * CAST(least(nr - 1, nc - 1) AS DOUBLE))) * 1000000.0)
             |    / 1000000.0 AS cramers_v
             |FROM agg""".stripMargin)),

    // ---- Benjamini-Hochberg FDR over per-source doc-length z-tests:
    // which sources deviate from the corpus mean AFTER multiple-testing
    // control. Normal CDF via the A&S 26.2.17 Horner chain, literal-
    // identical in both engines.
    Q("q289_bh_fdr",
      (s, d) => graft.operators.Stats.bhFdr(t(s, d, "documents"),
        col("source"), col("n_chars")).orderBy("rnk"),
      Some("""WITH g AS (SELECT source AS g, CAST(count(*) AS HUGEINT) AS ng,
             |    CAST(sum(n_chars) AS HUGEINT) AS sg FROM documents GROUP BY 1),
             |tt AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(n_chars) AS HUGEINT) AS s,
             |    sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS ss
             |  FROM documents),
             |m AS (SELECT count(*) AS m FROM g),
             |sc AS (SELECT g.g, CAST(ng AS BIGINT) AS n_g,
             |    (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
             |      - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |    / (sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
             |        * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |        / CAST(n AS DOUBLE))
             |      / sqrt(CAST(ng AS DOUBLE))) AS z
             |  FROM g CROSS JOIN tt),
             |pv AS (SELECT g, n_g, z,
             |    2.0 * (0.3989422804014327 * exp(-abs(z) * abs(z) / 2.0)
             |      * ((1.0 / (1.0 + 0.2316419 * abs(z)))
             |        * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(z)))
             |          * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(z)))
             |            * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(z)))
             |              * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(z)))
             |                * 1.330274429)))))) AS p
             |  FROM sc),
             |rk AS (SELECT g, n_g, z, p,
             |    row_number() OVER (ORDER BY p, g) AS rnk FROM pv),
             |th AS (SELECT rk.*, CAST(rnk AS DOUBLE) * 0.1 / CAST(m AS DOUBLE)
             |    AS thr FROM rk CROSS JOIN m),
             |km AS (SELECT max(CASE WHEN p <= thr THEN rnk END) AS kmax FROM th)
             |SELECT g, n_g, round(z * 1000000.0) / 1000000.0 AS z,
             |  round(p * 1000000.0) / 1000000.0 AS p,
             |  CAST(rnk AS BIGINT) AS rnk,
             |  round(thr * 1000000.0) / 1000000.0 AS bh_threshold,
             |  coalesce(rnk <= kmax, false) AS discovery
             |FROM th CROSS JOIN km ORDER BY rnk""".stripMargin)),

    // ---- frequent contiguous event trigrams: what users DO three
    // steps in a row, ranked by user reach — the sequence-mining view
    // q189's one-step transition matrix can't give.
    Q("q290_seq_patterns",
      (s, d) => graft.operators.EventOps
        .sequentialPatterns(Tables.events(s, d)),
      Some("""WITH tg AS (SELECT user_id,
             |    event_type || '>' || lead(event_type, 1) OVER w || '>'
             |      || lead(event_type, 2) OVER w AS pattern,
             |    lead(event_type, 2) OVER w AS t2
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT pattern, CAST(count(*) AS BIGINT) AS n_occurrences,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM tg WHERE t2 IS NOT NULL
             |GROUP BY pattern
             |ORDER BY n_users DESC, n_occurrences DESC, pattern
             |LIMIT 15""".stripMargin)),

    // ---- negative-binomial method-of-moments fit of items-per-order:
    // the parametric completion of q254's dispersion index (r, p from
    // mean/variance; null when the data is not overdispersed).
    Q("q291_negbin_fit",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val c = t(s, d, "lineitem").groupBy("l_orderkey")
          .agg(count(lit(1)).as("c"))
        val agg = c.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("c")).cast(dec).as("s"),
          sum(col("c").cast(dec) * col("c").cast(dec)).as("ss"))
        val nD = col("n").cast("double")
        val m = col("s").cast("double") / nD
        val v = (col("ss").cast("double") - col("s").cast("double") *
          col("s").cast("double") / nD) / nD
        agg.select(col("n").cast("long").as("n_orders"),
          (round(m * 1000000.0) / 1000000.0).as("mean_items"),
          (round(v * 1000000.0) / 1000000.0).as("var_items"),
          when(v > m, round(m * m / (v - m) * 1000000.0) / 1000000.0)
            .as("nb_r"),
          when(v > 0.0, round(m / v * 1000000.0) / 1000000.0).as("nb_p"))
      },
      Some("""WITH c AS (SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY 1),
             |g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(c) AS HUGEINT) AS s,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ss FROM c),
             |mv AS (SELECT CAST(n AS BIGINT) AS n_orders,
             |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             |    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS v FROM g)
             |SELECT n_orders,
             |  round(m * 1000000.0) / 1000000.0 AS mean_items,
             |  round(v * 1000000.0) / 1000000.0 AS var_items,
             |  CASE WHEN v > m THEN round(m * m / (v - m) * 1000000.0)
             |    / 1000000.0 END AS nb_r,
             |  CASE WHEN v > 0.0 THEN round(m / v * 1000000.0)
             |    / 1000000.0 END AS nb_p
             |FROM mv""".stripMargin)),

    // ---- sample-ratio mismatch: md5-hash 50/50 assignment audited
    // with the 1-dof goodness-of-fit chi-square at the p < 0.001
    // industry gate — the first check on any experiment.
    Q("q292_srm_check",
      (s, d) => graft.operators.Stats.srmCheck(Tables.events(s, d),
        pmod(graft.expressions.PortableHash.md5Hash60(col("user_id")),
          lit(2L)), col("user_id")),
      Some("""WITH e AS (SELECT
             |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
             |      AS BIGINT) % 2 AS v, user_id AS u FROM events),
             |cn AS (SELECT v, count(DISTINCT u) AS n FROM e GROUP BY v),
             |a AS (SELECT sum(CASE WHEN v = 0 THEN n ELSE 0 END) AS na,
             |    sum(CASE WHEN v = 1 THEN n ELSE 0 END) AS nb FROM cn),
             |x AS (SELECT na, nb,
             |    (CAST(na AS DOUBLE) - CAST(na + nb AS DOUBLE) / 2.0)
             |      * (CAST(na AS DOUBLE) - CAST(na + nb AS DOUBLE) / 2.0)
             |      / (CAST(na + nb AS DOUBLE) / 2.0)
             |    + (CAST(nb AS DOUBLE) - CAST(na + nb AS DOUBLE) / 2.0)
             |      * (CAST(nb AS DOUBLE) - CAST(na + nb AS DOUBLE) / 2.0)
             |      / (CAST(na + nb AS DOUBLE) / 2.0) AS chi2 FROM a),
             |p AS (SELECT na, nb, chi2,
             |    2.0 * (0.3989422804014327 * exp(-sqrt(chi2) * sqrt(chi2) / 2.0)
             |      * ((1.0 / (1.0 + 0.2316419 * sqrt(chi2)))
             |        * (0.319381530 + (1.0 / (1.0 + 0.2316419 * sqrt(chi2)))
             |          * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * sqrt(chi2)))
             |            * (1.781477937 + (1.0 / (1.0 + 0.2316419 * sqrt(chi2)))
             |              * (-1.821255978 + (1.0 / (1.0 + 0.2316419
             |                * sqrt(chi2))) * 1.330274429)))))) AS p FROM x)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  round(chi2 * 1000000.0) / 1000000.0 AS chi2,
             |  round(p * 1000000.0) / 1000000.0 AS p,
             |  p < 0.001 AS srm_flag
             |FROM p""".stripMargin)),

    // ---- eccentricity / center / periphery of the thresholded trade
    // graph, all sources at once over the (src, node)-keyed frontier —
    // radius and diameter as flags on every node.
    Q("q293_eccentricity",
      (s, d) => graft.operators.GraphOps
        .eccentricity(tradeEdges(s, d), depth = 6).orderBy("node"),
      Some {
        val fwd = (1 to 6).map { r =>
          s"""f$r AS MATERIALIZED (SELECT DISTINCT f.s, e.v AS node
             |  FROM f${r - 1} f JOIN sym e ON e.u = f.node
             |  WHERE NOT EXISTS (SELECT 1 FROM vis${r - 1} x
             |    WHERE x.s = f.s AND x.node = e.v)),
             |vis$r AS MATERIALIZED (SELECT s, node FROM vis${r - 1}
             |  UNION ALL SELECT s, node FROM f$r)""".stripMargin
        }.mkString(",\n")
        val lv = (1 to 6).map(r =>
          s"SELECT s, CAST($r AS BIGINT) AS lev FROM f$r")
          .mkString("\nUNION ALL ")
        s"""WITH $tradeEdgeCtes,
           |sym AS MATERIALIZED (SELECT a AS u, b AS v FROM ed
           |  UNION ALL SELECT b, a FROM ed),
           |nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym),
           |f0 AS MATERIALIZED (SELECT node AS s, node FROM nodes),
           |vis0 AS MATERIALIZED (SELECT s, node FROM f0),
           |$fwd,
           |lv AS ($lv),
           |ecc AS (SELECT s AS node, max(lev) AS ecc FROM lv GROUP BY s),
           |rc AS (SELECT s AS node, count(*) AS n_reached FROM vis6 GROUP BY s),
           |sm AS (SELECT max(ecc) AS dia, min(ecc) AS rad FROM ecc)
           |SELECT n.node, CAST(ecc AS BIGINT) AS ecc,
           |  CAST(n_reached AS BIGINT) AS n_reached,
           |  ecc = rad AS is_center, ecc = dia AS is_peripheral
           |FROM nodes n JOIN ecc ON ecc.node = n.node
           |JOIN rc ON rc.node = n.node CROSS JOIN sm
           |ORDER BY n.node""".stripMargin
      }),

    // ---- label-noise detection (confident-learning-lite, Northcutt et
    // al. 2021): docs whose trained-classifier score lands at-or-beyond
    // the OPPOSITE class's mean score are suspected mislabels. Class
    // thresholds compared by exact integer cross-multiplication
    // (score_u·n_class vs sum_class) — no float boundary anywhere.
    Q("q294_label_noise",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val docs = t(s, d, "documents")
        val w = logregModel(docs)
        val y = (graft.operators.TextAnalysis.qualityScore(col("text"))
          >= 0.9).cast("long")
        val sc = graft.operators.QualityClassifier.score(docs, w)
          .join(docs.select(col("doc_id"), y.as("y")), Seq("doc_id"))
          .select(col("y"),
            round(col("score") * 1000000.0).cast("long").as("su"))
        val cm = sc.agg(
          sum(when(col("y") === 0, col("su")).otherwise(0L)).cast(dec)
            .as("s0"),
          sum(when(col("y") === 0, 1L).otherwise(0L)).cast(dec).as("n0"),
          sum(when(col("y") === 1, col("su")).otherwise(0L)).cast(dec)
            .as("s1"),
          sum(when(col("y") === 1, 1L).otherwise(0L)).cast(dec).as("n1"),
          count(lit(1)).cast(dec).as("n"))
        val j = sc.join(broadcast(cm))
        val suspPos = col("y") === 1 &&
          col("su").cast(dec) * col("n0") <= col("s0")
        val suspNeg = col("y") === 0 &&
          col("su").cast(dec) * col("n1") >= col("s1")
        j.groupBy("n", "n0", "n1")
          .agg(sum(when(suspPos, 1L).otherwise(0L)).as("sp"),
            sum(when(suspNeg, 1L).otherwise(0L)).as("sn"))
          .select(col("n").cast("long").as("n_docs"),
            col("n1").cast("long").as("n_y1"),
            col("n0").cast("long").as("n_y0"),
            col("sp").cast("long").as("n_suspect_pos"),
            col("sn").cast("long").as("n_suspect_neg"),
            (round((col("sp") + col("sn")).cast("double") /
              col("n").cast("double") * 1000000.0) / 1000000.0)
              .as("suspect_rate"))
      },
      Some(s"""WITH ${logregCtes(3)},
              |sc AS (SELECT fx.y,
              |    CAST(round(1.0/(1.0 + exp(-(w1*(x1/1000000.0) + w2*(x2/1000000.0)
              |      + w3*(x3/1000000.0) + w4*(x4/1000000.0) + w5*(x5/1000000.0))))
              |      * 1000000.0) AS BIGINT) AS su
              |  FROM fx CROSS JOIN wfin),
              |cm AS (SELECT
              |    CAST(sum(CASE WHEN y = 0 THEN su ELSE 0 END) AS HUGEINT) AS s0,
              |    CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n0,
              |    CAST(sum(CASE WHEN y = 1 THEN su ELSE 0 END) AS HUGEINT) AS s1,
              |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
              |    CAST(count(*) AS HUGEINT) AS n FROM sc)
              |SELECT CAST(n AS BIGINT) AS n_docs, CAST(n1 AS BIGINT) AS n_y1,
              |  CAST(n0 AS BIGINT) AS n_y0,
              |  CAST(sum(CASE WHEN y = 1 AND CAST(su AS HUGEINT) * n0 <= s0
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect_pos,
              |  CAST(sum(CASE WHEN y = 0 AND CAST(su AS HUGEINT) * n1 >= s1
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect_neg,
              |  round(CAST(sum(CASE WHEN (y = 1 AND CAST(su AS HUGEINT) * n0 <= s0)
              |      OR (y = 0 AND CAST(su AS HUGEINT) * n1 >= s1)
              |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(n AS DOUBLE)
              |    * 1000000.0) / 1000000.0 AS suspect_rate
              |FROM sc CROSS JOIN cm GROUP BY n, n1, n0""".stripMargin)),

    // ---- Tukey boxplot fences per return flag on extended price:
    // exact percentile quartiles, 1.5-IQR fences ROUNDED 4 dp as the
    // comparison contract, per-group outlier counts.
    Q("q295_tukey_fences",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val fences = li.groupBy("l_returnflag")
          .agg((round(expr("percentile(l_extendedprice, 0.25)") * 10000.0)
            / 10000.0).as("q1"),
            (round(expr("percentile(l_extendedprice, 0.75)") * 10000.0)
              / 10000.0).as("q3"))
          .select(col("l_returnflag"), col("q1"), col("q3"),
            (round((col("q3") - col("q1")) * 10000.0) / 10000.0).as("iqr"),
            (round((col("q1") - lit(1.5) * (col("q3") - col("q1"))) * 10000.0)
              / 10000.0).as("lo_fence"),
            (round((col("q3") + lit(1.5) * (col("q3") - col("q1"))) * 10000.0)
              / 10000.0).as("hi_fence"))
        li.join(broadcast(fences), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"), col("q1"), col("q3"), col("iqr"),
            col("lo_fence"), col("hi_fence"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("l_extendedprice") < col("lo_fence"), 1L)
              .otherwise(0L)).cast("long").as("n_low_outliers"),
            sum(when(col("l_extendedprice") > col("hi_fence"), 1L)
              .otherwise(0L)).cast("long").as("n_high_outliers"))
          .orderBy("l_returnflag")
      },
      Some("""WITH f AS (SELECT l_returnflag,
             |    round(quantile_cont(l_extendedprice, 0.25) * 10000.0)
             |      / 10000.0 AS q1,
             |    round(quantile_cont(l_extendedprice, 0.75) * 10000.0)
             |      / 10000.0 AS q3
             |  FROM lineitem GROUP BY 1),
             |fx2 AS (SELECT l_returnflag, q1, q3,
             |    round((q3 - q1) * 10000.0) / 10000.0 AS iqr,
             |    round((q1 - 1.5 * (q3 - q1)) * 10000.0) / 10000.0 AS lo_fence,
             |    round((q3 + 1.5 * (q3 - q1)) * 10000.0) / 10000.0 AS hi_fence
             |  FROM f)
             |SELECT li.l_returnflag, q1, q3, iqr, lo_fence, hi_fence,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN l_extendedprice < lo_fence THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_low_outliers,
             |  CAST(sum(CASE WHEN l_extendedprice > hi_fence THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_high_outliers
             |FROM lineitem li JOIN fx2 ON fx2.l_returnflag = li.l_returnflag
             |GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY li.l_returnflag""".stripMargin)),

    // ---- OLS influence diagnostics on the dense daily series: Cook's
    // distance + leverage per day against the counts-vs-day fit — WHICH
    // days bend the q198-style trend line. Exact integer sums feed one
    // fixed double chain; top-5 by (D desc, day).
    Q("q296_cooks_distance",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d)).localCheckpoint()
        val m = dense.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("day")).cast(dec).as("st"),
          sum(col("c")).cast(dec).as("sy"),
          sum(col("day").cast(dec) * col("day").cast(dec)).as("stt"),
          sum(col("day").cast(dec) * col("c").cast(dec)).as("sty"),
          sum(col("c").cast(dec) * col("c").cast(dec)).as("syy"))
        val nD = col("n").cast("double")
        val sxx = col("stt").cast("double") -
          col("st").cast("double") * col("st").cast("double") / nD
        val sxy = col("sty").cast("double") -
          col("st").cast("double") * col("sy").cast("double") / nD
        val b = sxy / sxx
        val a = (col("sy").cast("double") - b * col("st").cast("double")) / nD
        val tbar = col("st").cast("double") / nD
        val j = dense.join(broadcast(m))
        val fit = a + b * col("day").cast("double")
        val r = col("c").cast("double") - fit
        val h = lit(1.0) / nD +
          (col("day").cast("double") - tbar) *
            (col("day").cast("double") - tbar) / sxx
        val syyC = col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double") / nD
        val sse = syyC - b * sxy
        val s2 = sse / (nD - 2.0)
        val dcook = r * r / (lit(2.0) * s2) * (h / ((lit(1.0) - h) *
          (lit(1.0) - h)))
        j.select(col("day"), col("c"),
            (round(r * 10000.0) / 10000.0).as("residual"),
            (round(h * 1000000.0) / 1000000.0).as("leverage"),
            (round(dcook * 1000000.0) / 1000000.0).as("cooks_d"),
            dcook.as("_d"))
          .orderBy(col("_d").desc, col("day")).limit(5)
          .drop("_d")
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(day) AS HUGEINT) AS st, CAST(sum(c) AS HUGEINT) AS sy,
             |    sum(CAST(day AS HUGEINT) * CAST(day AS HUGEINT)) AS stt,
             |    sum(CAST(day AS HUGEINT) * CAST(c AS HUGEINT)) AS sty,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS syy FROM dn),
             |k AS (SELECT dn.day, dn.c,
             |    CAST(c AS DOUBLE)
             |      - ((CAST(sy AS DOUBLE) - ((CAST(sty AS DOUBLE)
             |          - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)
             |            / CAST(n AS DOUBLE))
             |        / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)
             |          * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)))
             |          * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE)
             |        + ((CAST(sty AS DOUBLE) - CAST(st AS DOUBLE)
             |          * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |        / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)
             |          * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)))
             |          * CAST(day AS DOUBLE)) AS r,
             |    1.0 / CAST(n AS DOUBLE)
             |      + (CAST(day AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
             |      * (CAST(day AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
             |      / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)
             |        * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) AS h,
             |    ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
             |        / CAST(n AS DOUBLE))
             |      - ((CAST(sty AS DOUBLE) - CAST(st AS DOUBLE)
             |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |      / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)
             |        * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)))
             |      * (CAST(sty AS DOUBLE) - CAST(st AS DOUBLE)
             |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
             |      / (CAST(n AS DOUBLE) - 2.0) AS s2
             |  FROM dn CROSS JOIN m)
             |SELECT day, c, round(r * 10000.0) / 10000.0 AS residual,
             |  round(h * 1000000.0) / 1000000.0 AS leverage,
             |  round(r * r / (2.0 * s2) * (h / ((1.0 - h) * (1.0 - h)))
             |    * 1000000.0) / 1000000.0 AS cooks_d
             |FROM k
             |ORDER BY r * r / (2.0 * s2) * (h / ((1.0 - h) * (1.0 - h))) DESC,
             |  day
             |LIMIT 5""".stripMargin)),

    // ---- PSI (population stability index) of order value, later years
    // vs the <=1994 baseline, over the baseline's decile bins (bounds
    // rounded 4 dp as the shared binning contract; counts Laplace-
    // smoothed +0.5) — THE model-monitoring drift number, next to
    // q201's KS and q221's JS.
    Q("q297_psi_drift",
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_totalprice").as("v"),
          (year(col("o_orderdate")) <= 1994).as("p1"))
        val bAggs = (1 to 9).map(i =>
          (round(expr(s"percentile(v, 0.$i)") * 10000.0) / 10000.0)
            .as(s"b$i"))
        val bounds = o.where(col("p1")).agg(bAggs.head, bAggs.tail: _*)
        val bin = (1 to 9).map(i =>
          when(col("v") > col(s"b$i"), 1L).otherwise(0L)).reduce(_ + _)
        val counts = o.join(broadcast(bounds))
          .select(bin.as("bin"), col("p1"))
          .groupBy("bin")
          .agg(sum(when(col("p1"), 1L).otherwise(0L)).as("n1"),
            sum(when(!col("p1"), 1L).otherwise(0L)).as("n2"))
        val full = o.sparkSession.range(10).select(col("id").as("bin"))
          .join(counts, Seq("bin"), "left")
          .select(col("bin"), coalesce(col("n1"), lit(0L)).as("n1"),
            coalesce(col("n2"), lit(0L)).as("n2"))
        val tot = full.agg(sum("n1").as("t1"), sum("n2").as("t2"))
        val p1s = (col("n1").cast("double") + 0.5) /
          (col("t1").cast("double") + 5.0)
        val p2s = (col("n2").cast("double") + 0.5) /
          (col("t2").cast("double") + 5.0)
        val term = (p2s - p1s) * log(p2s / p1s)
        val terms = full.join(broadcast(tot))
          .select(col("bin"), col("n1"), col("n2"), term.as("term"))
        val worst = terms.orderBy(abs(col("term")).desc, col("bin"))
          .limit(1)
          .select(col("bin").cast("long").as("worst_bin"),
            (round(col("term") * 1000000.0) / 1000000.0).as("worst_term"))
        terms.agg(sum("n1").cast("long").as("n_p1"),
            sum("n2").cast("long").as("n_p2"),
            (round(sum("term") * 1000000.0) / 1000000.0).as("psi"))
          .join(broadcast(worst))
      },
      Some("""WITH o AS (SELECT o_totalprice AS v,
             |    year(o_orderdate) <= 1994 AS p1 FROM orders),
             |bd AS (SELECT
             |    round(quantile_cont(v, 0.1) * 10000.0) / 10000.0 AS b1,
             |    round(quantile_cont(v, 0.2) * 10000.0) / 10000.0 AS b2,
             |    round(quantile_cont(v, 0.3) * 10000.0) / 10000.0 AS b3,
             |    round(quantile_cont(v, 0.4) * 10000.0) / 10000.0 AS b4,
             |    round(quantile_cont(v, 0.5) * 10000.0) / 10000.0 AS b5,
             |    round(quantile_cont(v, 0.6) * 10000.0) / 10000.0 AS b6,
             |    round(quantile_cont(v, 0.7) * 10000.0) / 10000.0 AS b7,
             |    round(quantile_cont(v, 0.8) * 10000.0) / 10000.0 AS b8,
             |    round(quantile_cont(v, 0.9) * 10000.0) / 10000.0 AS b9
             |  FROM o WHERE p1),
             |cn AS (SELECT (CASE WHEN v > b1 THEN 1 ELSE 0 END
             |    + CASE WHEN v > b2 THEN 1 ELSE 0 END
             |    + CASE WHEN v > b3 THEN 1 ELSE 0 END
             |    + CASE WHEN v > b4 THEN 1 ELSE 0 END
             |    + CASE WHEN v > b5 THEN 1 ELSE 0 END
             |    + CASE WHEN v > b6 THEN 1 ELSE 0 END
             |    + CASE WHEN v > b7 THEN 1 ELSE 0 END
             |    + CASE WHEN v > b8 THEN 1 ELSE 0 END
             |    + CASE WHEN v > b9 THEN 1 ELSE 0 END) AS bin,
             |    p1 FROM o CROSS JOIN bd),
             |g AS (SELECT bin, sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS n2
             |  FROM cn GROUP BY bin),
             |fl AS (SELECT r.bin, coalesce(n1, 0) AS n1, coalesce(n2, 0) AS n2
             |  FROM (SELECT unnest(range(0, 10)) AS bin) r
             |  LEFT JOIN g ON g.bin = r.bin),
             |tt AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM fl),
             |tm AS (SELECT bin, n1, n2,
             |    ((CAST(n2 AS DOUBLE) + 0.5) / (CAST(t2 AS DOUBLE) + 5.0)
             |      - (CAST(n1 AS DOUBLE) + 0.5) / (CAST(t1 AS DOUBLE) + 5.0))
             |    * ln(((CAST(n2 AS DOUBLE) + 0.5) / (CAST(t2 AS DOUBLE) + 5.0))
             |      / ((CAST(n1 AS DOUBLE) + 0.5) / (CAST(t1 AS DOUBLE) + 5.0)))
             |    AS term
             |  FROM fl CROSS JOIN tt),
             |wo AS (SELECT CAST(bin AS BIGINT) AS worst_bin,
             |    round(term * 1000000.0) / 1000000.0 AS worst_term
             |  FROM tm ORDER BY abs(term) DESC, bin LIMIT 1),
             |ag AS (SELECT CAST(sum(n1) AS BIGINT) AS n_p1,
             |    CAST(sum(n2) AS BIGINT) AS n_p2,
             |    round(sum(term) * 1000000.0) / 1000000.0 AS psi FROM tm)
             |SELECT n_p1, n_p2, psi, worst_bin, worst_term
             |FROM ag CROSS JOIN wo""".stripMargin)),

    // ---- point-in-time feature join: purchases look up the SCD2
    // status (q169's intervals built from signup/error changes) valid
    // AT purchase time — the feature-store correctness join that
    // prevents label leakage.
    Q("q298_pit_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val scd = graft.operators.EventOps.scdType2(
          ev.where(col("event_type").isin("signup", "error"))
            .select(col("user_id"), col("event_type").as("status"),
              col("ts"), col("event_id")),
          "user_id", "status", "ts", "event_id")
          .select(col("user_id").as("su"), col("status"), col("version"),
            col("valid_from"), col("valid_to"))
        val f = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
            col("ts").as("pts"))
        f.join(scd, col("user_id") === col("su") &&
            col("valid_from") <= col("pts") &&
            (col("valid_to").isNull || col("pts") < col("valid_to")),
            "left")
          .select(col("user_id"), col("pid"),
            expr("pts div 1000").as("ts_us"), col("status"), col("version"))
          .orderBy("pid")
      },
      Some("""WITH ch AS (SELECT user_id, event_type AS status, ts, event_id
             |  FROM events WHERE event_type IN ('signup', 'error')),
             |runs AS (SELECT user_id, status, ts, event_id FROM (
             |    SELECT user_id, status, ts, event_id,
             |      lag(status) OVER (PARTITION BY user_id
             |        ORDER BY ts, event_id) AS pv FROM ch)
             |  WHERE pv IS NULL OR pv <> status),
             |scd AS (SELECT user_id AS su, status,
             |    CAST(row_number() OVER w AS BIGINT) AS version,
             |    ts AS vf, lead(ts) OVER w AS vt
             |  FROM runs WINDOW w AS (PARTITION BY user_id
             |    ORDER BY ts, event_id)),
             |f AS (SELECT user_id, event_id AS pid, ts AS pts FROM events
             |  WHERE event_type = 'purchase')
             |SELECT f.user_id, pid, epoch_us(pts) AS ts_us, scd.status,
             |  scd.version
             |FROM f LEFT JOIN scd ON scd.su = f.user_id AND scd.vf <= f.pts
             |  AND (scd.vt IS NULL OR f.pts < scd.vt)
             |ORDER BY pid""".stripMargin)),

    // ---- PCA whitening audit: scale the q162 projections by 1/sqrt(λ)
    // (quantized 1e-6) and verify the whitened component covariance is
    // the identity — diag 1, off-diag 0 — in exact integer micro-unit
    // sums. The decorrelation CONTRACT of the PCA front-end, measured.
    Q("q299_pca_whitening",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val emb = t(s, d, "embeddings")
        val (_, _, cov) = graft.operators.Pca.model(emb, 64)
        val lambdas = graft.operators.Pca.topEigen(cov, 4).map(_._1)
        val proj = graft.operators.Pca.project(emb, 64, k = 4)
        val w = proj.select(
          (0 until 4).map(r => round(col(s"p$r") /
            lit(math.sqrt(lambdas(r))) * 1000000.0).cast("long")
            .as(s"w$r")): _*)
        val pairIdx = for { a <- 0 until 4; b <- a until 4 } yield (a, b)
        val aggs = pairIdx.map { case (a, b) =>
          sum(col(s"w$a").cast(dec) * col(s"w$b").cast(dec)).as(s"s${a}_$b")
        } ++ (0 until 4).map(r => sum(col(s"w$r").cast(dec)).as(s"m$r")) :+
          count(lit(1)).cast(dec).as("n")
        val g = w.agg(aggs.head, aggs.tail: _*)
        val nD = col("n").cast("double")
        val entries = pairIdx.map { case (a, b) =>
          struct(lit(a.toLong).as("a"), lit(b.toLong).as("b"),
            (round((col(s"s${a}_$b").cast("double") / nD -
              (col(s"m$a").cast("double") / nD) *
                (col(s"m$b").cast("double") / nD)) / 1.0e12 * 10000.0)
              / 10000.0).as("cov_w"))
        }
        g.select(explode(array(entries: _*)).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"),
            col("e.cov_w").as("cov_w"))
          .orderBy("a", "b")
      },
      Some {
        val ps = (1 to 4).map { r =>
          s"""round(list_reduce([w$r[i+1] * (q[i+1]/10000.0 - mu[i+1])
             |      for i in range(0, 64)], (a,b) -> a + b) * 1000000.0)/1000000.0 AS p${r - 1}"""
            .stripMargin
        }.mkString(",\n  ")
        val joins = (1 to 4).map(r =>
          s"CROSS JOIN (SELECT v AS w$r FROM v$r) a$r").mkString(" ")
        val lj = (1 to 4).map(r =>
          s"CROSS JOIN (SELECT l AS la${r - 1} FROM l$r) x${r - 1}")
          .mkString(" ")
        val wqs = (0 until 4).map(r =>
          s"CAST(round(p$r / sqrt(la$r) * 1000000.0) AS BIGINT) AS w$r")
          .mkString(",\n    ")
        val pairIdx = for { a <- 0 until 4; b <- a until 4 } yield (a, b)
        val sums = pairIdx.map { case (a, b) =>
          s"sum(CAST(w$a AS HUGEINT) * CAST(w$b AS HUGEINT)) AS s${a}_$b"
        }.mkString(", ") + ", " + (0 until 4).map(r =>
          s"CAST(sum(w$r) AS HUGEINT) AS m$r").mkString(", ") +
          ", CAST(count(*) AS HUGEINT) AS n"
        val arms = pairIdx.map { case (a, b) =>
          s"""SELECT CAST($a AS BIGINT) AS a, CAST($b AS BIGINT) AS b,
             |  round((CAST(s${a}_$b AS DOUBLE) / CAST(n AS DOUBLE)
             |    - (CAST(m$a AS DOUBLE) / CAST(n AS DOUBLE))
             |      * (CAST(m$b AS DOUBLE) / CAST(n AS DOUBLE)))
             |    / 1000000000000.0 * 10000.0) / 10000.0 AS cov_w FROM gg"""
            .stripMargin
        }.mkString("\nUNION ALL ")
        s"""WITH RECURSIVE ${pcaCtes(64, 4, 40)},
           |pr AS MATERIALIZED (SELECT vec_id,
           |  $ps
           |FROM qid $joins CROSS JOIN mu),
           |wq AS MATERIALIZED (SELECT
           |    $wqs
           |  FROM pr $lj),
           |gg AS (SELECT $sums FROM wq)
           |SELECT * FROM (
           |$arms) ORDER BY a, b""".stripMargin
      }),

    // ---- pipeline v5 — the session-4 curation funnel: contract gate ->
    // above-mean trained-classifier keep -> exact dedup (min-id per text)
    // -> shingle near-dup cluster canonicalization; one row per stage
    // with survivors. The flagship composition of the new tier.
    Q("q300_pipeline_v5",
      (s, d) => {
        import graft.operators.{Dedup, QualityClassifier}
        val docs = t(s, d, "documents").localCheckpoint()
        val gated = docs.where(col("text").isNotNull &&
          size(split(col("text"), " ")) >= 5)
        val w = logregModel(docs)
        // keep the above-mean-score half: su·n > Σsu compared in exact
        // integers (the q294 cross-multiplication — no float boundary)
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val scored = QualityClassifier.score(gated, w).select(col("doc_id"),
          round(col("score") * 1000000.0).cast("long").as("su"))
        val stat = scored.agg(sum(col("su")).cast(dec).as("ssum"),
          count(lit(1)).cast(dec).as("sn"))
        val kept = gated.join(scored.join(broadcast(stat))
          .where(col("su").cast(dec) * col("sn") > col("ssum"))
          .select("doc_id"), Seq("doc_id"), "left_semi")
          .localCheckpoint()
        val exact = kept.join(kept.groupBy("text")
          .agg(min("doc_id").as("doc_id")).select("doc_id"),
          Seq("doc_id"), "left_semi").localCheckpoint()
        val drop = Dedup.duplicateClusters(
          Dedup.shingleJaccardPairs(exact, 0.5)
            .select(col("id_a"), col("id_b")))
          .where(col("doc_id") =!= col("cluster")).select("doc_id")
        val fin = exact.join(drop, Seq("doc_id"), "left_anti")
        Seq("s0_raw" -> docs, "s1_gated" -> gated, "s2_quality" -> kept,
          "s3_exact_dedup" -> exact, "s4_near_dedup" -> fin)
          .map { case (n, df) =>
            df.agg(count(lit(1)).cast("long").as("n_rows"))
              .select(lit(n).as("stage"), col("n_rows"))
          }.reduce(_ unionByName _).orderBy("stage")
      },
      Some(s"""WITH RECURSIVE ${logregCtes(3)},
              |g AS MATERIALIZED (SELECT d.doc_id, d.text FROM documents d
              |  WHERE d.text IS NOT NULL
              |    AND len(string_split(d.text, ' ')) >= 5),
              |scu AS MATERIALIZED (SELECT g.doc_id, g.text,
              |    CAST(round(1.0/(1.0 + exp(-(w1*(x1/1000000.0)
              |      + w2*(x2/1000000.0) + w3*(x3/1000000.0)
              |      + w4*(x4/1000000.0) + w5*(x5/1000000.0))))
              |      * 1000000.0) AS BIGINT) AS su
              |  FROM g JOIN fx ON fx.doc_id = g.doc_id CROSS JOIN wfin),
              |st AS (SELECT CAST(sum(su) AS HUGEINT) AS ssum,
              |    CAST(count(*) AS HUGEINT) AS sn FROM scu),
              |sc AS MATERIALIZED (SELECT doc_id, text FROM scu CROSS JOIN st
              |  WHERE CAST(su AS HUGEINT) * sn > ssum),
              |ex AS MATERIALIZED (SELECT sc.doc_id, sc.text FROM sc JOIN (
              |    SELECT min(doc_id) AS doc_id FROM sc GROUP BY text) k
              |  ON k.doc_id = sc.doc_id),
              |ws2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM ex),
              |sh2 AS (SELECT doc_id, unnest(list_distinct(
              |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
              |     for i in range(1, len(w) - 1)])) AS s
              |  FROM ws2 WHERE len(w) >= 3),
              |cnt2 AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
              |inter2 AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
              |  FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |pairs2 AS (SELECT ia, ib FROM inter2
              |  JOIN cnt2 ca ON ca.doc_id = ia JOIN cnt2 cb ON cb.doc_id = ib
              |  WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5),
              |edges2 AS (SELECT ia AS u, ib AS v FROM pairs2
              |  UNION SELECT ib, ia FROM pairs2),
              |reach2 AS (SELECT u AS src, u AS dst FROM edges2
              |  UNION SELECT r.src, e.v FROM reach2 r JOIN edges2 e
              |    ON r.dst = e.u),
              |cl AS (SELECT src AS doc_id, min(dst) AS cluster FROM reach2
              |  GROUP BY src),
              |dr AS (SELECT doc_id FROM cl WHERE doc_id <> cluster)
              |SELECT * FROM (
              |  SELECT 's0_raw' AS stage, CAST(count(*) AS BIGINT) AS n_rows
              |  FROM documents
              |  UNION ALL SELECT 's1_gated', CAST(count(*) AS BIGINT) FROM g
              |  UNION ALL SELECT 's2_quality', CAST(count(*) AS BIGINT) FROM sc
              |  UNION ALL SELECT 's3_exact_dedup', CAST(count(*) AS BIGINT)
              |    FROM ex
              |  UNION ALL SELECT 's4_near_dedup', CAST(count(*) AS BIGINT)
              |    FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM dr))
              |ORDER BY stage""".stripMargin),
      bench = true),

    // ---- Theil inequality decomposition of order value by customer
    // segment: T_total = T_between + sum share_g * T_g — q207's Gini
    // says HOW unequal; Theil says WHERE the inequality lives (between
    // segments or inside them). Exact cent sums feed the log chains.
    Q("q301_theil_decomposition",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val o = t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("g"),
            round(col("o_totalprice").cast("double") * 100.0).cast("long")
              .as("x"))
          .localCheckpoint() // two passes: moments, then per-row logs
        val gm = o.groupBy("g").agg(count(lit(1)).cast(dec).as("ng"),
          sum(col("x")).cast(dec).as("xg"))
        val tot = gm.agg(sum(col("ng")).as("n"), sum(col("xg")).as("xt"))
        val mu = col("xt").cast("double") / col("n").cast("double")
        val mug = col("xg").cast("double") / col("ng").cast("double")
        // within: per-row (x/mu_g) ln(x/mu_g) averaged inside the group
        val withinTerms = o.join(broadcast(gm), Seq("g"))
          .select(col("g"), ((col("x").cast("double") / mug) *
            log(col("x").cast("double") / mug)).as("t"))
          .groupBy("g").agg(sum("t").as("st"))
        val rows = gm.join(broadcast(tot)).join(withinTerms, Seq("g"))
          .select(concat(lit("within_"), col("g")).as("component"),
            col("ng").cast("long").as("n"),
            (round((col("xg").cast("double") / col("xt").cast("double")) *
              (col("st") / col("ng").cast("double")) * 1000000.0)
              / 1000000.0).as("theil"))
        val between = gm.join(broadcast(tot))
          .select(((col("xg").cast("double") / col("xt").cast("double")) *
            log(mug / mu)).as("t"), col("ng"))
          .agg(sum("ng").cast("long").as("n"),
            (round(sum("t") * 1000000.0) / 1000000.0).as("theil"))
          .select(lit("zz_between").as("component"), col("n"), col("theil"))
        val total = o.join(broadcast(tot))
          .select(((col("x").cast("double") / mu) *
            log(col("x").cast("double") / mu)).as("t"))
          .agg((round(sum("t") * 1000000.0) / 1000000.0).as("tt"))
          .join(broadcast(tot))
          .select(lit("zz_total").as("component"),
            col("n").cast("long").as("n"),
            (round(col("tt") / col("n").cast("double") * 1000000.0)
              / 1000000.0).as("theil"))
        rows.unionByName(between).unionByName(total).orderBy("component")
      },
      Some("""WITH o AS (SELECT c_mktsegment AS g,
             |    CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT) AS x
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |gm AS (SELECT g, CAST(count(*) AS HUGEINT) AS ng,
             |    CAST(sum(x) AS HUGEINT) AS xg FROM o GROUP BY g),
             |tt AS (SELECT sum(ng) AS n, sum(xg) AS xt FROM gm),
             |wt AS (SELECT o.g, sum((CAST(x AS DOUBLE)
             |      / (CAST(xg AS DOUBLE) / CAST(ng AS DOUBLE)))
             |    * ln(CAST(x AS DOUBLE)
             |      / (CAST(xg AS DOUBLE) / CAST(ng AS DOUBLE)))) AS st
             |  FROM o JOIN gm ON gm.g = o.g GROUP BY o.g),
             |rows0 AS (SELECT 'within_' || gm.g AS component,
             |    CAST(ng AS BIGINT) AS n,
             |    round((CAST(xg AS DOUBLE) / CAST(xt AS DOUBLE))
             |      * (st / CAST(ng AS DOUBLE)) * 1000000.0) / 1000000.0 AS theil
             |  FROM gm CROSS JOIN tt JOIN wt ON wt.g = gm.g),
             |btw AS (SELECT 'zz_between' AS component,
             |    CAST(sum(ng) AS BIGINT) AS n,
             |    round(sum((CAST(xg AS DOUBLE) / CAST(xt AS DOUBLE))
             |      * ln((CAST(xg AS DOUBLE) / CAST(ng AS DOUBLE))
             |        / (CAST(xt AS DOUBLE) / CAST(n AS DOUBLE)))) * 1000000.0)
             |      / 1000000.0 AS theil
             |  FROM gm CROSS JOIN tt GROUP BY xt, n),
             |ttl AS (SELECT 'zz_total' AS component, CAST(n AS BIGINT) AS n,
             |    round(round(sum((CAST(x AS DOUBLE)
             |        / (CAST(xt AS DOUBLE) / CAST(n AS DOUBLE)))
             |      * ln(CAST(x AS DOUBLE)
             |        / (CAST(xt AS DOUBLE) / CAST(n AS DOUBLE)))) * 1000000.0)
             |      / 1000000.0 / CAST(n AS DOUBLE) * 1000000.0) / 1000000.0
             |      AS theil
             |  FROM o CROSS JOIN tt GROUP BY n)
             |SELECT * FROM (SELECT * FROM rows0
             |  UNION ALL SELECT * FROM btw UNION ALL SELECT * FROM ttl)
             |ORDER BY component""".stripMargin)),

    // ---- per-user feature assembly (the feature-store build): RFM +
    // tenure + activity cadence + type entropy in one user-keyed pass
    // over the sampled users.
    Q("q302_user_features",
      (s, d) => {
        val dayNs = 86400L * 1000000000L
        val ev = Tables.events(s, d)
          .where(pmod(col("user_id"), lit(20)) === 0)
          .select(col("user_id"), col("event_type"),
            expr(s"ts div $dayNs").as("day"),
            when(col("event_type") === "purchase",
              round(col("value") * 100.0).cast("long")).otherwise(0L)
              .as("cents"))
          .localCheckpoint() // feeds the base and the entropy passes
        val base = ev.groupBy("user_id").agg(
          count(lit(1)).cast("long").as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purchases"),
          sum(col("cents")).as("spend_cents"),
          min("day").as("d0"), max("day").as("d1"),
          countDistinct("day").as("active_days"))
        val perType = ev.groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("c"))
        val entropy = perType
          .join(perType.groupBy("user_id").agg(sum("c").as("nt")), "user_id")
          .select(col("user_id"),
            (-(col("c").cast("double") / col("nt").cast("double")) *
              log(col("c").cast("double") / col("nt").cast("double")))
              .as("t"))
          .groupBy("user_id")
          .agg((round(sum("t") * 1000000.0) / 1000000.0).as("type_entropy"))
        base.join(entropy, Seq("user_id"))
          .select(col("user_id"), col("n_events"), col("n_purchases"),
            (round(col("spend_cents").cast("double") / 100.0 * 100.0)
              / 100.0).as("spend"),
            (col("d1") - col("d0") + 1).cast("long").as("tenure_days"),
            col("active_days").cast("long").as("active_days"),
            (round(col("n_events").cast("double") /
              col("active_days").cast("double") * 10000.0) / 10000.0)
              .as("events_per_active_day"),
            col("type_entropy"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |    epoch_us(ts) // 86400000000 AS day,
             |    CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END AS cents
             |  FROM events WHERE user_id % 20 = 0),
             |b AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_purchases,
             |    sum(cents) AS spend_cents, min(day) AS d0, max(day) AS d1,
             |    count(DISTINCT day) AS active_days FROM ev GROUP BY user_id),
             |pt AS (SELECT user_id, event_type, count(*) AS c FROM ev
             |  GROUP BY 1, 2),
             |nt AS (SELECT user_id, sum(c) AS nt FROM pt GROUP BY 1),
             |en AS (SELECT pt.user_id,
             |    round(sum(-(CAST(c AS DOUBLE) / CAST(nt AS DOUBLE))
             |      * ln(CAST(c AS DOUBLE) / CAST(nt AS DOUBLE))) * 1000000.0)
             |      / 1000000.0 AS type_entropy
             |  FROM pt JOIN nt ON nt.user_id = pt.user_id GROUP BY pt.user_id)
             |SELECT b.user_id, n_events, n_purchases,
             |  round(CAST(spend_cents AS DOUBLE) / 100.0 * 100.0) / 100.0
             |    AS spend,
             |  CAST(d1 - d0 + 1 AS BIGINT) AS tenure_days,
             |  CAST(active_days AS BIGINT) AS active_days,
             |  round(CAST(n_events AS DOUBLE) / CAST(active_days AS DOUBLE)
             |    * 10000.0) / 10000.0 AS events_per_active_day,
             |  type_entropy
             |FROM b JOIN en ON en.user_id = b.user_id
             |ORDER BY b.user_id""".stripMargin)),

    // ---- streaming sliding windows: the q282 batch window replayed
    // through Structured Streaming (AvailableNow, COMPLETE mode — every
    // window in the final state) — batch/stream equivalence on the
    // 1h/15min sliding shape, hash-checked against the SAME oracle.
    Q("q303_stream_sliding",
      (s, d) => graft.streaming.EventsStream
        .slidingWindowCounts(s, d.stripSuffix("/"))
        .orderBy("start_us"),
      Some("""WITH sl AS (SELECT (epoch_us(ts) // 900000000 - j.j) * 900000000
             |    AS start_us
             |  FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j)
             |SELECT start_us, start_us + 3600000000 AS end_us,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM sl GROUP BY start_us ORDER BY start_us""".stripMargin)),

    // ---- community quality of the q170 label-prop partition:
    // per-community modularity contribution and conductance over the
    // weighted trade graph — exact integer edge weights, one double
    // chain per community. Q says "is this partition better than
    // chance"; conductance says "which community leaks".
    Q("q304_community_quality",
      (s, d) => {
        val raw = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation").select(
            col("n_nationkey").as("ck"), col("n_name").as("src"))),
            col("c_nationkey") === col("ck"))
          .join(broadcast(t(s, d, "nation").select(
            col("n_nationkey").as("sk"), col("n_name").as("dst"))),
            col("s_nationkey") === col("sk"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        val avgW = raw.agg(avg(col("w")).as("aw"))
        val edges = raw.join(broadcast(avgW))
          .where(col("w").cast("double") > col("aw"))
          .select("src", "dst", "w")
        val labels = graft.operators.GraphOps.labelPropagation(edges, 4)
        val noSelf = edges.where(col("src") =!= col("dst"))
        val sym = noSelf.select(col("src"), col("dst"), col("w"))
          .union(noSelf.select(col("dst").as("src"), col("src").as("dst"),
            col("w")))
          .groupBy("src", "dst").agg(sum("w").as("w"))
        val lab = labels.select(col("node"), col("label"))
        val j = sym
          .join(lab.select(col("node").as("src"), col("label").as("la")),
            Seq("src"))
          .join(lab.select(col("node").as("dst"), col("label").as("lb")),
            Seq("dst"))
        val m2 = j.agg(sum("w").as("m2"))
        val per = j.groupBy(col("la").as("label"))
          .agg(sum("w").as("d_c"),
            sum(when(col("la") === col("lb"), col("w")).otherwise(0L))
              .as("e2_c"))
        val nper = lab.groupBy("label").agg(count(lit(1)).as("n_nodes"))
        per.join(nper, Seq("label")).join(broadcast(m2))
          .select(col("label"), col("n_nodes").cast("long").as("n_nodes"),
            col("d_c").cast("long").as("degree_w"),
            col("e2_c").cast("long").as("internal2_w"),
            (col("d_c") - col("e2_c")).cast("long").as("cut_w"),
            // a community holding ALL volume has no outside to leak to:
            // conductance undefined -> NULL (ANSI raises on x/0.0)
            when(least(col("d_c").cast("double"),
              col("m2").cast("double") - col("d_c").cast("double")) > 0.0,
              round(((col("d_c") - col("e2_c")).cast("double") /
                least(col("d_c").cast("double"),
                  col("m2").cast("double") - col("d_c").cast("double")))
                * 1000000.0) / 1000000.0).as("conductance"),
            (round((col("e2_c").cast("double") / col("m2").cast("double") -
              (col("d_c").cast("double") / col("m2").cast("double")) *
                (col("d_c").cast("double") / col("m2").cast("double")))
              * 1000000.0) / 1000000.0).as("q_contrib"))
          .orderBy("label")
      },
      Some {
        val rounds = (1 to 4).map { r =>
          s"""l$r AS (SELECT p.node, coalesce(t.label, p.label) AS label
             |  FROM l${r - 1} p LEFT JOIN (
             |    SELECT v, label FROM (
             |      SELECT s.src AS v, q.label AS label, sum(s.w) AS ws,
             |        row_number() OVER (PARTITION BY s.src
             |          ORDER BY sum(s.w) DESC, q.label) AS rn
             |      FROM sym s JOIN l${r - 1} q ON q.node = s.dst
             |      GROUP BY s.src, q.label) z WHERE rn = 1) t ON t.v = p.node)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH raw AS (SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation cn ON c_nationkey = cn.n_nationkey
           |  JOIN nation sn ON s_nationkey = sn.n_nationkey
           |  GROUP BY 1, 2),
           |aw AS (SELECT avg(w) AS aw FROM raw),
           |ed AS (SELECT src, dst, w FROM raw, aw WHERE w > aw),
           |sym AS (SELECT src, dst, sum(w) AS w FROM (
           |    SELECT src, dst, w FROM ed WHERE src <> dst
           |    UNION ALL
           |    SELECT dst AS src, src AS dst, w FROM ed WHERE src <> dst)
           |  GROUP BY 1, 2),
           |nodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
           |l0 AS (SELECT node, node AS label FROM nodes),
           |$rounds,
           |jj AS (SELECT s.w, la.label AS la, lb.label AS lb
           |  FROM sym s JOIN l4 la ON la.node = s.src
           |  JOIN l4 lb ON lb.node = s.dst),
           |m2 AS (SELECT sum(w) AS m2 FROM jj),
           |per AS (SELECT la AS label, sum(w) AS d_c,
           |    sum(CASE WHEN la = lb THEN w ELSE 0 END) AS e2_c
           |  FROM jj GROUP BY la),
           |np AS (SELECT label, count(*) AS n_nodes FROM l4 GROUP BY label)
           |SELECT per.label, CAST(n_nodes AS BIGINT) AS n_nodes,
           |  CAST(d_c AS BIGINT) AS degree_w,
           |  CAST(e2_c AS BIGINT) AS internal2_w,
           |  CAST(d_c - e2_c AS BIGINT) AS cut_w,
           |  CASE WHEN least(CAST(d_c AS DOUBLE),
           |      CAST(m2 AS DOUBLE) - CAST(d_c AS DOUBLE)) > 0.0
           |    THEN round((CAST(d_c - e2_c AS DOUBLE)
           |      / least(CAST(d_c AS DOUBLE),
           |        CAST(m2 AS DOUBLE) - CAST(d_c AS DOUBLE))) * 1000000.0)
           |      / 1000000.0 END AS conductance,
           |  round((CAST(e2_c AS DOUBLE) / CAST(m2 AS DOUBLE)
           |    - (CAST(d_c AS DOUBLE) / CAST(m2 AS DOUBLE))
           |      * (CAST(d_c AS DOUBLE) / CAST(m2 AS DOUBLE))) * 1000000.0)
           |    / 1000000.0 AS q_contrib
           |FROM per JOIN np ON np.label = per.label CROSS JOIN m2
           |ORDER BY per.label""".stripMargin
      }),

    // ---- personalized PageRank: teleport mass returns to the two seed
    // nations — "important relative to THESE markets". Same fixed-round
    // float replay as q113 (final 6-dp rounding absorbs sub-ulp
    // accumulation differences).
    Q("q305_personalized_pagerank",
      (s, d) => {
        val raw = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation").select(
            col("n_nationkey").as("ck"), col("n_name").as("src"))),
            col("c_nationkey") === col("ck"))
          .join(broadcast(t(s, d, "nation").select(
            col("n_nationkey").as("sk"), col("n_name").as("dst"))),
            col("s_nationkey") === col("sk"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.operators.GraphOps.personalizedPageRank(raw,
          Seq("NATION_0", "NATION_1"), iterations = 5)
          .select(col("node"), (round(col("rank") * 1000000.0) / 1000000.0)
            .as("rank"))
          .orderBy("node")
      },
      Some {
        val rounds = (1 to 5).map { r =>
          s"""r$r AS (SELECT v.node, 0.15000000000000002 * v.pri
             |    + 0.85 * coalesce((SELECT sum(m.p * r.rank) FROM norm m
             |      JOIN r${r - 1} r ON r.node = m.src
             |      WHERE m.dst = v.node), 0.0) AS rank
             |  FROM sd v)""".stripMargin
        }.mkString(",\n")
        s"""WITH edges AS (SELECT cn.n_name AS src, sn.n_name AS dst,
           |    CAST(count(*) AS DOUBLE) AS w
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation cn ON c_nationkey = cn.n_nationkey
           |  JOIN nation sn ON s_nationkey = sn.n_nationkey
           |  GROUP BY 1, 2),
           |norm AS (SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p
           |  FROM edges),
           |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
           |sd AS (SELECT node, CASE WHEN node IN ('NATION_0', 'NATION_1')
           |    THEN 0.5 ELSE 0.0 END AS pri FROM nodes),
           |r0 AS (SELECT node, pri AS rank FROM sd),
           |$rounds
           |SELECT node, round(rank * 1000000.0) / 1000000.0 AS rank
           |FROM r5 ORDER BY node""".stripMargin
      }),

    // ---- dedup threshold sensitivity: pair volume, touched docs, and
    // cluster count at Jaccard 0.3/0.5/0.7/0.9 — the tuning table that
    // says where the near-dup knob actually bites. ONE candidate pass
    // at the loosest threshold; each arm filters the rounded jaccard
    // and re-clusters (pair-subset-sized work).
    Q("q306_dedup_threshold_sweep",
      (s, d) => {
        val pairs = Dedup.shingleJaccardPairs(t(s, d, "documents"), 0.3)
          .select(col("id_a"), col("id_b"), col("jaccard"))
          .localCheckpoint() // all four arms filter this one pass
        Seq(0.3, 0.5, 0.7, 0.9).map { tau =>
          val p = pairs.where(col("jaccard") >= tau).localCheckpoint()
          val nd = p.select(explode(array(col("id_a"), col("id_b")))
            .as("id")).distinct()
          val nc = Dedup.duplicateClusters(p).select("cluster").distinct()
          p.agg(count(lit(1)).cast("long").as("n_pairs"))
            .join(nd.agg(count(lit(1)).cast("long").as("n_docs")))
            .join(nc.agg(count(lit(1)).cast("long").as("n_clusters")))
            .select(lit(tau).as("threshold"), col("n_pairs"),
              col("n_docs"), col("n_clusters"))
        }.reduce(_ unionByName _).orderBy("threshold")
      },
      Some {
        val arms = Seq("0.3", "0.5", "0.7", "0.9").zipWithIndex.map {
          case (tau, i) =>
            s"""p$i AS MATERIALIZED (SELECT ia, ib FROM pr WHERE j >= $tau),
               |e$i AS (SELECT ia AS u, ib AS v FROM p$i
               |  UNION SELECT ib, ia FROM p$i),
               |r$i AS (SELECT u AS src, u AS dst FROM e$i
               |  UNION SELECT r.src, e.v FROM r$i r JOIN e$i e ON r.dst = e.u),
               |c$i AS (SELECT src, min(dst) AS cluster FROM r$i GROUP BY src),
               |a$i AS (SELECT CAST($tau AS DOUBLE) AS threshold,
               |    (SELECT CAST(count(*) AS BIGINT) FROM p$i) AS n_pairs,
               |    (SELECT CAST(count(DISTINCT id) AS BIGINT) FROM (
               |      SELECT ia AS id FROM p$i UNION ALL SELECT ib FROM p$i))
               |      AS n_docs,
               |    (SELECT CAST(count(DISTINCT cluster) AS BIGINT) FROM c$i)
               |      AS n_clusters)""".stripMargin
        }.mkString(",\n")
        val sel = (0 to 3).map(i => s"SELECT * FROM a$i")
          .mkString("\nUNION ALL ")
        s"""WITH RECURSIVE ws AS (SELECT doc_id, string_split(text, ' ') AS w
           |  FROM documents),
           |sh AS (SELECT doc_id, unnest(list_distinct(
           |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           |     for i in range(1, len(w) - 1)])) AS s
           |  FROM ws WHERE len(w) >= 3),
           |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
           |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |pr AS MATERIALIZED (SELECT ia, ib,
           |    round(i::DOUBLE / (ca.n + cb.n - i) * 1000000.0) / 1000000.0 AS j
           |  FROM inter JOIN cnt ca ON ca.doc_id = ia
           |  JOIN cnt cb ON cb.doc_id = ib
           |  WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.3),
           |$arms
           |SELECT * FROM ($sel) ORDER BY threshold""".stripMargin
      }),

    // ---- Poisson-bootstrap CI for the BUILDING-minus-MACHINERY mean
    // order-value gap: both groups resampled jointly per replicate with
    // the q266 deterministic draws — does the gap survive resampling.
    Q("q307_bootstrap_diff",
      (s, d) => graft.operators.Stats.poissonBootstrapMeanDiff(
        t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
          .where(col("c_mktsegment").isin("BUILDING", "MACHINERY") &&
            col("o_orderkey") % 20 === 0),
        col("o_orderkey"), col("o_totalprice"),
        col("c_mktsegment") === "BUILDING"),
      Some {
        val cdf = graft.operators.Stats.PoissonCdf
        val cases = cdf.zipWithIndex.map { case (c, i) =>
          s"WHEN CAST(h AS DOUBLE) / 1152921504606846976.0 < $c THEN $i"
        }.mkString("\n             ")
        s"""WITH base AS (SELECT CAST(o_orderkey AS VARCHAR) AS k,
           |    CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT) AS cents,
           |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
           |  FROM orders JOIN customer ON o_custkey = c_custkey
           |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
           |    AND o_orderkey % 20 = 0),
           |pt AS (SELECT (CAST(sum(CASE WHEN g1 = 1 THEN cents ELSE 0 END)
           |      AS DOUBLE) / CAST(sum(g1) AS DOUBLE)
           |    - CAST(sum(CASE WHEN g1 = 0 THEN cents ELSE 0 END) AS DOUBLE)
           |      / CAST(count(*) - sum(g1) AS DOUBLE)) / 100.0 AS pd
           |  FROM base),
           |rep AS (SELECT bb.b, base.cents, base.g1,
           |    CAST(('0x' || substr(md5(base.k || '@' || CAST(bb.b AS VARCHAR)),
           |      1, 15)) AS BIGINT) AS h
           |  FROM base CROSS JOIN (SELECT unnest(range(0, 100)) AS b) bb),
           |wts AS (SELECT b, cents, g1, CASE
           |    $cases
           |    ELSE 5 END AS w FROM rep),
           |g AS (SELECT b,
           |    sum(CASE WHEN g1 = 1 THEN CAST(w * cents AS HUGEINT)
           |      ELSE 0 END) AS ws1,
           |    sum(CASE WHEN g1 = 1 THEN w ELSE 0 END) AS wc1,
           |    sum(CASE WHEN g1 = 0 THEN CAST(w * cents AS HUGEINT)
           |      ELSE 0 END) AS ws0,
           |    sum(CASE WHEN g1 = 0 THEN w ELSE 0 END) AS wc0
           |  FROM wts GROUP BY b),
           |m AS (SELECT b, (CAST(ws1 AS DOUBLE) / CAST(wc1 AS DOUBLE)
           |    - CAST(ws0 AS DOUBLE) / CAST(wc0 AS DOUBLE)) / 100.0 AS m
           |  FROM g WHERE wc1 > 0 AND wc0 > 0),
           |rk AS (SELECT b, m, row_number() OVER (ORDER BY m, b) AS rk,
           |    row_number() OVER (ORDER BY m DESC, b DESC) AS rd FROM m),
           |ci AS (SELECT CAST(count(*) AS BIGINT) AS n_boot,
           |    max(CASE WHEN rk = (rk + rd + 18) // 20 THEN m END) AS lo,
           |    max(CASE WHEN rd = (rk + rd + 18) // 20 THEN m END) AS hi
           |  FROM rk)
           |SELECT n_boot, round(pd * 10000.0) / 10000.0 AS point_diff,
           |  round(lo * 10000.0) / 10000.0 AS lo90,
           |  round(hi * 10000.0) / 10000.0 AS hi90
           |FROM ci, pt""".stripMargin
      }),

    // ---- Kendall tau-b between two source rankings (mean doc length
    // vs corpus stopword rate): do the orderings agree, robust to any
    // monotone transform. Metrics are exact-integer ratios, so the
    // concordance counts are exact.
    Q("q308_kendall_tau",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val tk = split(col("text"), " ")
        val stops = size(filter(tk, x =>
          x.isin("the", "a", "of", "and", "to", "is")))
        val g = t(s, d, "documents").groupBy("source")
          .agg(count(lit(1)).cast(dec).as("n"),
            sum(size(tk).cast("long")).cast(dec).as("toks"),
            sum(stops.cast("long")).cast(dec).as("stp"))
          .select(col("source"),
            (col("toks").cast("double") / col("n").cast("double"))
              .as("mean_tokens"),
            (col("stp").cast("double") / col("toks").cast("double"))
              .as("stop_rate"))
        graft.operators.Stats.kendallTauB(g, "source",
          col("mean_tokens"), col("stop_rate"))
      },
      Some("""WITH g AS (SELECT source,
             |    CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(len(string_split(text, ' '))) AS HUGEINT) AS toks,
             |    CAST(sum(len(list_filter(string_split(text, ' '),
             |      x -> x IN ('the','a','of','and','to','is')))) AS HUGEINT)
             |      AS stp
             |  FROM documents GROUP BY source),
             |mt AS (SELECT source,
             |    CAST(toks AS DOUBLE) / CAST(n AS DOUBLE) AS x,
             |    CAST(stp AS DOUBLE) / CAST(toks AS DOUBLE) AS y FROM g),
             |pr AS (SELECT a.x - b.x AS dx, a.y - b.y AS dy
             |  FROM mt a JOIN mt b ON a.source < b.source),
             |agg AS (SELECT count(*) AS n_pairs,
             |    sum(CASE WHEN dx <> 0.0 AND dy <> 0.0
             |      AND (dx > 0.0) = (dy > 0.0) THEN 1 ELSE 0 END) AS c,
             |    sum(CASE WHEN dx <> 0.0 AND dy <> 0.0
             |      AND (dx > 0.0) <> (dy > 0.0) THEN 1 ELSE 0 END) AS d,
             |    sum(CASE WHEN dx = 0.0 THEN 1 ELSE 0 END) AS tx,
             |    sum(CASE WHEN dy = 0.0 THEN 1 ELSE 0 END) AS ty FROM pr)
             |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
             |  CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
             |  CAST(tx AS BIGINT) AS ties_x, CAST(ty AS BIGINT) AS ties_y,
             |  round(CAST(c - d AS DOUBLE)
             |    / sqrt(CAST(n_pairs - tx AS DOUBLE)
             |      * CAST(n_pairs - ty AS DOUBLE)) * 1000000.0) / 1000000.0
             |    AS tau_b
             |FROM agg""".stripMargin)),

    // ---- Spearman rho over the same two source metrics as q308:
    // tie-averaged ranks as exact doubled integers, Pearson of ranks
    // from exact decimal sums.
    Q("q309_spearman_rho",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val tk = split(col("text"), " ")
        val stops = size(filter(tk, x =>
          x.isin("the", "a", "of", "and", "to", "is")))
        val g = t(s, d, "documents").groupBy("source")
          .agg(count(lit(1)).cast(dec).as("n"),
            sum(size(tk).cast("long")).cast(dec).as("toks"),
            sum(stops.cast("long")).cast(dec).as("stp"))
          .select(col("source"),
            (col("toks").cast("double") / col("n").cast("double"))
              .as("mean_tokens"),
            (col("stp").cast("double") / col("toks").cast("double"))
              .as("stop_rate"))
        graft.operators.Stats.spearmanRho(g, "source",
          col("mean_tokens"), col("stop_rate"))
      },
      Some("""WITH g AS (SELECT source,
             |    CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(len(string_split(text, ' '))) AS HUGEINT) AS toks,
             |    CAST(sum(len(list_filter(string_split(text, ' '),
             |      x -> x IN ('the','a','of','and','to','is')))) AS HUGEINT)
             |      AS stp
             |  FROM documents GROUP BY source),
             |mt AS (SELECT source,
             |    CAST(toks AS DOUBLE) / CAST(n AS DOUBLE) AS x,
             |    CAST(stp AS DOUBLE) / CAST(toks AS DOUBLE) AS y FROM g),
             |rk AS (SELECT source,
             |    CAST(rank() OVER (ORDER BY x) * 2
             |      + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
             |    CAST(rank() OVER (ORDER BY y) * 2
             |      + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
             |  FROM mt),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(rx) AS HUGEINT) AS sx, CAST(sum(ry) AS HUGEINT) AS sy,
             |    sum(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
             |    sum(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy,
             |    sum(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy FROM rk)
             |SELECT CAST(n AS BIGINT) AS n_groups,
             |  CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0.0
             |      AND CAST(n * syy - sy * sy AS DOUBLE) > 0.0
             |    THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
             |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
             |        * CAST(n * syy - sy * sy AS DOUBLE)) * 1000000.0)
             |      / 1000000.0 END AS spearman_rho
             |FROM m""".stripMargin)),

    // ---- inverse-propensity off-policy evaluation: what would mean
    // event value be under a target policy (uniform over view/click)
    // given logs from the empirical behavior policy — IPS, the
    // self-normalized SNIPS, and the effective sample size that says
    // whether to trust them.
    Q("q310_ips_offline_eval",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type").as("a"), col("value").as("r"))
          .localCheckpoint() // feeds propensities + the weighted pass
        val mu = ev.groupBy("a").agg(count(lit(1)).as("na"))
        val tot = ev.agg(count(lit(1)).as("n"))
        val piT = when(col("a").isin("view", "click"), 0.5).otherwise(0.0)
        val wcol = piT / (col("na").cast("double") / col("n").cast("double"))
        val weighted = ev.join(broadcast(mu), Seq("a"))
          .join(broadcast(tot))
          .select(wcol.as("w"), col("r"))
        weighted.agg(count(lit(1)).cast("long").as("n"),
          (round(sum(col("w") * col("r")) /
            count(lit(1)).cast("double") * 10000.0) / 10000.0).as("ips"),
          (round(sum(col("w") * col("r")) / sum(col("w")) * 10000.0)
            / 10000.0).as("snips"),
          (round(sum(col("w")) * sum(col("w")) /
            sum(col("w") * col("w")) * 100.0) / 100.0).as("ess"))
      },
      Some("""WITH ev AS (SELECT event_type AS a, value AS r FROM events),
             |mu AS (SELECT a, count(*) AS na FROM ev GROUP BY a),
             |tt AS (SELECT count(*) AS n FROM ev),
             |wr AS (SELECT (CASE WHEN ev.a IN ('view', 'click') THEN 0.5
             |      ELSE 0.0 END
             |      / (CAST(na AS DOUBLE) / CAST(n AS DOUBLE))) AS w, r
             |  FROM ev JOIN mu ON mu.a = ev.a CROSS JOIN tt)
             |SELECT CAST(count(*) AS BIGINT) AS n,
             |  round(sum(w * r) / CAST(count(*) AS DOUBLE) * 10000.0)
             |    / 10000.0 AS ips,
             |  round(sum(w * r) / sum(w) * 10000.0) / 10000.0 AS snips,
             |  round(sum(w) * sum(w) / sum(w * w) * 100.0) / 100.0 AS ess
             |FROM wr""".stripMargin)),

    // ---- quantile treatment effects: the BUILDING-minus-MACHINERY
    // order-value gap at every decile — where in the distribution the
    // difference lives (means hide tail effects; q307 brackets only the
    // mean gap).
    Q("q311_quantile_effects",
      (s, d) => {
        val o = t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
          .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
        val aggs = (1 to 9).flatMap { i =>
          Seq((round(expr(s"percentile(CASE WHEN g = 'BUILDING' THEN v END, 0.$i)")
            * 10000.0) / 10000.0).as(s"qb$i"),
            (round(expr(s"percentile(CASE WHEN g = 'MACHINERY' THEN v END, 0.$i)")
              * 10000.0) / 10000.0).as(s"qm$i"))
        }
        val w = o.agg(aggs.head, aggs.tail: _*)
        val rows = (1 to 9).map(i => struct(lit(i.toLong).as("decile"),
          col(s"qb$i").as("q_building"), col(s"qm$i").as("q_machinery"),
          (round((col(s"qb$i") - col(s"qm$i")) * 10000.0) / 10000.0)
            .as("qte")))
        w.select(explode(array(rows: _*)).as("e"))
          .select(col("e.decile").as("decile"),
            col("e.q_building").as("q_building"),
            col("e.q_machinery").as("q_machinery"), col("e.qte").as("qte"))
          .orderBy("decile")
      },
      Some {
        val arms = (1 to 9).map(i =>
          s"""SELECT CAST($i AS BIGINT) AS decile,
             |  round(quantile_cont(CASE WHEN g = 'BUILDING' THEN v END, 0.$i)
             |    * 10000.0) / 10000.0 AS q_building,
             |  round(quantile_cont(CASE WHEN g = 'MACHINERY' THEN v END, 0.$i)
             |    * 10000.0) / 10000.0 AS q_machinery,
             |  round((round(quantile_cont(CASE WHEN g = 'BUILDING' THEN v END, 0.$i)
             |      * 10000.0) / 10000.0
             |    - round(quantile_cont(CASE WHEN g = 'MACHINERY' THEN v END, 0.$i)
             |      * 10000.0) / 10000.0) * 10000.0) / 10000.0 AS qte
             |FROM o""".stripMargin).mkString("\nUNION ALL ")
        s"""WITH o AS (SELECT c_mktsegment AS g, o_totalprice AS v
           |  FROM orders JOIN customer ON o_custkey = c_custkey
           |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY'))
           |SELECT * FROM (
           |$arms) ORDER BY decile""".stripMargin
      }),

    // ---- multiple OLS via normal equations: order value ~ item count
    // + total quantity, solved by Cramer's rule over ONE row of exact
    // decimal sufficient sums (3x3 — model-sized, no iteration), with
    // R². The q198 single-covariate fit, one covariate up.
    Q("q312_multiple_ols",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val rows = t(s, d, "lineitem")
          .groupBy(col("l_orderkey").as("okey"))
          .agg(count(lit(1)).cast("long").as("x1"),
            sum(col("l_quantity").cast("long")).as("x2"))
          .join(t(s, d, "orders").select(col("o_orderkey").as("okey"),
            round(col("o_totalprice").cast("double") * 100.0).cast("long")
              .as("y")), Seq("okey"))
        val m = rows.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x1")).cast(dec).as("s1"), sum(col("x2")).cast(dec).as("s2"),
          sum(col("y")).cast(dec).as("sy"),
          sum(col("x1").cast(dec) * col("x1").cast(dec)).as("s11"),
          sum(col("x1").cast(dec) * col("x2").cast(dec)).as("s12"),
          sum(col("x2").cast(dec) * col("x2").cast(dec)).as("s22"),
          sum(col("x1").cast(dec) * col("y").cast(dec)).as("s1y"),
          sum(col("x2").cast(dec) * col("y").cast(dec)).as("s2y"),
          sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
        def dd(c: String) = col(c).cast("double")
        val (n, s1, s2, sy) = (dd("n"), dd("s1"), dd("s2"), dd("sy"))
        val (s11, s12, s22) = (dd("s11"), dd("s12"), dd("s22"))
        val (s1y, s2y, syy) = (dd("s1y"), dd("s2y"), dd("syy"))
        val det = n * (s11 * s22 - s12 * s12) -
          s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
        val d0 = sy * (s11 * s22 - s12 * s12) -
          s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
        val d1 = n * (s1y * s22 - s12 * s2y) -
          sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
        val d2 = n * (s11 * s2y - s1y * s12) -
          s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
        val b0 = d0 / det
        val b1 = d1 / det
        val b2 = d2 / det
        val sse = syy - b0 * sy - b1 * s1y - b2 * s2y
        val sst = syy - sy * sy / n
        m.select(col("n").cast("long").as("n_orders"),
          (round(b0 / 100.0 * 10000.0) / 10000.0).as("intercept"),
          (round(b1 / 100.0 * 10000.0) / 10000.0).as("beta_items"),
          (round(b2 / 100.0 * 10000.0) / 10000.0).as("beta_qty"),
          (round((lit(1.0) - sse / sst) * 1000000.0) / 1000000.0).as("r2"))
      },
      Some("""WITH rows0 AS (SELECT l.okey, l.x1, l.x2, o.y FROM (
             |    SELECT l_orderkey AS okey, CAST(count(*) AS BIGINT) AS x1,
             |      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2
             |    FROM lineitem GROUP BY 1) l
             |  JOIN (SELECT o_orderkey AS okey,
             |      CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT)
             |        AS y FROM orders) o ON o.okey = l.okey),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
             |    CAST(sum(y) AS HUGEINT) AS sy,
             |    sum(CAST(x1 AS HUGEINT) * CAST(x1 AS HUGEINT)) AS s11,
             |    sum(CAST(x1 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS s12,
             |    sum(CAST(x2 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS s22,
             |    sum(CAST(x1 AS HUGEINT) * CAST(y AS HUGEINT)) AS s1y,
             |    sum(CAST(x2 AS HUGEINT) * CAST(y AS HUGEINT)) AS s2y,
             |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy FROM rows0),
             |dd AS (SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
             |    CAST(s2 AS DOUBLE) AS s2, CAST(sy AS DOUBLE) AS sy,
             |    CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12,
             |    CAST(s22 AS DOUBLE) AS s22, CAST(s1y AS DOUBLE) AS s1y,
             |    CAST(s2y AS DOUBLE) AS s2y, CAST(syy AS DOUBLE) AS syy FROM m),
             |sol AS (SELECT n, sy, s1y, s2y, syy,
             |    (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
             |      + s2 * (s1y * s12 - s11 * s2y))
             |    / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
             |      + s2 * (s1 * s12 - s11 * s2)) AS b0,
             |    (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
             |      + s2 * (s1 * s2y - s1y * s2))
             |    / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
             |      + s2 * (s1 * s12 - s11 * s2)) AS b1,
             |    (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
             |      + sy * (s1 * s12 - s11 * s2))
             |    / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
             |      + s2 * (s1 * s12 - s11 * s2)) AS b2
             |  FROM dd)
             |SELECT CAST(n AS BIGINT) AS n_orders,
             |  round(b0 / 100.0 * 10000.0) / 10000.0 AS intercept,
             |  round(b1 / 100.0 * 10000.0) / 10000.0 AS beta_items,
             |  round(b2 / 100.0 * 10000.0) / 10000.0 AS beta_qty,
             |  round((1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y)
             |    / (syy - sy * sy / n)) * 1000000.0) / 1000000.0 AS r2
             |FROM sol""".stripMargin)),

    // ---- Lorenz curve decile points for order value: cumulative value
    // share at-or-below each 4-dp-rounded decile boundary (the q295
    // comparison contract) — the curve behind q207's Gini scalar.
    Q("q313_lorenz_curve",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val o = t(s, d, "orders").select(
          round(col("o_totalprice").cast("double") * 100.0).cast("long")
            .as("c"))
        val qAggs = (1 to 9).map(i =>
          (round(expr(s"percentile(c, 0.$i)") * 10000.0) / 10000.0)
            .as(s"q$i"))
        val bounds = o.agg(qAggs.head, qAggs.tail: _*)
        val j = o.join(broadcast(bounds))
        val aggs = (1 to 9).flatMap { i =>
          Seq(sum(when(col("c").cast("double") <= col(s"q$i"), col("c"))
            .otherwise(0L).cast(dec)).as(s"s$i"),
            sum(when(col("c").cast("double") <= col(s"q$i"), 1L)
              .otherwise(0L)).cast(dec).as(s"n$i"))
        } ++ Seq(sum(col("c").cast(dec)).as("st"),
          count(lit(1)).cast(dec).as("nt"))
        val g = j.agg(aggs.head, aggs.tail: _*)
        val rows = (1 to 9).map(i => struct(lit(i.toLong).as("decile"),
          (round(col(s"n$i").cast("double") / col("nt").cast("double")
            * 1000000.0) / 1000000.0).as("pop_share"),
          (round(col(s"s$i").cast("double") / col("st").cast("double")
            * 1000000.0) / 1000000.0).as("value_share")))
        g.select(explode(array(rows: _*)).as("e"))
          .select(col("e.decile").as("decile"),
            col("e.pop_share").as("pop_share"),
            col("e.value_share").as("value_share"))
          .orderBy("decile")
      },
      Some {
        val qs = (1 to 9).map(i =>
          s"round(quantile_cont(c, 0.$i) * 10000.0) / 10000.0 AS q$i")
          .mkString(",\n    ")
        val sums = (1 to 9).map(i =>
          s"""sum(CASE WHEN CAST(c AS DOUBLE) <= q$i THEN CAST(c AS HUGEINT)
             |      ELSE 0 END) AS s$i,
             |    CAST(sum(CASE WHEN CAST(c AS DOUBLE) <= q$i THEN 1 ELSE 0 END)
             |      AS HUGEINT) AS n$i""".stripMargin).mkString(",\n    ")
        val arms = (1 to 9).map(i =>
          s"""SELECT CAST($i AS BIGINT) AS decile,
             |  round(CAST(n$i AS DOUBLE) / CAST(nt AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS pop_share,
             |  round(CAST(s$i AS DOUBLE) / CAST(st AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS value_share FROM g""".stripMargin)
          .mkString("\nUNION ALL ")
        s"""WITH o AS (SELECT CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0)
           |    AS BIGINT) AS c FROM orders),
           |bd AS (SELECT
           |    $qs
           |  FROM o),
           |g AS (SELECT
           |    $sums,
           |    sum(CAST(c AS HUGEINT)) AS st, CAST(count(*) AS HUGEINT) AS nt
           |  FROM o CROSS JOIN bd)
           |SELECT * FROM (
           |$arms) ORDER BY decile""".stripMargin
      }),

    // ---- mutual information of (segment, priority) in nats, from the
    // q288 contingency counts — how many bits the one label carries
    // about the other, with the normalized (symmetric-uncertainty)
    // variant.
    Q("q314_mutual_information",
      (s, d) => {
        val cells = t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("r"), col("o_orderpriority").as("c"))
          .agg(count(lit(1)).as("o")).localCheckpoint()
        val rm = cells.groupBy("r").agg(sum("o").as("ri"))
        val cm = cells.groupBy("c").agg(sum("o").as("cj"))
        val tot = cells.agg(sum("o").as("n"))
        val nD = col("n").cast("double")
        val term = (col("o").cast("double") / nD) *
          log((col("o").cast("double") * nD) /
            (col("ri").cast("double") * col("cj").cast("double")))
        val mi = cells.join(rm, Seq("r")).join(broadcast(cm), Seq("c"))
          .join(broadcast(tot))
          .agg(sum(term).as("mi"))
        val hr = rm.join(broadcast(tot))
          .agg(sum(-(col("ri").cast("double") / nD) *
            log(col("ri").cast("double") / nD)).as("hx"))
        val hc = cm.join(broadcast(tot))
          .agg(sum(-(col("cj").cast("double") / nD) *
            log(col("cj").cast("double") / nD)).as("hy"))
        mi.join(hr).join(hc)
          .select((round(col("mi") * 1000000.0) / 1000000.0).as("mi_nats"),
            (round(col("hx") * 1000000.0) / 1000000.0).as("h_segment"),
            (round(col("hy") * 1000000.0) / 1000000.0).as("h_priority"),
            (round(lit(2.0) * col("mi") / (col("hx") + col("hy"))
              * 1000000.0) / 1000000.0).as("symmetric_uncertainty"))
      },
      Some("""WITH cells AS (SELECT c_mktsegment AS r, o_orderpriority AS c,
             |    count(*) AS o
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |rm AS (SELECT r, sum(o) AS ri FROM cells GROUP BY r),
             |cm AS (SELECT c, sum(o) AS cj FROM cells GROUP BY c),
             |tt AS (SELECT sum(o) AS n FROM cells),
             |mi AS (SELECT sum((CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
             |    * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
             |      / (CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)))) AS mi
             |  FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tt),
             |hr AS (SELECT sum(-(CAST(ri AS DOUBLE) / CAST(n AS DOUBLE))
             |    * ln(CAST(ri AS DOUBLE) / CAST(n AS DOUBLE))) AS hx
             |  FROM rm CROSS JOIN tt),
             |hc AS (SELECT sum(-(CAST(cj AS DOUBLE) / CAST(n AS DOUBLE))
             |    * ln(CAST(cj AS DOUBLE) / CAST(n AS DOUBLE))) AS hy
             |  FROM cm CROSS JOIN tt)
             |SELECT round(mi * 1000000.0) / 1000000.0 AS mi_nats,
             |  round(hx * 1000000.0) / 1000000.0 AS h_segment,
             |  round(hy * 1000000.0) / 1000000.0 AS h_priority,
             |  round(2.0 * mi / (hx + hy) * 1000000.0) / 1000000.0
             |    AS symmetric_uncertainty
             |FROM mi CROSS JOIN hr CROSS JOIN hc""".stripMargin)),

    // ---- Hurst exponent by rescaled-range analysis over the dense
    // daily series (block sizes 8/16/32, full blocks only): H ~ 0.5 is
    // memoryless, H > 0.5 long-range dependent — does today's volume
    // remember last week. Block stats from exact integer sums; H is
    // the 3-point log-log OLS slope.
    Q("q315_hurst_rs",
      (s, d) => {
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d))
          .localCheckpoint() // three block-size passes
        val mn = dense.agg(min("day").as("mn"))
        val idx = dense.join(broadcast(mn))
          .select((col("day") - col("mn")).as("i"), col("c"))
        val perW = Seq(8, 16, 32).map { w =>
          val blk = idx.select(expr(s"i div $w").as("b"), col("i"), col("c"))
          val bw = org.apache.spark.sql.expressions.Window
            .partitionBy("b").orderBy("i")
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)
          val full = blk.withColumn("nb",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy("b")))
            .where(col("nb") === w)
          val withZ = full
            .withColumn("cum", sum(col("c")).over(bw))
            .withColumn("j", count(lit(1)).over(bw))
            .withColumn("bs", sum(col("c")).over(
              org.apache.spark.sql.expressions.Window.partitionBy("b")))
          val stats = withZ.groupBy("b")
            .agg(sum("c").as("sx"),
              sum(col("c") * col("c")).as("sxx"),
              max(col("cum").cast("double") - col("j").cast("double") *
                col("bs").cast("double") / w).as("zmax"),
              min(col("cum").cast("double") - col("j").cast("double") *
                col("bs").cast("double") / w).as("zmin"))
          val sVar = (col("sxx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / w) / w
          stats.where(sVar > 0.0)
            .select(((col("zmax") - col("zmin")) / sqrt(sVar)).as("rs"))
            .agg(count(lit(1)).cast("long").as("n_blocks"),
              avg("rs").as("mean_rs"))
            .select(lit(w.toLong).as("w"), col("n_blocks"), col("mean_rs"))
        }.reduce(_ unionByName _)
        val pts = perW.select(col("w"), col("n_blocks"),
          log(col("w").cast("double")).as("lx"),
          log(col("mean_rs")).as("ly"), col("mean_rs"))
        val h = pts.agg(count(lit(1)).cast("double").as("k"),
          sum("lx").as("sx"), sum("ly").as("sy"),
          sum(col("lx") * col("lx")).as("sxx"),
          sum(col("lx") * col("ly")).as("sxy"))
          .select(((col("sxy") - col("sx") * col("sy") / col("k")) /
            (col("sxx") - col("sx") * col("sx") / col("k"))).as("h"))
        pts.select(col("w"), col("n_blocks"),
          (round(col("mean_rs") * 10000.0) / 10000.0).as("mean_rs"))
          .join(broadcast(h))
          .select(col("w"), col("n_blocks"), col("mean_rs"),
            (round(col("h") * 1000000.0) / 1000000.0).as("hurst"))
          .orderBy("w")
      },
      Some {
        val arms = Seq(8, 16, 32).map { w =>
          s"""bl$w AS (SELECT i // $w AS b, i, c,
             |    count(*) OVER (PARTITION BY (i // $w)) AS nb
             |  FROM ix),
             |fz$w AS (SELECT b, i, c,
             |    sum(c) OVER (PARTITION BY b ORDER BY i
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    CAST(count(*) OVER (PARTITION BY b ORDER BY i
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      AS j,
             |    sum(c) OVER (PARTITION BY b) AS bs
             |  FROM bl$w WHERE nb = $w),
             |st$w AS (SELECT b, sum(c) AS sx, sum(c * c) AS sxx,
             |    max(CAST(cum AS DOUBLE) - CAST(j AS DOUBLE)
             |      * CAST(bs AS DOUBLE) / $w) AS zmax,
             |    min(CAST(cum AS DOUBLE) - CAST(j AS DOUBLE)
             |      * CAST(bs AS DOUBLE) / $w) AS zmin
             |  FROM fz$w GROUP BY b),
             |rs$w AS (SELECT CAST($w AS BIGINT) AS w,
             |    CAST(count(*) AS BIGINT) AS n_blocks,
             |    avg((zmax - zmin) / sqrt((CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / $w) / $w))
             |      AS mean_rs
             |  FROM st$w
             |  WHERE (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
             |    * CAST(sx AS DOUBLE) / $w) / $w > 0.0)""".stripMargin
        }.mkString(",\n")
        s"""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
           |  FROM events GROUP BY 1),
           |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
           |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
           |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
           |  LEFT JOIN c USING (day)),
           |ix AS (SELECT day - (SELECT mn FROM b) AS i, c FROM dn),
           |$arms,
           |pts AS (SELECT w, n_blocks, ln(CAST(w AS DOUBLE)) AS lx,
           |    ln(mean_rs) AS ly, mean_rs
           |  FROM (SELECT * FROM rs8 UNION ALL SELECT * FROM rs16
           |    UNION ALL SELECT * FROM rs32)),
           |hh AS (SELECT (sum(lx * ly) - sum(lx) * sum(ly)
           |      / CAST(count(*) AS DOUBLE))
           |    / (sum(lx * lx) - sum(lx) * sum(lx)
           |      / CAST(count(*) AS DOUBLE)) AS h FROM pts)
           |SELECT w, n_blocks, round(mean_rs * 10000.0) / 10000.0 AS mean_rs,
           |  round(h * 1000000.0) / 1000000.0 AS hurst
           |FROM pts CROSS JOIN hh ORDER BY w""".stripMargin
      }),

    // ---- Ljung-Box whiteness test on the q203 daily ACF (lags 1-7):
    // Q = n(n+2) sum rho_k^2/(n-k) against the literal chi-square 5%
    // critical value — is the daily series distinguishable from noise.
    Q("q316_ljung_box",
      (s, d) => {
        val acf = graft.operators.EventOps
          .dailyAcf(Tables.events(s, d), 7)
          .select(col("lag"), col("n_pairs"), col("acf"))
        val n = acf.where(col("lag") === 1)
          .select((col("n_pairs") + 1).cast("double").as("n"))
        val terms = acf.join(broadcast(n))
          .select(col("n"),
            (col("acf") * col("acf") /
              (col("n") - col("lag").cast("double"))).as("t"))
        terms.groupBy("n")
          .agg(sum("t").as("st"), count(lit(1)).cast("long").as("df"))
          .select(col("n").cast("long").as("n_days"), col("df"),
            (round(col("n") * (col("n") + 2.0) * col("st") * 1000000.0)
              / 1000000.0).as("q_stat"),
            (col("n") * (col("n") + 2.0) * col("st") >
              14.067140449340169).as("reject_whiteness"))
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |d AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |l AS (SELECT lg.lag, a.c AS ca, bb.c AS cb
             |  FROM d a CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lag) lg
             |  JOIN d bb ON bb.day = a.day + lg.lag),
             |g AS (SELECT lag, CAST(count(*) AS HUGEINT) AS n,
             |    sum(CAST(ca AS HUGEINT)) AS sx, sum(CAST(cb AS HUGEINT)) AS sy,
             |    sum(CAST(ca AS HUGEINT) * CAST(ca AS HUGEINT)) AS sxx,
             |    sum(CAST(cb AS HUGEINT) * CAST(cb AS HUGEINT)) AS syy,
             |    sum(CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT)) AS sxy
             |  FROM l GROUP BY lag),
             |ac AS (SELECT lag, CAST(n AS BIGINT) AS n_pairs,
             |    round(CAST(n * sxy - sx * sy AS DOUBLE)
             |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
             |        * CAST(n * syy - sy * sy AS DOUBLE)) * 1000000.0)
             |      / 1000000.0 AS acf
             |  FROM g),
             |nn AS (SELECT CAST(n_pairs + 1 AS DOUBLE) AS n FROM ac WHERE lag = 1),
             |tm AS (SELECT nn.n, acf * acf / (nn.n - CAST(lag AS DOUBLE)) AS t
             |  FROM ac CROSS JOIN nn)
             |SELECT CAST(n AS BIGINT) AS n_days,
             |  CAST(count(*) AS BIGINT) AS df,
             |  round(n * (n + 2.0) * sum(t) * 1000000.0) / 1000000.0 AS q_stat,
             |  n * (n + 2.0) * sum(t) > 14.067140449340169
             |    AS reject_whiteness
             |FROM tm GROUP BY n""".stripMargin)),

    // ---- Gumbel extreme-value fit of weekly-maximum daily volume
    // (method of moments; Euler-gamma and pi as shared literals) with
    // the 52-week return level — "how bad can a peak day get", the
    // capacity-planning number. Block maxima are exact integers.
    Q("q317_gumbel_maxima",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d))
        val mn = dense.agg(min("day").as("mn"))
        val wk = dense.join(broadcast(mn))
          .select(expr("(day - mn) div 7").as("wk"), col("c"))
          .groupBy("wk")
          .agg(count(lit(1)).as("nd"), max("c").as("m"))
          .where(col("nd") === 7)
        val g = wk.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("m")).cast(dec).as("s"),
          sum(col("m").cast(dec) * col("m").cast(dec)).as("ss"))
        val nD = col("n").cast("double")
        val mean = col("s").cast("double") / nD
        val v = (col("ss").cast("double") - col("s").cast("double") *
          col("s").cast("double") / nD) / nD
        val beta = sqrt(lit(6.0) * v) / lit(3.141592653589793)
        val mu = mean - lit(0.5772156649015329) * beta
        val ret52 = mu - beta * log(-log(lit(1.0) - lit(1.0) / 52.0))
        g.select(col("n").cast("long").as("n_weeks"),
          (round(mean * 10000.0) / 10000.0).as("mean_weekly_max"),
          (round(mu * 10000.0) / 10000.0).as("gumbel_mu"),
          (round(beta * 10000.0) / 10000.0).as("gumbel_beta"),
          (round(ret52 * 10000.0) / 10000.0).as("return_level_52w"))
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |wk AS (SELECT (day - (SELECT mn FROM b)) // 7 AS wk,
             |    count(*) AS nd, max(c) AS m
             |  FROM dn GROUP BY 1),
             |fw AS (SELECT m FROM wk WHERE nd = 7),
             |g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(m) AS HUGEINT) AS s,
             |    sum(CAST(m AS HUGEINT) * CAST(m AS HUGEINT)) AS ss FROM fw)
             |SELECT CAST(n AS BIGINT) AS n_weeks,
             |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 10000.0)
             |    / 10000.0 AS mean_weekly_max,
             |  round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             |    - 0.5772156649015329 * (sqrt(6.0 * ((CAST(ss AS DOUBLE)
             |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |      / CAST(n AS DOUBLE))) / 3.141592653589793)) * 10000.0)
             |    / 10000.0 AS gumbel_mu,
             |  round((sqrt(6.0 * ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
             |      * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |      / CAST(n AS DOUBLE))) / 3.141592653589793) * 10000.0)
             |    / 10000.0 AS gumbel_beta,
             |  round(((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             |    - 0.5772156649015329 * (sqrt(6.0 * ((CAST(ss AS DOUBLE)
             |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |      / CAST(n AS DOUBLE))) / 3.141592653589793))
             |    - (sqrt(6.0 * ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
             |      * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |      / CAST(n AS DOUBLE))) / 3.141592653589793)
             |    * ln(-ln(1.0 - 1.0 / 52.0))) * 10000.0) / 10000.0
             |    AS return_level_52w
             |FROM g""".stripMargin)),

    // ---- Taylor's power law across customer segments: does variance
    // scale as a power of the mean (var = a·mean^b)? ln-ln OLS over the
    // segment moment table (exact cent sufficient sums per group).
    Q("q318_taylor_law",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val g = t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("g"),
            round(col("o_totalprice").cast("double") * 100.0).cast("long")
              .as("c"))
          .groupBy("g")
          .agg(count(lit(1)).cast(dec).as("n"), sum(col("c")).cast(dec).as("s"),
            sum(col("c").cast(dec) * col("c").cast(dec)).as("ss"))
        val nD = col("n").cast("double")
        val mean = col("s").cast("double") / nD / 100.0
        val v = (col("ss").cast("double") - col("s").cast("double") *
          col("s").cast("double") / nD) / nD / 10000.0
        val pts = g.select(log(mean).as("lx"), log(v).as("ly"))
        pts.agg(count(lit(1)).cast("double").as("k"),
          sum("lx").as("sx"), sum("ly").as("sy"),
          sum(col("lx") * col("lx")).as("sxx"),
          sum(col("lx") * col("ly")).as("sxy"),
          sum(col("ly") * col("ly")).as("syy"))
          .select(col("k").cast("long").as("n_groups"),
            (round((col("sxy") - col("sx") * col("sy") / col("k")) /
              (col("sxx") - col("sx") * col("sx") / col("k"))
              * 1000000.0) / 1000000.0).as("taylor_b"),
            (round((col("sy") - (col("sxy") - col("sx") * col("sy") /
              col("k")) / (col("sxx") - col("sx") * col("sx") / col("k")) *
              col("sx")) / col("k") * 1000000.0) / 1000000.0)
              .as("taylor_ln_a"))
      },
      Some("""WITH g AS (SELECT c_mktsegment AS g,
             |    CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(c) AS HUGEINT) AS s,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ss
             |  FROM (SELECT c_mktsegment,
             |      CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT)
             |        AS c
             |    FROM orders JOIN customer ON o_custkey = c_custkey)
             |  GROUP BY 1),
             |pts AS (SELECT
             |    ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0) AS lx,
             |    ln((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 10000.0) AS ly
             |  FROM g)
             |SELECT CAST(count(*) AS BIGINT) AS n_groups,
             |  round((sum(lx * ly) - sum(lx) * sum(ly)
             |      / CAST(count(*) AS DOUBLE))
             |    / (sum(lx * lx) - sum(lx) * sum(lx)
             |      / CAST(count(*) AS DOUBLE)) * 1000000.0) / 1000000.0
             |    AS taylor_b,
             |  round((sum(ly) - (sum(lx * ly) - sum(lx) * sum(ly)
             |      / CAST(count(*) AS DOUBLE))
             |    / (sum(lx * lx) - sum(lx) * sum(lx)
             |      / CAST(count(*) AS DOUBLE)) * sum(lx))
             |    / CAST(count(*) AS DOUBLE) * 1000000.0) / 1000000.0
             |    AS taylor_ln_a
             |FROM pts""".stripMargin)),

    // ---- Mann-Kendall trend test on the dense daily series: S = sum
    // of pairwise signs, tie-corrected variance, continuity-corrected z
    // — the significance companion to q237's Theil-Sen slope, exact
    // integers until the one-row z chain. Day-domain pair join.
    Q("q319_mann_kendall",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d)).localCheckpoint()
        val pairs = dense.as("a")
          .join(dense.as("b"), col("a.day") < col("b.day"))
          .select(signum(col("b.c") - col("a.c")).cast("long").as("sg"))
        val sAgg = pairs.agg(sum(col("sg")).cast(dec).as("s"))
        val ties = dense.groupBy("c").agg(count(lit(1)).as("t"))
          .agg(sum(col("t").cast(dec) * (col("t").cast(dec) - 1) *
            (lit(2).cast(dec) * col("t").cast(dec) + 5)).as("tc"))
        val nAgg = dense.agg(count(lit(1)).cast(dec).as("n"))
        val j = sAgg.join(ties).join(nAgg)
        val nD = col("n").cast("double")
        val varS = (nD * (nD - 1.0) * (lit(2.0) * nD + 5.0) -
          col("tc").cast("double")) / 18.0
        val sD = col("s").cast("double")
        val z = when(col("s") > 0, (sD - 1.0) / sqrt(varS))
          .when(col("s") < 0, (sD + 1.0) / sqrt(varS))
          .otherwise(0.0)
        j.select(col("n").cast("long").as("n_days"),
          col("s").cast("long").as("mk_s"),
          (round(varS * 100.0) / 100.0).as("var_s"),
          (round(z * 1000000.0) / 1000000.0).as("z"),
          (round(graft.operators.Stats.normTwoSidedP(abs(z)) * 1000000.0)
            / 1000000.0).as("p"))
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |pr AS (SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1
             |    WHEN b.c < a.c THEN -1 ELSE 0 END) AS HUGEINT) AS s
             |  FROM dn a JOIN dn b ON a.day < b.day),
             |ti AS (SELECT sum(CAST(t AS HUGEINT) * (CAST(t AS HUGEINT) - 1)
             |    * (2 * CAST(t AS HUGEINT) + 5)) AS tc
             |  FROM (SELECT c, count(*) AS t FROM dn GROUP BY c)),
             |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM dn),
             |x AS (SELECT CAST(s AS DOUBLE) AS sd, CAST(s AS BIGINT) AS s,
             |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
             |      * (2.0 * CAST(n AS DOUBLE) + 5.0) - CAST(tc AS DOUBLE))
             |      / 18.0 AS vs,
             |    CAST(n AS BIGINT) AS n
             |  FROM pr CROSS JOIN ti CROSS JOIN nn),
             |zz AS (SELECT n, s, vs, CASE WHEN s > 0 THEN (sd - 1.0) / sqrt(vs)
             |    WHEN s < 0 THEN (sd + 1.0) / sqrt(vs) ELSE 0.0 END AS z
             |  FROM x)
             |SELECT n AS n_days, s AS mk_s,
             |  round(vs * 100.0) / 100.0 AS var_s,
             |  round(z * 1000000.0) / 1000000.0 AS z,
             |  round(2.0 * (0.3989422804014327 * exp(-abs(z) * abs(z) / 2.0)
             |    * ((1.0 / (1.0 + 0.2316419 * abs(z)))
             |      * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(z)))
             |        * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(z)))
             |          * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(z)))
             |            * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(z)))
             |              * 1.330274429)))))) * 1000000.0) / 1000000.0 AS p
             |FROM zz""".stripMargin)),

    // ---- lexical diversity: type-token ratio of each source's first
    // 500 tokens (docs in doc_id order — a fixed-budget TTR so sources
    // of different sizes compare fairly).
    Q("q320_ttr_lexical",
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("source"), col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id", "pos")
        toks.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 500)
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            countDistinct("w").cast("long").as("n_types"))
          .select(col("source"), col("n_tokens"), col("n_types"),
            (round(col("n_types").cast("double") /
              col("n_tokens").cast("double") * 1000000.0) / 1000000.0)
              .as("ttr"))
          .orderBy("source")
      },
      Some("""WITH tk AS (SELECT source, doc_id,
             |    unnest([{'p': i - 1, 'w': t[i]} for i in range(1, len(t) + 1)]) AS e
             |  FROM (SELECT source, doc_id, string_split(text, ' ') AS t
             |        FROM documents)),
             |px AS (SELECT source, doc_id, e.p AS pos, e.w AS w FROM tk),
             |rk AS (SELECT source, w, row_number() OVER (PARTITION BY source
             |    ORDER BY doc_id, pos) AS rn FROM px)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(count(DISTINCT w) AS BIGINT) AS n_types,
             |  round(CAST(count(DISTINCT w) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) * 1000000.0) / 1000000.0 AS ttr
             |FROM rk WHERE rn <= 500
             |GROUP BY source ORDER BY source""".stripMargin)),

    // ---- 5-NN label classification accuracy on the vec_id < 200 audit
    // prefix: leave-one-out cosine neighbors vote (count desc, label
    // asc) — how label-consistent the embedding space is.
    Q("q321_knn_accuracy",
      (s, d) => {
        val sub = t(s, d, "embeddings").where(col("vec_id") < 200)
          .localCheckpoint()
        val pairs = sub.as("a").join(broadcast(sub.as("b")),
            col("a.vec_id") =!= col("b.vec_id"))
          .select(col("a.vec_id").as("qid"),
            col("a.label").as("true_label"), col("b.label").as("nl"),
            col("b.vec_id").as("nid"),
            (round(Similarity.cosine(col("a.embedding"), col("b.embedding"))
              * 1000000.0) / 1000000.0).as("cos"))
        val byQ = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("cos").desc, col("nid"))
        val top5 = pairs.withColumn("rn", row_number().over(byQ))
          .where(col("rn") <= 5)
        val byVote = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("v").desc, col("nl"))
        val pred = top5.groupBy("qid", "true_label", "nl")
          .agg(count(lit(1)).as("v"))
          .withColumn("vr", row_number().over(byVote))
          .where(col("vr") === 1)
        pred.agg(count(lit(1)).cast("long").as("n_eval"),
          sum(when(col("true_label") === col("nl"), 1L).otherwise(0L))
            .cast("long").as("n_correct"))
          .select(col("n_eval"), col("n_correct"),
            (round(col("n_correct").cast("double") /
              col("n_eval").cast("double") * 1000000.0) / 1000000.0)
              .as("accuracy"))
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
             |  FROM embeddings WHERE vec_id < 200),
             |pr AS (SELECT a.vec_id AS qid, a.label AS true_label,
             |    b.label AS nl, b.vec_id AS nid,
             |    round(list_cosine_similarity(a.v, b.v) * 1000000.0)
             |      / 1000000.0 AS cos
             |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
             |t5 AS (SELECT * FROM (SELECT qid, true_label, nl, cos,
             |    row_number() OVER (PARTITION BY qid
             |      ORDER BY cos DESC, nid) AS rn FROM pr) WHERE rn <= 5),
             |vt AS (SELECT qid, true_label, nl, count(*) AS v FROM t5
             |  GROUP BY 1, 2, 3),
             |pk AS (SELECT qid, true_label, nl FROM (SELECT qid, true_label,
             |    nl, row_number() OVER (PARTITION BY qid
             |      ORDER BY v DESC, nl) AS vr FROM vt) WHERE vr = 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_eval,
             |  CAST(sum(CASE WHEN true_label = nl THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_correct,
             |  round(CAST(sum(CASE WHEN true_label = nl THEN 1 ELSE 0 END)
             |      AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS accuracy
             |FROM pk""".stripMargin)),

    // ---- nearest-centroid (Rocchio) classifier confusion matrix:
    // per-label centroids from exact quantized sums baked as literals
    // (the Pca projection shape — scan-speed assignment, no pairs), tie
    // to the smaller label.
    Q("q322_centroid_classifier",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val emb = t(s, d, "embeddings")
        val q = emb.select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) " +
            "* 10000.0) AS LONG))").as("q")).localCheckpoint()
        val cents = q.select(col("label"),
            posexplode(col("q")).as(Seq("i", "v")))
          .groupBy("label", "i").agg(sum(col("v")).cast(dec).as("s"))
          .join(q.groupBy("label").agg(count(lit(1)).as("n")), "label")
          .select(col("label"), col("i"),
            (col("s").cast("double") / col("n").cast("double")).as("c"))
          .collect() // labels × 64 — model-sized
        val byLabel = cents.groupBy(_.getInt(0)).map { case (l, rows) =>
          l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        }
        val entries = byLabel.keys.toSeq.sorted.map { l =>
          val c = byLabel(l)
          val dsum = (0 until 64).map { i =>
            val diff = element_at(col("q"), i + 1).cast("double") /
              lit(10000.0) - lit(c(i))
            diff * diff
          }.reduce(_ + _)
          struct(dsum.as("d"), lit(l.toLong).as("l"))
        }
        val pred = array_min(array(entries: _*)).getField("l")
        q.select(col("label").cast("long").as("true_label"),
            pred.as("pred_label"))
          .groupBy("true_label", "pred_label")
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy("true_label", "pred_label")
      },
      Some("""WITH q AS (SELECT vec_id, label,
             |    [CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)
             |     for x in embedding] AS q
             |  FROM embeddings),
             |ex AS (SELECT label,
             |    unnest([{'i': i, 'v': q[i]} for i in range(1, 65)]) AS e
             |  FROM q),
             |sm AS (SELECT label, e.i AS i, CAST(sum(e.v) AS HUGEINT) AS s
             |  FROM ex GROUP BY 1, 2),
             |ns AS (SELECT label, count(*) AS n FROM q GROUP BY label),
             |cd AS (SELECT sm.label,
             |    list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY i) AS c
             |  FROM sm JOIN ns USING (label) GROUP BY sm.label),
             |di AS (SELECT q.vec_id, q.label AS true_label, cd.label AS cl,
             |    list_reduce([(q.q[i] / 10000.0 - cd.c[i])
             |        * (q.q[i] / 10000.0 - cd.c[i]) for i in range(1, 65)],
             |      (a, b) -> a + b) AS dist
             |  FROM q CROSS JOIN cd),
             |pk AS (SELECT vec_id, true_label, cl FROM (SELECT vec_id,
             |    true_label, cl, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY dist, cl) AS rn FROM di) WHERE rn = 1)
             |SELECT CAST(true_label AS BIGINT) AS true_label,
             |  CAST(cl AS BIGINT) AS pred_label,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM pk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Weibull fit of inter-purchase gaps by the log-moment
    // (Gumbel-duality) estimator: shape k = pi/(sqrt(6)·sd(ln x)),
    // scale = exp(mean(ln x) + gamma/k) — is repeat purchasing
    // memoryless (k~1, the q239 exponential) or aging? Closed form, no
    // iteration; literals shared with the oracle.
    Q("q323_weibull_gaps",
      (s, d) => {
        val ev = Tables.events(s, d).where(col("event_type") === "purchase")
        val byU = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gaps = ev.withColumn("pv", lag(col("ts"), 1).over(byU))
          .where(col("pv").isNotNull && col("ts") > col("pv"))
          .select(((col("ts") - col("pv")).cast("double") / 1.0e9).as("x"))
        val lx = gaps.select(log(col("x")).as("l"))
        val m = lx.agg(count(lit(1)).cast("double").as("n"),
          sum("l").as("s"), sum(col("l") * col("l")).as("ss"))
        val mean = col("s") / col("n")
        val sd = sqrt((col("ss") - col("s") * col("s") / col("n")) / col("n"))
        val k = lit(3.141592653589793) / (sqrt(lit(6.0)) * sd)
        val lam = exp(mean + lit(0.5772156649015329) / k)
        m.select(col("n").cast("long").as("n_gaps"),
          (round(k * 1000000.0) / 1000000.0).as("weibull_k"),
          (round(lam * 100.0) / 100.0).as("weibull_lambda_s"),
          (abs(k - 1.0) < 0.1).as("near_exponential"))
      },
      Some("""WITH p AS (SELECT user_id, ts, event_id FROM events
             |  WHERE event_type = 'purchase'),
             |gp AS (SELECT (epoch_us(ts) - epoch_us(pv)) / 1000000.0 AS x
             |  FROM (SELECT ts, lag(ts) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS pv FROM p)
             |  WHERE pv IS NOT NULL AND ts > pv),
             |lx AS (SELECT ln(x) AS l FROM gp),
             |m AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(l) AS s,
             |    sum(l * l) AS ss FROM lx)
             |SELECT CAST(n AS BIGINT) AS n_gaps,
             |  round(3.141592653589793 / (sqrt(6.0)
             |    * sqrt((ss - s * s / n) / n)) * 1000000.0) / 1000000.0
             |    AS weibull_k,
             |  round(exp(s / n + 0.5772156649015329
             |    / (3.141592653589793 / (sqrt(6.0) * sqrt((ss - s * s / n) / n))))
             |    * 100.0) / 100.0 AS weibull_lambda_s,
             |  abs(3.141592653589793 / (sqrt(6.0) * sqrt((ss - s * s / n) / n))
             |    - 1.0) < 0.1 AS near_exponential
             |FROM m""".stripMargin)),

    // ---- term burstiness (Church & Gale 1995): for the 15 most
    // document-frequent terms, the variance-to-mean ratio of per-doc
    // counts and the adaptation probability P(>=2 | >=1) — bursty terms
    // concentrate, function words spread. Exact integer counts.
    Q("q324_term_burstiness",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val docs = t(s, d, "documents")
        val nDocs = docs.agg(count(lit(1)).as("nd"))
        val tc = docs.select(col("doc_id"),
            explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
          .localCheckpoint() // feeds df ranking + the moment pass
        val top = tc.groupBy("w").agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("w")).limit(15)
        val m = tc.join(broadcast(top.select("w")), Seq("w"), "left_semi")
          .groupBy("w")
          .agg(count(lit(1)).cast(dec).as("df"),
            sum(col("c")).cast(dec).as("s"),
            sum(col("c").cast(dec) * col("c").cast(dec)).as("ss"),
            sum(when(col("c") >= 2, 1L).otherwise(0L)).cast(dec).as("n2"))
        val j = m.join(broadcast(nDocs))
        val ndD = col("nd").cast("double")
        val mean = col("s").cast("double") / ndD // mean over ALL docs
        val varD = (col("ss").cast("double") - col("s").cast("double") *
          col("s").cast("double") / ndD) / ndD
        j.select(col("w").as("term"), col("df").cast("long").as("df"),
            col("s").cast("long").as("total_count"),
            (round(mean * 10000.0) / 10000.0).as("mean_per_doc"),
            (round(varD / mean * 10000.0) / 10000.0).as("vmr"),
            (round(col("n2").cast("double") / col("df").cast("double")
              * 1000000.0) / 1000000.0).as("adaptation"))
          .orderBy(col("df").desc, col("term"))
      },
      Some("""WITH nd AS (SELECT count(*) AS nd FROM documents),
             |tc AS (SELECT doc_id, w, count(*) AS c FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |    FROM documents) GROUP BY 1, 2),
             |tp AS (SELECT w FROM (SELECT w, count(*) AS df FROM tc GROUP BY w
             |    ORDER BY df DESC, w LIMIT 15)),
             |m AS (SELECT tc.w, CAST(count(*) AS HUGEINT) AS df,
             |    CAST(sum(c) AS HUGEINT) AS s,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ss,
             |    CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS HUGEINT) AS n2
             |  FROM tc JOIN tp ON tp.w = tc.w GROUP BY tc.w)
             |SELECT w AS term, CAST(df AS BIGINT) AS df,
             |  CAST(s AS BIGINT) AS total_count,
             |  round(CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) * 10000.0)
             |    / 10000.0 AS mean_per_doc,
             |  round(((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |    / CAST(nd AS DOUBLE)) / CAST(nd AS DOUBLE))
             |    / (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)) * 10000.0)
             |    / 10000.0 AS vmr,
             |  round(CAST(n2 AS DOUBLE) / CAST(df AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS adaptation
             |FROM m CROSS JOIN nd ORDER BY df DESC, term""".stripMargin)),

    // ---- Herfindahl-Hirschman supplier concentration per supplier
    // nation-of-origin market: HHI = sum of squared revenue shares of
    // suppliers within each nation — which supply markets are
    // monopolized. Exact cent revenue sums; shares squared in one
    // chain; the > 0.25 DOJ-style flag.
    Q("q325_hhi_concentration",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val rev = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("market"), col("s_suppkey").as("sk"),
            round(col("l_extendedprice").cast("double") * 100.0)
              .cast("long").as("cents"))
          .groupBy("market", "sk").agg(sum(col("cents")).cast(dec).as("r"))
        val tot = rev.groupBy("market").agg(sum(col("r")).as("rt"),
          count(lit(1)).as("n_suppliers"))
        val hhi = rev.join(tot, Seq("market"))
          .select(col("market"), col("n_suppliers"),
            ((col("r").cast("double") / col("rt").cast("double")) *
              (col("r").cast("double") / col("rt").cast("double"))).as("s2"))
          .groupBy("market", "n_suppliers")
          .agg(sum("s2").as("hhi"))
        hhi.select(col("market"), col("n_suppliers").cast("long")
            .as("n_suppliers"),
            (round(col("hhi") * 1000000.0) / 1000000.0).as("hhi"),
            (col("hhi") > 0.25).as("concentrated"))
          .orderBy("market")
      },
      Some("""WITH rev AS (SELECT n_name AS market, s_suppkey AS sk,
             |    CAST(sum(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100.0)
             |      AS BIGINT)) AS HUGEINT) AS r
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  GROUP BY 1, 2),
             |tt AS (SELECT market, sum(r) AS rt, count(*) AS n_suppliers
             |  FROM rev GROUP BY market),
             |h AS (SELECT rev.market, n_suppliers,
             |    sum((CAST(r AS DOUBLE) / CAST(rt AS DOUBLE))
             |      * (CAST(r AS DOUBLE) / CAST(rt AS DOUBLE))) AS hhi
             |  FROM rev JOIN tt ON tt.market = rev.market
             |  GROUP BY 1, 2)
             |SELECT market, CAST(n_suppliers AS BIGINT) AS n_suppliers,
             |  round(hhi * 1000000.0) / 1000000.0 AS hhi,
             |  hhi > 0.25 AS concentrated
             |FROM h ORDER BY market""".stripMargin)),

    // ---- higher-moment profile per segment: skewness and excess
    // kurtosis from EXACT decimal 3rd/4th cent-moment sums — the
    // distribution-shape completion of the mean/variance profiling
    // family (heavy tails break every normal-theory gate upstream).
    Q("q326_moments_profile",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val v = t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("g"),
            round(col("o_totalprice").cast("double")).cast("long").as("u"))
        val m = v.groupBy("g").agg(count(lit(1)).cast(dec).as("n"),
          sum(col("u")).cast(dec).as("s1"),
          sum(col("u").cast(dec) * col("u").cast(dec)).as("s2"),
          sum(col("u").cast(dec) * col("u").cast(dec) * col("u").cast(dec))
            .as("s3"),
          sum(col("u").cast(dec) * col("u").cast(dec) * col("u").cast(dec) *
            col("u").cast(dec)).as("s4"))
        val nD = col("n").cast("double")
        def dd(c: String) = col(c).cast("double")
        val m1 = dd("s1") / nD
        val m2 = dd("s2") / nD - m1 * m1
        val m3 = dd("s3") / nD - lit(3.0) * m1 * (dd("s2") / nD) +
          lit(2.0) * m1 * m1 * m1
        val m4 = dd("s4") / nD - lit(4.0) * m1 * (dd("s3") / nD) +
          lit(6.0) * m1 * m1 * (dd("s2") / nD) -
          lit(3.0) * m1 * m1 * m1 * m1
        m.select(col("g").as("segment"), col("n").cast("long").as("n"),
            (round(m1 * 100.0) / 100.0).as("mean"),
            (round(sqrt(m2) * 100.0) / 100.0).as("sd"),
            (round(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) * 1000000.0)
              / 1000000.0).as("skewness"),
            (round((m4 / (m2 * m2) - 3.0) * 1000000.0) / 1000000.0)
              .as("excess_kurtosis"))
          .orderBy("segment")
      },
      Some("""WITH v AS (SELECT c_mktsegment AS g,
             |    CAST(round(CAST(o_totalprice AS DOUBLE)) AS BIGINT) AS u
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |m AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(u) AS HUGEINT) AS s1,
             |    sum(CAST(u AS HUGEINT) * CAST(u AS HUGEINT)) AS s2,
             |    sum(CAST(u AS HUGEINT) * CAST(u AS HUGEINT)
             |      * CAST(u AS HUGEINT)) AS s3,
             |    sum(CAST(u AS HUGEINT) * CAST(u AS HUGEINT)
             |      * CAST(u AS HUGEINT) * CAST(u AS HUGEINT)) AS s4
             |  FROM v GROUP BY g),
             |x AS (SELECT g, n,
             |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
             |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
             |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
             |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
             |  FROM m),
             |y AS (SELECT g, n, m1,
             |    r2 - m1 * m1 AS m2,
             |    r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
             |    r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
             |      - 3.0 * m1 * m1 * m1 * m1 AS m4
             |  FROM x)
             |SELECT g AS segment, CAST(n AS BIGINT) AS n,
             |  round(m1 * 100.0) / 100.0 AS mean,
             |  round(sqrt(m2) * 100.0) / 100.0 AS sd,
             |  round(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) * 1000000.0)
             |    / 1000000.0 AS skewness,
             |  round((m4 / (m2 * m2) - 3.0) * 1000000.0) / 1000000.0
             |    AS excess_kurtosis
             |FROM y ORDER BY segment""".stripMargin)),

    // ---- Wald-Wolfowitz runs test on the daily above/below-mean
    // sequence: too FEW runs = regime clustering, too many = oscillation
    // — randomness the ACF can miss. Above-mean decided by exact integer
    // cross-multiplication (c·n > S); runs counted with one lag pass.
    Q("q327_runs_test",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d)).localCheckpoint()
        val tot = dense.agg(sum(col("c")).cast(dec).as("s"),
          count(lit(1)).cast(dec).as("n"))
        val flagged = dense.join(broadcast(tot))
          .select(col("day"),
            (col("c").cast(dec) * col("n") > col("s")).as("hi"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        val runs = flagged
          .withColumn("pv", lag(col("hi"), 1).over(w)) // day-domain window
          .agg(sum(when(col("pv").isNull || col("pv") =!= col("hi"), 1L)
            .otherwise(0L)).cast("long").as("r"),
            sum(when(col("hi"), 1L).otherwise(0L)).cast("double").as("n1"),
            sum(when(!col("hi"), 1L).otherwise(0L)).cast("double").as("n0"))
        val nD = col("n1") + col("n0")
        val er = lit(2.0) * col("n1") * col("n0") / nD + 1.0
        val vr = (er - 1.0) * (er - 2.0) / (nD - 1.0)
        runs.select(col("r").as("n_runs"),
            col("n1").cast("long").as("n_above"),
            col("n0").cast("long").as("n_below"),
            (round(er * 10000.0) / 10000.0).as("expected_runs"),
            (round((col("r").cast("double") - er) / sqrt(vr) * 1000000.0)
              / 1000000.0).as("z"))
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |tt AS (SELECT CAST(sum(c) AS HUGEINT) AS s,
             |    CAST(count(*) AS HUGEINT) AS n FROM dn),
             |fl AS (SELECT day, CAST(c AS HUGEINT) * n > s AS hi
             |  FROM dn CROSS JOIN tt),
             |rn AS (SELECT CAST(sum(CASE WHEN pv IS NULL OR pv <> hi
             |      THEN 1 ELSE 0 END) AS BIGINT) AS r,
             |    CAST(sum(CASE WHEN hi THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
             |    CAST(sum(CASE WHEN NOT hi THEN 1 ELSE 0 END) AS DOUBLE) AS n0
             |  FROM (SELECT hi, lag(hi) OVER (ORDER BY day) AS pv FROM fl))
             |SELECT r AS n_runs, CAST(n1 AS BIGINT) AS n_above,
             |  CAST(n0 AS BIGINT) AS n_below,
             |  round((2.0 * n1 * n0 / (n1 + n0) + 1.0) * 10000.0) / 10000.0
             |    AS expected_runs,
             |  round((CAST(r AS DOUBLE) - (2.0 * n1 * n0 / (n1 + n0) + 1.0))
             |    / sqrt(((2.0 * n1 * n0 / (n1 + n0) + 1.0) - 1.0)
             |      * ((2.0 * n1 * n0 / (n1 + n0) + 1.0) - 2.0)
             |      / ((n1 + n0) - 1.0)) * 1000000.0) / 1000000.0 AS z
             |FROM rn""".stripMargin)),

    // ---- Lincoln-Petersen capture-recapture estimate of the document
    // universe from two INDEPENDENT deterministic hash samples: N-hat =
    // n1·n2/m — the mark-recapture estimator applied to coverage
    // auditing ("how much corpus do our two crawls imply"). Exact
    // portable-hash membership; one pass.
    Q("q328_capture_recapture",
      (s, d) => {
        val h1 = pmod(graft.expressions.PortableHash
          .md5Hash60(concat(lit("s1#"), col("doc_id"))), lit(3L)) === 0L
        val h2 = pmod(graft.expressions.PortableHash
          .md5Hash60(concat(lit("s2#"), col("doc_id"))), lit(3L)) === 0L
        val m = t(s, d, "documents").agg(
          count(lit(1)).cast("long").as("n_true"),
          sum(when(h1, 1L).otherwise(0L)).cast("long").as("n1"),
          sum(when(h2, 1L).otherwise(0L)).cast("long").as("n2"),
          sum(when(h1 && h2, 1L).otherwise(0L)).cast("long").as("m"))
        m.select(col("n_true"), col("n1"), col("n2"), col("m"),
          when(col("m") > 0, round(col("n1").cast("double") *
            col("n2").cast("double") / col("m").cast("double") * 100.0)
            / 100.0).as("n_hat"),
          when(col("m") > 0, round((col("n1").cast("double") *
            col("n2").cast("double") / col("m").cast("double") -
            col("n_true").cast("double")) / col("n_true").cast("double")
            * 1000000.0) / 1000000.0).as("rel_error"))
      },
      Some("""WITH f AS (SELECT doc_id,
             |    CAST(('0x' || substr(md5('s1#' || CAST(doc_id AS VARCHAR)),
             |      1, 15)) AS BIGINT) % 3 = 0 AS h1,
             |    CAST(('0x' || substr(md5('s2#' || CAST(doc_id AS VARCHAR)),
             |      1, 15)) AS BIGINT) % 3 = 0 AS h2
             |  FROM documents),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n_true,
             |    CAST(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN h2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(sum(CASE WHEN h1 AND h2 THEN 1 ELSE 0 END) AS BIGINT) AS m
             |  FROM f)
             |SELECT n_true, n1, n2, m,
             |  CASE WHEN m > 0 THEN round(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             |    / CAST(m AS DOUBLE) * 100.0) / 100.0 END AS n_hat,
             |  CASE WHEN m > 0 THEN round((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             |    / CAST(m AS DOUBLE) - CAST(n_true AS DOUBLE))
             |    / CAST(n_true AS DOUBLE) * 1000000.0) / 1000000.0 END
             |    AS rel_error
             |FROM a""".stripMargin)),

    // ---- McNemar's paired test on two language-ID rules evaluated
    // against the lang label: rule A = token 'the' present, rule B =
    // token 'a' present (B fires on es/fr docs too → asymmetric
    // discordance). b/c are the discordant-pair counts; the statistic is
    // the continuity-corrected (|b−c|−1)²/(b+c) — the paired-classifier
    // comparison a model-eval pipeline runs when both predictors score
    // the SAME documents (independence-assuming chi² would be wrong).
    // ONE conditional-sum pass, shuffle-free below the final fold.
    Q("q329_mcnemar",
      (s, d) => {
        val toks = split(col("text"), " ")
        val lab = col("lang") === "en"
        val ca = array_contains(toks, "the") === lab
        val cb = array_contains(toks, "a") === lab
        t(s, d, "documents").agg(
            count(lit(1)).cast("long").as("n"),
            sum(when(ca && cb, 1L).otherwise(0L)).cast("long")
              .as("both_correct"),
            sum(when(ca && !cb, 1L).otherwise(0L)).cast("long").as("b"),
            sum(when(!ca && cb, 1L).otherwise(0L)).cast("long").as("c"))
          .select(col("n"), col("both_correct"), col("b"), col("c"),
            when(col("b") + col("c") > 0,
              round(pow(abs((col("b") - col("c")).cast("double")) - 1.0,
                2.0) / (col("b") + col("c")).cast("double") * 1000000.0)
                / 1000000.0).as("chi2"))
      },
      Some("""WITH f AS (SELECT
             |    (list_contains(string_split(text, ' '), 'the'))
             |      = (lang = 'en') AS ca,
             |    (list_contains(string_split(text, ' '), 'a'))
             |      = (lang = 'en') AS cb
             |  FROM documents),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN ca AND cb THEN 1 ELSE 0 END) AS BIGINT)
             |      AS both_correct,
             |    CAST(sum(CASE WHEN ca AND NOT cb THEN 1 ELSE 0 END)
             |      AS BIGINT) AS b,
             |    CAST(sum(CASE WHEN NOT ca AND cb THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c
             |  FROM f)
             |SELECT n, both_correct, b, c,
             |  CASE WHEN b + c > 0 THEN
             |    round(pow(abs(CAST(b - c AS DOUBLE)) - 1.0, 2.0)
             |      / CAST(b + c AS DOUBLE) * 1000000.0) / 1000000.0
             |  END AS chi2
             |FROM a""".stripMargin)),

    // ---- Cochran–Mantel–Haenszel test: does order priority (URGENT/
    // HIGH vs rest) associate with fulfillment (status F) CONTROLLING
    // for market segment? Per-stratum 2×2 tables as exact long counts
    // (one shuffle on the 5-value segment key, customer dim broadcast
    // into the fact scan), then the continuity-corrected CMH statistic
    // (|Σaₖ−ΣEₖ|−½)²/ΣVₖ from 6-dp-rounded expectation/variance folds —
    // rounding BEFORE the ratio keeps the cross-engine double drift of
    // the tiny 5-row fold out of the statistic.
    Q("q330_cmh_test",
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_custkey"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("tr"),
          (col("o_orderstatus") === "F").as("yy"))
        val st = o.join(broadcast(t(s, d, "customer")
              .select("c_custkey", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment").agg(
            sum(when(col("tr") && col("yy"), 1L).otherwise(0L)).as("a"),
            sum(when(col("tr"), 1L).otherwise(0L)).as("n1"),
            sum(when(col("yy"), 1L).otherwise(0L)).as("m1"),
            count(lit(1)).as("nk"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val ag = st.agg(
          count(lit(1)).cast("long").as("n_strata"),
          sum(col("a")).cast("long").as("sum_a"),
          (round(sum(dd(col("n1")) * dd(col("m1")) / dd(col("nk")))
            * 1000000.0) / 1000000.0).as("expected"),
          (round(sum(dd(col("n1")) * (dd(col("nk")) - dd(col("n1")))
              * dd(col("m1")) * (dd(col("nk")) - dd(col("m1")))
              / (dd(col("nk")) * dd(col("nk")) * (dd(col("nk")) - 1.0)))
            * 1000000.0) / 1000000.0).as("variance"))
        ag.select(col("n_strata"), col("sum_a"), col("expected"),
          col("variance"),
          (round(pow(abs(col("sum_a").cast("double") - col("expected"))
              - 0.5, 2.0) / col("variance") * 1000000.0) / 1000000.0)
            .as("cmh"))
      },
      Some("""WITH o AS (SELECT o_custkey,
             |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS tr,
             |    o_orderstatus = 'F' AS yy FROM orders),
             |st AS (SELECT c_mktsegment,
             |    sum(CASE WHEN tr AND yy THEN 1 ELSE 0 END) AS a,
             |    sum(CASE WHEN tr THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN yy THEN 1 ELSE 0 END) AS m1,
             |    count(*) AS nk
             |  FROM o JOIN customer ON o_custkey = c_custkey GROUP BY 1),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
             |    CAST(sum(a) AS BIGINT) AS sum_a,
             |    round(sum(CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE)
             |        / CAST(nk AS DOUBLE)) * 1000000.0) / 1000000.0
             |      AS expected,
             |    round(sum(CAST(n1 AS DOUBLE)
             |        * (CAST(nk AS DOUBLE) - CAST(n1 AS DOUBLE))
             |        * CAST(m1 AS DOUBLE)
             |        * (CAST(nk AS DOUBLE) - CAST(m1 AS DOUBLE))
             |        / (CAST(nk AS DOUBLE) * CAST(nk AS DOUBLE)
             |          * (CAST(nk AS DOUBLE) - 1.0))) * 1000000.0)
             |      / 1000000.0 AS variance
             |  FROM st)
             |SELECT n_strata, sum_a, expected, variance,
             |  round(pow(abs(CAST(sum_a AS DOUBLE) - expected) - 0.5, 2.0)
             |    / variance * 1000000.0) / 1000000.0 AS cmh
             |FROM ag""".stripMargin)),

    // ---- Seasonal-naive forecast backtest: ŷ(t) = y(t−7) over the
    // dense daily event-count series, scored with MAE / RMSE / sMAPE —
    // the baseline every traffic-forecast model must beat, and the
    // shape of a backtest harness (lag-k prediction + error fold).
    // Error sums are EXACT longs (counts are integers; only the final
    // divisions go through double); the day-domain window is the q327
    // convention (dense series is calendar-bounded, not row-bounded).
    Q("q331_forecast_eval",
      (s, d) => {
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        val fc = dense.withColumn("f", lag(col("c"), 7).over(w))
          .where(col("f").isNotNull)
        val dif = col("c") - col("f")
        fc.agg(
            count(lit(1)).cast("long").as("n_eval"),
            sum(abs(dif)).cast("long").as("sa"),
            sum(dif * dif).cast("long").as("sq"),
            sum(when(col("c") + col("f") > 0,
                lit(2.0) * abs(dif).cast("double")
                  / (col("c") + col("f")).cast("double"))
              .otherwise(lit(0.0))).as("sm"))
          .select(col("n_eval"),
            (round(col("sa").cast("double") / col("n_eval").cast("double")
              * 10000.0) / 10000.0).as("mae"),
            (round(sqrt(col("sq").cast("double")
              / col("n_eval").cast("double")) * 10000.0) / 10000.0)
              .as("rmse"),
            (round(col("sm") / col("n_eval").cast("double") * 1000000.0)
              / 1000000.0).as("smape"))
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |fc AS (SELECT c, lag(c, 7) OVER (ORDER BY day) AS f FROM dn),
             |e AS (SELECT CAST(count(*) AS BIGINT) AS n_eval,
             |    CAST(sum(abs(c - f)) AS BIGINT) AS sa,
             |    CAST(sum((c - f) * (c - f)) AS BIGINT) AS sq,
             |    sum(CASE WHEN c + f > 0 THEN 2.0
             |        * CAST(abs(c - f) AS DOUBLE) / CAST(c + f AS DOUBLE)
             |      ELSE 0.0 END) AS sm
             |  FROM fc WHERE f IS NOT NULL)
             |SELECT n_eval,
             |  round(CAST(sa AS DOUBLE) / CAST(n_eval AS DOUBLE) * 10000.0)
             |    / 10000.0 AS mae,
             |  round(sqrt(CAST(sq AS DOUBLE) / CAST(n_eval AS DOUBLE))
             |    * 10000.0) / 10000.0 AS rmse,
             |  round(sm / CAST(n_eval AS DOUBLE) * 1000000.0) / 1000000.0
             |    AS smape
             |FROM e""".stripMargin)),

    // ---- 1-D Wasserstein (earth-mover) distance between the document-
    // length distributions of English vs non-English docs: W₁ =
    // ∫|F₁−F₂|dx over the merged n_chars support — the drift metric
    // that, unlike KS (sup-norm, q201) or PSI (binned, q297), weighs
    // HOW FAR mass moved. The CDF gap is kept as the EXACT integer
    // c1·N₂ − c2·N₁ (decimal38) so the step integral is exact until the
    // single final division; support-bounded single-partition window
    // (distinct char-lengths), single-row totals broadcast.
    Q("q332_wasserstein_1d",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val docs = t(s, d, "documents")
          .select(col("n_chars").as("v"), (col("lang") === "en").as("g"))
        val per = docs.groupBy("v").agg(
          sum(when(col("g"), 1L).otherwise(0L)).as("a1"),
          sum(when(!col("g"), 1L).otherwise(0L)).as("a2"))
        val tot = per.agg(sum(col("a1")).cast(dec).as("t1"),
          sum(col("a2")).cast(dec).as("t2"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("v")
        val cum = per.select(col("v"), sum(col("a1")).over(w).as("c1"),
          sum(col("a2")).over(w).as("c2"), lead(col("v"), 1).over(w).as("nv"))
        val st = cum.join(broadcast(tot)).where(col("nv").isNotNull)
          .select(col("t1"), col("t2"),
            (abs(col("c1").cast(dec) * col("t2")
              - col("c2").cast(dec) * col("t1"))
              * (col("nv") - col("v")).cast(dec)).as("term"))
        st.agg(count(lit(1)).cast("long").as("n_steps"),
            max(col("t1")).as("t1"), max(col("t2")).as("t2"),
            sum(col("term")).as("s"))
          .select(col("n_steps"), col("t1").cast("long").as("n_en"),
            col("t2").cast("long").as("n_other"),
            (round(col("s").cast("double") / (col("t1").cast("double")
              * col("t2").cast("double")) * 1000000.0) / 1000000.0)
              .as("w1"))
      },
      Some("""WITH dcs AS (SELECT n_chars AS v, lang = 'en' AS g
             |  FROM documents),
             |per AS (SELECT v, sum(CASE WHEN g THEN 1 ELSE 0 END) AS a1,
             |    sum(CASE WHEN NOT g THEN 1 ELSE 0 END) AS a2
             |  FROM dcs GROUP BY 1),
             |tt AS (SELECT CAST(sum(a1) AS HUGEINT) AS t1,
             |    CAST(sum(a2) AS HUGEINT) AS t2 FROM per),
             |cum AS (SELECT v, sum(a1) OVER w AS c1, sum(a2) OVER w AS c2,
             |    lead(v) OVER w AS nv FROM per WINDOW w AS (ORDER BY v)),
             |st AS (SELECT t1, t2,
             |    abs(CAST(c1 AS HUGEINT) * t2 - CAST(c2 AS HUGEINT) * t1)
             |      * CAST(nv - v AS HUGEINT) AS term
             |  FROM cum CROSS JOIN tt WHERE nv IS NOT NULL)
             |SELECT CAST(count(*) AS BIGINT) AS n_steps,
             |  CAST(max(t1) AS BIGINT) AS n_en,
             |  CAST(max(t2) AS BIGINT) AS n_other,
             |  round(CAST(sum(term) AS DOUBLE) / (CAST(max(t1) AS DOUBLE)
             |    * CAST(max(t2) AS DOUBLE)) * 1000000.0) / 1000000.0 AS w1
             |FROM st""".stripMargin)),

    // ---- Good–Turing frequency-of-frequencies smoothing over the
    // corpus term table (q30's tokenization): r* = (r+1)·N_{r+1}/N_r over
    // the 10 SMALLEST frequency classes present (rank-cut, not a fixed
    // r-cut — the synthetic vocab is dense, so min counts sit high) —
    // the adjusted counts an n-gram LM uses for unseen-mass
    // estimation (Good 1953). N_{r+1} is matched at EXACTLY r+1 (lead
    // guarded on contiguity, not just next-present), counts stay exact
    // integers until the single division; the window runs over the
    // freq-of-freqs table, whose size is bounded by max term count.
    Q("q333_good_turing",
      (s, d) => {
        val tc = t(s, d, "documents")
          .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("r"))
        val ff = tc.groupBy("r").agg(count(lit(1)).as("n_r"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("r")
        ff.select(col("r"), col("n_r"),
            lead(col("r"), 1).over(w).as("nr1"),
            lead(col("n_r"), 1).over(w).as("nn1"),
            row_number().over(w).as("rk"))
          .where(col("rk") <= 10)
          .select(col("r").cast("long").as("r"),
            col("n_r").cast("long").as("n_r"),
            when(col("nr1") === col("r") + 1,
              round((col("r") + 1).cast("double") * col("nn1").cast("double")
                / col("n_r").cast("double") * 10000.0) / 10000.0)
              .as("r_star"))
          .orderBy("r")
      },
      Some("""WITH tc AS (SELECT term, count(*) AS r FROM (
             |    SELECT unnest(string_split(text, ' ')) AS term
             |    FROM documents) GROUP BY term),
             |ff AS (SELECT r, count(*) AS n_r FROM tc GROUP BY r),
             |ld AS (SELECT r, n_r, lead(r) OVER (ORDER BY r) AS nr1,
             |    lead(n_r) OVER (ORDER BY r) AS nn1,
             |    row_number() OVER (ORDER BY r) AS rk FROM ff)
             |SELECT CAST(r AS BIGINT) AS r, CAST(n_r AS BIGINT) AS n_r,
             |  CASE WHEN nr1 = r + 1 THEN
             |    round(CAST(r + 1 AS DOUBLE) * CAST(nn1 AS DOUBLE)
             |      / CAST(n_r AS DOUBLE) * 10000.0) / 10000.0
             |  END AS r_star
             |FROM ld WHERE rk <= 10 ORDER BY r""".stripMargin)),

    // ---- Delta-method CI for a RATIO metric (clicks per view) under a
    // hash-split A/B assignment: user-level (x, y) sums, R = Σx/Σy, and
    // se from the user-level moment sums via Var(R) ≈ (s²_x − 2R·s_xy +
    // R²·s²_y)/(n·ȳ²) — the correct CI when the metric's denominator is
    // itself random (a per-event z-test would understate variance).
    // Moment sums are EXACT decimal38 integers (counts); one shuffle on
    // user_id, then a 2-row variant fold. The final algebra is a fixed
    // IEEE chain from 6-dp-rounded moment ratios on both engines.
    Q("q334_ratio_delta_ci",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ev = Tables.events(s, d)
        val ux = ev.groupBy("user_id").agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("x"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("y"))
          .select(pmod(col("user_id"), lit(2L)).as("variant"),
            col("x"), col("y"))
        val m = ux.groupBy("variant").agg(
          count(lit(1)).cast("long").as("n_users"),
          sum(col("x")).cast("long").as("sx"),
          sum(col("y")).cast("long").as("sy"),
          sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
          sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
          sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val n = dd(col("n_users"))
        val r = dd(col("sx")) / dd(col("sy"))
        val ybar = dd(col("sy")) / n
        val vx = (dd(col("sxx")) - dd(col("sx")) * dd(col("sx")) / n) /
          (n - 1.0)
        val vy = (dd(col("syy")) - dd(col("sy")) * dd(col("sy")) / n) /
          (n - 1.0)
        val cxy = (dd(col("sxy")) - dd(col("sx")) * dd(col("sy")) / n) /
          (n - 1.0)
        val se = sqrt((vx - lit(2.0) * r * cxy + r * r * vy) / n) / ybar
        m.select(col("variant").cast("long").as("variant"), col("n_users"),
            col("sx"), col("sy"),
            (round(r * 1000000.0) / 1000000.0).as("ratio"),
            (round(se * 1000000.0) / 1000000.0).as("se"),
            (round((r - lit(1.96) * se) * 1000000.0) / 1000000.0)
              .as("ci_lo"),
            (round((r + lit(1.96) * se) * 1000000.0) / 1000000.0)
              .as("ci_hi"))
          .orderBy("variant")
      },
      Some("""WITH ux AS (SELECT user_id % 2 AS variant,
             |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS y
             |  FROM events GROUP BY user_id),
             |m AS (SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
             |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
             |  FROM ux GROUP BY variant)
             |SELECT CAST(variant AS BIGINT) AS variant, n_users, sx, sy,
             |  round(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS ratio,
             |  round(sqrt(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
             |      * CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE))
             |      / (CAST(n_users AS DOUBLE) - 1.0)
             |    - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |      * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
             |        * CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE))
             |        / (CAST(n_users AS DOUBLE) - 1.0))
             |    + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |      * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |      * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
             |        * CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE))
             |        / (CAST(n_users AS DOUBLE) - 1.0)))
             |    / CAST(n_users AS DOUBLE))
             |    / (CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE))
             |    * 1000000.0) / 1000000.0 AS se,
             |  round((CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) - 1.96
             |    * sqrt(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
             |      * CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE))
             |      / (CAST(n_users AS DOUBLE) - 1.0)
             |    - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |      * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
             |        * CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE))
             |        / (CAST(n_users AS DOUBLE) - 1.0))
             |    + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |      * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |      * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
             |        * CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE))
             |        / (CAST(n_users AS DOUBLE) - 1.0)))
             |    / CAST(n_users AS DOUBLE))
             |    / (CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS ci_lo,
             |  round((CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) + 1.96
             |    * sqrt(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
             |      * CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE))
             |      / (CAST(n_users AS DOUBLE) - 1.0)
             |    - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |      * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
             |        * CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE))
             |        / (CAST(n_users AS DOUBLE) - 1.0))
             |    + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |      * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |      * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
             |        * CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE))
             |        / (CAST(n_users AS DOUBLE) - 1.0)))
             |    / CAST(n_users AS DOUBLE))
             |    / (CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS ci_hi
             |FROM m ORDER BY variant""".stripMargin)),

    // ---- Nelson–Aalen cumulative hazard + Fleming–Harrington survival
    // over the q231 view→purchase duration table: H(t) = Σ e/n_risk —
    // the estimator that stays stable when risk sets get small (KM's
    // product terms degenerate first). Same censoring semantics and
    // day-quantized durations as q231; only the ordered hazard cumsum
    // is double, 6-dp rounded on both engines.
    Q("q335_nelson_aalen",
      (s, d) => graft.operators.EventOps.nelsonAalen(Tables.events(s, d)),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
             |en AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN tns END) AS t0,
             |    max(tns) AS tmax
             |  FROM e GROUP BY user_id
             |  HAVING min(CASE WHEN event_type = 'view' THEN tns END) IS NOT NULL),
             |cv AS (SELECT e.user_id, min(tns) AS tp
             |  FROM e JOIN en USING (user_id)
             |  WHERE event_type = 'purchase' AND tns >= t0 GROUP BY e.user_id),
             |du AS (SELECT en.user_id,
             |    CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400000000000
             |         ELSE (tmax - t0) // 86400000000000 END AS dur,
             |    CAST(tp IS NOT NULL AS BIGINT) AS ev
             |  FROM en LEFT JOIN cv USING (user_id)),
             |cl AS (SELECT dur, sum(ev) AS e, sum(1 - ev) AS c FROM du GROUP BY dur),
             |tt AS (SELECT sum(e + c) AS n FROM cl),
             |rk AS (SELECT dur, e, c, n,
             |    n - coalesce(sum(e + c) OVER (ORDER BY dur
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
             |  FROM cl CROSS JOIN tt),
             |sv AS (SELECT dur, n_risk, e, c,
             |    sum(CASE WHEN e > 0
             |        THEN CAST(e AS DOUBLE) / CAST(n_risk AS DOUBLE)
             |        ELSE 0.0 END)
             |      OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS ch
             |  FROM rk)
             |SELECT dur AS duration_days, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(e AS BIGINT) AS events, CAST(c AS BIGINT) AS censored,
             |  round(ch * 1000000.0) / 1000000.0 AS cum_hazard,
             |  round(exp(-ch) * 1000000.0) / 1000000.0 AS survival_fh
             |FROM sv ORDER BY duration_days""".stripMargin)),

    // ---- Cramér's V association strength for two categorical pairs
    // (order priority×status, lineitem returnflag×linestatus) via the
    // identity χ² = n·(Σ o²/(r·c) − 1), so the only double work is the
    // per-cell o²/(r·c) fold over ≤ R·C cells — row/col marginals join
    // back broadcast (cell tables are category-bounded however big the
    // fact is), and V = √((s−1)/(min(R,C)−1)) normalizes χ² to [0,1].
    Q("q336_cramers_v",
      (s, d) => {
        def cram(df: org.apache.spark.sql.DataFrame, pairName: String) = {
          val cell = df.groupBy("a", "b").agg(count(lit(1)).as("o"))
          val j = cell
            .join(broadcast(cell.groupBy("a").agg(sum(col("o")).as("ra"))), "a")
            .join(broadcast(cell.groupBy("b").agg(sum(col("o")).as("cb"))), "b")
          j.agg(sum(col("o")).cast("long").as("n"),
              countDistinct(col("a")).cast("long").as("n_rows"),
              countDistinct(col("b")).cast("long").as("n_cols"),
              sum(col("o").cast("double") * col("o").cast("double")
                / (col("ra").cast("double") * col("cb").cast("double")))
                .as("s"))
            .select(lit(pairName).as("pair"), col("n"), col("n_rows"),
              col("n_cols"),
              (round(col("n").cast("double") * (col("s") - 1.0) * 10000.0)
                / 10000.0).as("chi2"),
              (round(sqrt((col("s") - 1.0)
                / (least(col("n_rows"), col("n_cols")) - 1L).cast("double"))
                * 1000000.0) / 1000000.0).as("v"))
        }
        cram(t(s, d, "orders").select(col("o_orderpriority").as("a"),
            col("o_orderstatus").as("b")), "priority_status")
          .unionAll(cram(t(s, d, "lineitem")
            .select(col("l_returnflag").as("a"),
              col("l_linestatus").as("b")), "returnflag_linestatus"))
          .orderBy("pair")
      },
      Some("""WITH c1 AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
             |    count(*) AS o FROM orders GROUP BY 1, 2),
             |j1 AS (SELECT o, sum(o) OVER (PARTITION BY a) AS ra,
             |    sum(o) OVER (PARTITION BY b) AS cb, a, b FROM c1),
             |s1 AS (SELECT 'priority_status' AS pair,
             |    CAST(sum(o) AS BIGINT) AS n,
             |    CAST(count(DISTINCT a) AS BIGINT) AS n_rows,
             |    CAST(count(DISTINCT b) AS BIGINT) AS n_cols,
             |    sum(CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
             |      / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))) AS s
             |  FROM j1),
             |c2 AS (SELECT l_returnflag AS a, l_linestatus AS b,
             |    count(*) AS o FROM lineitem GROUP BY 1, 2),
             |j2 AS (SELECT o, sum(o) OVER (PARTITION BY a) AS ra,
             |    sum(o) OVER (PARTITION BY b) AS cb, a, b FROM c2),
             |s2 AS (SELECT 'returnflag_linestatus' AS pair,
             |    CAST(sum(o) AS BIGINT) AS n,
             |    CAST(count(DISTINCT a) AS BIGINT) AS n_rows,
             |    CAST(count(DISTINCT b) AS BIGINT) AS n_cols,
             |    sum(CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
             |      / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))) AS s
             |  FROM j2),
             |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
             |SELECT pair, n, n_rows, n_cols,
             |  round(CAST(n AS DOUBLE) * (s - 1.0) * 10000.0) / 10000.0
             |    AS chi2,
             |  round(sqrt((s - 1.0)
             |    / CAST(least(n_rows, n_cols) - 1 AS DOUBLE)) * 1000000.0)
             |    / 1000000.0 AS v
             |FROM u ORDER BY pair""".stripMargin)),

    // ---- Wald's sequential probability ratio test (SPRT) on the
    // purchase-rate Bernoulli stream: H₀ p=0.15 vs H₁ p=0.25,
    // α=β=0.05 → symmetric ±ln 19 boundaries. The LLR at step t is the
    // EXACT composition k·ln(5/3) + (t−k)·ln(15/17) from integer
    // cumulative counts (never an accumulated double), so the crossing
    // row is engine-deterministic; the decision row joins back by the
    // min crossing rn. The event-domain window is a total (ts,
    // event_id) order — the sequential test is inherently one ordered
    // scan; everything after it is O(1) rows.
    Q("q337_sprt",
      (s, d) => {
        val lnR1 = log(lit(5.0 / 3.0))     // ln(p1/p0)
        val lnR0 = log(lit(15.0 / 17.0))   // ln((1−p1)/(1−p0))
        val lnA = log(lit(19.0))
        val ev = Tables.events(s, d).select(col("ts").as("tns"),
          col("event_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("x"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("tns", "event_id")
        val rows = ev.select(row_number().over(w).as("rn"),
            sum(col("x")).over(w).as("k"))
          .select(col("rn"), col("k"),
            (col("k").cast("double") * lnR1
              + (col("rn") - col("k")).cast("double") * lnR0).as("llr"))
        val crossed = rows.where(col("llr") >= lnA || col("llr") <= -lnA)
        val firstRn = crossed.agg(min(col("rn")).as("n_dec"))
        val dec = rows.join(broadcast(firstRn), col("rn") === col("n_dec"))
          .select(col("n_dec"), col("k").as("k_dec"),
            col("llr").as("llr_dec"))
        val fin = ev.agg(count(lit(1)).cast("long").as("n_total"),
          sum(col("x")).cast("long").as("k_total"))
        fin.join(broadcast(dec), lit(true), "left")
          .select(col("n_total"),
            when(col("llr_dec") >= lnA, "accept_h1")
              .when(col("llr_dec") <= -lnA, "accept_h0")
              .otherwise("continue").as("decision"),
            col("n_dec").cast("long").as("n_dec"),
            col("k_dec").cast("long").as("k_dec"),
            (round(col("llr_dec") * 1000000.0) / 1000000.0).as("llr_dec"),
            (round((col("k_total").cast("double") * lnR1
              + (col("n_total") - col("k_total")).cast("double") * lnR0)
              * 1000000.0) / 1000000.0).as("llr_final"))
      },
      Some("""WITH e AS (SELECT epoch_ns(ts) AS tns, event_id,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
             |  FROM events),
             |r AS (SELECT row_number() OVER w AS rn, sum(x) OVER w AS k
             |  FROM e WINDOW w AS (ORDER BY tns, event_id)),
             |l AS (SELECT rn, k,
             |    CAST(k AS DOUBLE) * ln(5.0 / 3.0)
             |      + CAST(rn - k AS DOUBLE) * ln(15.0 / 17.0) AS llr
             |  FROM r),
             |c AS (SELECT min(rn) AS n_dec FROM l
             |  WHERE llr >= ln(19.0) OR llr <= -ln(19.0)),
             |dr AS (SELECT l.rn AS n_dec, l.k AS k_dec, l.llr AS llr_dec
             |  FROM l JOIN c ON l.rn = c.n_dec),
             |f AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
             |    CAST(sum(x) AS BIGINT) AS k_total FROM e)
             |SELECT n_total,
             |  CASE WHEN llr_dec >= ln(19.0) THEN 'accept_h1'
             |       WHEN llr_dec <= -ln(19.0) THEN 'accept_h0'
             |       ELSE 'continue' END AS decision,
             |  CAST(n_dec AS BIGINT) AS n_dec,
             |  CAST(k_dec AS BIGINT) AS k_dec,
             |  round(llr_dec * 1000000.0) / 1000000.0 AS llr_dec,
             |  round((CAST(k_total AS DOUBLE) * ln(5.0 / 3.0)
             |    + CAST(n_total - k_total AS DOUBLE) * ln(15.0 / 17.0))
             |    * 1000000.0) / 1000000.0 AS llr_final
             |FROM f LEFT JOIN dr ON TRUE""".stripMargin)),

    // ---- Edit-distance near-duplicate pairs over the part-name
    // vocabulary with LAST-WORD blocking + a length band: the banded
    // blocking turns the O(V²) all-pairs Levenshtein into per-block
    // equi-joins (block = product noun), the shape that survives when V
    // is millions — the quadratic work is confined to same-block,
    // similar-length candidates and the length band is a pushable
    // pre-filter that never computes the DP. Spark's levenshtein and
    // DuckDB's agree on standard unit-cost edit distance.
    Q("q338_levenshtein_pairs",
      (s, d) => {
        val names = t(s, d, "part").select(col("p_name").as("nm"))
          .distinct()
          .select(col("nm"),
            element_at(split(col("nm"), " "), -1).as("blk"),
            length(col("nm")).as("ln"))
        val a = names.select(col("nm").as("name_a"), col("blk"),
          col("ln").as("la"))
        val b = names.select(col("nm").as("name_b"),
          col("blk").as("blk_b"), col("ln").as("lb"))
        a.join(b, col("blk") === col("blk_b")
            && col("name_a") < col("name_b")
            && abs(col("la") - col("lb")) <= 3)
          .select(col("name_a"), col("name_b"),
            levenshtein(col("name_a"), col("name_b")).cast("long")
              .as("dist"))
          .where(col("dist") <= 3)
          .orderBy("name_a", "name_b")
      },
      Some("""WITH names AS (SELECT DISTINCT p_name AS nm FROM part),
             |x AS (SELECT nm, string_split(nm, ' ')[-1] AS blk,
             |    length(nm) AS ln FROM names)
             |SELECT a.nm AS name_a, b.nm AS name_b,
             |  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
             |FROM x a JOIN x b ON a.blk = b.blk AND a.nm < b.nm
             |  AND abs(a.ln - b.ln) <= 3
             |WHERE levenshtein(a.nm, b.nm) <= 3
             |ORDER BY name_a, name_b""".stripMargin)),

    // ---- Davies–Bouldin cluster-validity index over the labeled
    // embeddings (q322's 1e-4 quantization): per-cluster scatter sₖ and
    // pairwise centroid distances are kept as EXACT integer numerators
    // (Σx²·n − ΣS², Σ(Sᵢnⱼ−Sⱼnᵢ)²) until one sqrt each, so the
    // worst-partner ratio Rᵢⱼ=(sᵢ+sⱼ)/dᵢⱼ and its per-cluster max are
    // engine-deterministic. All post-scan tables are label- or
    // label²-sized; the vector scan is the only data-sized pass.
    Q("q339_davies_bouldin",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val q = t(s, d, "embeddings").select(
          col("label").cast("long").as("label"),
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) " +
            "* 10000.0) AS LONG))").as("q")).localCheckpoint()
        val ns = q.groupBy("label").agg(count(lit(1)).cast(dec).as("n"))
        val ex = q.select(col("label"), posexplode(col("q")).as(Seq("i", "v")))
        val sums = ex.groupBy("label", "i")
          .agg(sum(col("v")).cast(dec).as("s"))
        val ssq = ex.groupBy("label")
          .agg(sum(col("v").cast(dec) * col("v").cast(dec)).as("ssq"))
        val ss2 = sums.groupBy("label")
          .agg(sum(col("s") * col("s")).as("ss2"))
        val st = ns.join(ssq, "label").join(ss2, "label")
          .select(col("label"), col("n"),
            (sqrt((col("ssq") * col("n") - col("ss2")).cast("double"))
              / (col("n").cast("double") * 10000.0)).as("sk"))
        val a = sums.select(col("label").as("la"), col("i"), col("s").as("sa"))
          .join(broadcast(ns.select(col("label").as("la"), col("n").as("na"))), "la")
        val b = sums.select(col("label").as("lb"), col("i").as("ib"),
            col("s").as("sb"))
          .join(broadcast(ns.select(col("label").as("lb"), col("n").as("nb"))), "lb")
        val pr = a.join(b, col("i") === col("ib") && col("la") =!= col("lb"))
          .groupBy("la", "lb").agg(
            sum((col("sa") * col("nb") - col("sb") * col("na"))
              * (col("sa") * col("nb") - col("sb") * col("na"))).as("num"),
            max(col("na")).as("na"), max(col("nb")).as("nb"))
        val r = pr
          .join(broadcast(st.select(col("label").as("la"), col("sk").as("ska"))), "la")
          .join(broadcast(st.select(col("label").as("lb"), col("sk").as("skb"))), "lb")
          .select(col("la"),
            ((col("ska") + col("skb")) / (sqrt(col("num").cast("double"))
              / (col("na").cast("double") * col("nb").cast("double")
                * 10000.0))).as("rr"))
        val mx = r.groupBy("la")
          .agg((round(max(col("rr")) * 1000000.0) / 1000000.0).as("r_max"))
        val db = mx.agg((round(avg(col("r_max")) * 1000000.0) / 1000000.0)
          .as("db_index"))
        mx.join(broadcast(st.select(col("label").as("la"), col("n"),
            col("sk"))), "la")
          .join(broadcast(db))
          .select(col("la").as("label"), col("n").cast("long").as("n"),
            (round(col("sk") * 1000000.0) / 1000000.0).as("s_within"),
            col("r_max"), col("db_index"))
          .orderBy("label")
      },
      Some("""WITH q AS (SELECT label,
             |    [CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)
             |     for x in embedding] AS q
             |  FROM embeddings),
             |ns AS (SELECT label, CAST(count(*) AS HUGEINT) AS n
             |  FROM q GROUP BY label),
             |ex AS (SELECT label,
             |    unnest([{'i': i, 'v': q[i]} for i in range(1, 65)]) AS e
             |  FROM q),
             |sums AS (SELECT label, e.i AS i, CAST(sum(e.v) AS HUGEINT) AS s
             |  FROM ex GROUP BY 1, 2),
             |sq AS (SELECT label, sum(CAST(e.v AS HUGEINT)
             |    * CAST(e.v AS HUGEINT)) AS ssq FROM ex GROUP BY 1),
             |s2 AS (SELECT label, sum(s * s) AS ss2 FROM sums GROUP BY 1),
             |st AS (SELECT ns.label, ns.n,
             |    sqrt(CAST(sq.ssq * ns.n - s2.ss2 AS DOUBLE))
             |      / (CAST(ns.n AS DOUBLE) * 10000.0) AS sk
             |  FROM ns JOIN sq ON ns.label = sq.label
             |    JOIN s2 ON ns.label = s2.label),
             |pr AS (SELECT a.label AS la, b.label AS lb,
             |    sum((a.s * bn.n - b.s * an.n) * (a.s * bn.n - b.s * an.n))
             |      AS num,
             |    max(an.n) AS na, max(bn.n) AS nb
             |  FROM sums a JOIN ns an ON a.label = an.label
             |    JOIN sums b ON a.i = b.i AND a.label <> b.label
             |    JOIN ns bn ON b.label = bn.label
             |  GROUP BY 1, 2),
             |r AS (SELECT la, (sa.sk + sb.sk) / (sqrt(CAST(num AS DOUBLE))
             |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 10000.0)) AS rr
             |  FROM pr JOIN st sa ON pr.la = sa.label
             |    JOIN st sb ON pr.lb = sb.label),
             |mx AS (SELECT la, round(max(rr) * 1000000.0) / 1000000.0
             |    AS r_max FROM r GROUP BY la),
             |db AS (SELECT round(avg(r_max) * 1000000.0) / 1000000.0
             |    AS db_index FROM mx)
             |SELECT CAST(la AS BIGINT) AS label, CAST(st.n AS BIGINT) AS n,
             |  round(st.sk * 1000000.0) / 1000000.0 AS s_within,
             |  r_max, db_index
             |FROM mx JOIN st ON mx.la = st.label CROSS JOIN db
             |ORDER BY label""".stripMargin)),

    // ---- Calinski–Harabasz variance-ratio index over the same labeled
    // embeddings: CH = (B/(K−1))/(W/(N−K)). Both scatter totals are
    // sums of per-cluster EXACT integer numerators (within: Σx²·n−ΣS²
    // over n; between: Σ(SᵢN−Tᵢnₖ)² over nₖN²), each term rounded to
    // one 1e-8-unit integer BEFORE the fold so the totals are exact
    // decimal sums — no accumulation-order drift. Model-sized tables
    // throughout; one data pass.
    Q("q340_calinski_harabasz",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val q = t(s, d, "embeddings").select(
          col("label").cast("long").as("label"),
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) " +
            "* 10000.0) AS LONG))").as("q")).localCheckpoint()
        val ns = q.groupBy("label").agg(count(lit(1)).cast(dec).as("n"))
        val ex = q.select(col("label"), posexplode(col("q")).as(Seq("i", "v")))
        val sums = ex.groupBy("label", "i")
          .agg(sum(col("v")).cast(dec).as("s"))
        val ssq = ex.groupBy("label")
          .agg(sum(col("v").cast(dec) * col("v").cast(dec)).as("ssq"))
        val ss2 = sums.groupBy("label")
          .agg(sum(col("s") * col("s")).as("ss2"))
        val tot = sums.groupBy("i").agg(sum(col("s")).as("ti"))
        val nn = ns.agg(sum(col("n")).as("nt"),
          count(lit(1)).cast("long").as("k"))
        val wterm = ns.join(ssq, "label").join(ss2, "label")
          .select(round((col("ssq") * col("n") - col("ss2")).cast("double")
            / col("n").cast("double")).cast(dec).as("wt"))
        val bterm = sums.join(broadcast(tot), "i").join(broadcast(ns), "label")
          .join(broadcast(nn))
          .groupBy("label").agg(
            sum((col("s") * col("nt") - col("ti") * col("n"))
              * (col("s") * col("nt") - col("ti") * col("n"))).as("g"),
            max(col("n")).as("n"), max(col("nt")).as("nt"))
          .select(round(col("g").cast("double") / (col("n").cast("double")
            * col("nt").cast("double") * col("nt").cast("double")))
            .cast(dec).as("bt"))
        val w = wterm.agg(sum(col("wt")).as("w"))
        val b = bterm.agg(sum(col("bt")).as("b"))
        w.join(broadcast(b)).join(broadcast(nn))
          .select(col("nt").cast("long").as("n_vectors"), col("k")
              .as("k_clusters"),
            (round(col("w").cast("double") / 100000000.0 * 10000.0)
              / 10000.0).as("within_ss"),
            (round(col("b").cast("double") / 100000000.0 * 10000.0)
              / 10000.0).as("between_ss"),
            (round((col("b").cast("double") / (col("k") - 1L).cast("double"))
              / (col("w").cast("double")
                / (col("nt").cast("long") - col("k")).cast("double"))
              * 10000.0) / 10000.0).as("ch"))
      },
      Some("""WITH q AS (SELECT label,
             |    [CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)
             |     for x in embedding] AS q
             |  FROM embeddings),
             |ns AS (SELECT label, CAST(count(*) AS HUGEINT) AS n
             |  FROM q GROUP BY label),
             |ex AS (SELECT label,
             |    unnest([{'i': i, 'v': q[i]} for i in range(1, 65)]) AS e
             |  FROM q),
             |sums AS (SELECT label, e.i AS i, CAST(sum(e.v) AS HUGEINT) AS s
             |  FROM ex GROUP BY 1, 2),
             |sq AS (SELECT label, sum(CAST(e.v AS HUGEINT)
             |    * CAST(e.v AS HUGEINT)) AS ssq FROM ex GROUP BY 1),
             |s2 AS (SELECT label, sum(s * s) AS ss2 FROM sums GROUP BY 1),
             |tt AS (SELECT i, sum(s) AS ti FROM sums GROUP BY i),
             |nn AS (SELECT sum(n) AS nt, CAST(count(*) AS BIGINT) AS k
             |  FROM ns),
             |wt AS (SELECT CAST(round(CAST(sq.ssq * ns.n - s2.ss2 AS DOUBLE)
             |    / CAST(ns.n AS DOUBLE)) AS HUGEINT) AS wt
             |  FROM ns JOIN sq ON ns.label = sq.label
             |    JOIN s2 ON ns.label = s2.label),
             |bt AS (SELECT CAST(round(CAST(g AS DOUBLE)
             |    / (CAST(n AS DOUBLE) * CAST(nt AS DOUBLE)
             |      * CAST(nt AS DOUBLE))) AS HUGEINT) AS bt
             |  FROM (SELECT sums.label,
             |      sum((sums.s * nn.nt - tt.ti * ns.n)
             |        * (sums.s * nn.nt - tt.ti * ns.n)) AS g,
             |      max(ns.n) AS n, max(nn.nt) AS nt
             |    FROM sums JOIN tt ON sums.i = tt.i
             |      JOIN ns ON sums.label = ns.label
             |      CROSS JOIN nn
             |    GROUP BY 1)),
             |w AS (SELECT sum(wt) AS w FROM wt),
             |b AS (SELECT sum(bt) AS b FROM bt)
             |SELECT CAST(nn.nt AS BIGINT) AS n_vectors, nn.k AS k_clusters,
             |  round(CAST(w.w AS DOUBLE) / 100000000.0 * 10000.0) / 10000.0
             |    AS within_ss,
             |  round(CAST(b.b AS DOUBLE) / 100000000.0 * 10000.0) / 10000.0
             |    AS between_ss,
             |  round((CAST(b.b AS DOUBLE) / CAST(nn.k - 1 AS DOUBLE))
             |    / (CAST(w.w AS DOUBLE)
             |      / CAST(CAST(nn.nt AS BIGINT) - nn.k AS DOUBLE))
             |    * 10000.0) / 10000.0 AS ch
             |FROM w CROSS JOIN b CROSS JOIN nn""".stripMargin)),

    // ---- Bhattacharyya coefficient + Hellinger distance between the
    // English / non-English document-length distributions over width-25
    // bins: BC = Σ√(c1·c2)/√(N1·N2) — the per-bin products stay exact
    // integers under the sqrt, so the only float fold is the ~20-term
    // bin sum. Completes the drift-metric family (KS q201, PSI q297,
    // JS q221, W1 q332) with the geometric overlap measure.
    Q("q341_bhattacharyya",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val b = t(s, d, "documents")
          .select(expr("n_chars div 25").as("bin"),
            (col("lang") === "en").as("g"))
          .groupBy("bin").agg(
            sum(when(col("g"), 1L).otherwise(0L)).as("c1"),
            sum(when(!col("g"), 1L).otherwise(0L)).as("c2"))
        b.agg(count(lit(1)).cast("long").as("n_bins"),
            sum(col("c1")).cast("long").as("n_en"),
            sum(col("c2")).cast("long").as("n_other"),
            sum(sqrt((col("c1").cast(dec) * col("c2").cast(dec))
              .cast("double"))).as("sq"))
          .select(col("n_bins"), col("n_en"), col("n_other"),
            (round(col("sq") / sqrt(col("n_en").cast("double")
              * col("n_other").cast("double")) * 1000000.0) / 1000000.0)
              .as("bc"),
            (round(sqrt(greatest(lit(1.0) - col("sq")
              / sqrt(col("n_en").cast("double")
                * col("n_other").cast("double")), lit(0.0))) * 1000000.0)
              / 1000000.0).as("hellinger"))
      },
      Some("""WITH b AS (SELECT n_chars // 25 AS bin,
             |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c1,
             |    sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS c2
             |  FROM documents GROUP BY 1),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
             |    CAST(sum(c1) AS BIGINT) AS n_en,
             |    CAST(sum(c2) AS BIGINT) AS n_other,
             |    sum(sqrt(CAST(CAST(c1 AS HUGEINT) * CAST(c2 AS HUGEINT)
             |      AS DOUBLE))) AS sq
             |  FROM b)
             |SELECT n_bins, n_en, n_other,
             |  round(sq / sqrt(CAST(n_en AS DOUBLE)
             |    * CAST(n_other AS DOUBLE)) * 1000000.0) / 1000000.0 AS bc,
             |  round(sqrt(greatest(1.0 - sq / sqrt(CAST(n_en AS DOUBLE)
             |    * CAST(n_other AS DOUBLE)), 0.0)) * 1000000.0) / 1000000.0
             |    AS hellinger
             |FROM a""".stripMargin)),

    // ---- Simpson's-paradox audit for the q330 association: per-segment
    // fulfillment rates under high vs low priority PLUS the pooled row,
    // with a flag marking strata whose treatment-effect sign disagrees
    // with the pooled sign — the aggregation-reversal check any metrics
    // pipeline should run before reporting a pooled lift. Rates are
    // exact integer ratios, one segment-key shuffle, pooled row unioned.
    Q("q342_simpsons_audit",
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_custkey"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("tr"),
          (col("o_orderstatus") === "F").as("yy"))
        val j = o.join(broadcast(t(s, d, "customer")
            .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        def rates(g: org.apache.spark.sql.RelationalGroupedDataset) = g.agg(
          sum(when(col("tr") && col("yy"), 1L).otherwise(0L)).as("a"),
          sum(when(col("tr"), 1L).otherwise(0L)).as("n1"),
          sum(when(!col("tr") && col("yy"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("tr"), 1L).otherwise(0L)).as("n0"))
        val st = rates(j.groupBy(col("c_mktsegment").as("stratum")))
        val pooled = rates(j.groupBy(lit("_POOLED_").as("stratum")))
        val all = st.unionAll(pooled)
        val rt = col("a").cast("double") / col("n1").cast("double")
        val rc = col("b").cast("double") / col("n0").cast("double")
        val sgn = signum(rt - rc)
        val psgn = signum(max(when(col("stratum") === "_POOLED_",
          rt - rc)).over(org.apache.spark.sql.expressions.Window
            .partitionBy()))
        all.select(col("stratum"), col("n1"), col("n0"),
            (round(rt * 1000000.0) / 1000000.0).as("rate_treat"),
            (round(rc * 1000000.0) / 1000000.0).as("rate_ctrl"),
            (round((rt - rc) * 1000000.0) / 1000000.0).as("diff"),
            (sgn =!= psgn).as("reversed"))
          .orderBy("stratum")
      },
      Some("""WITH o AS (SELECT c_mktsegment AS stratum,
             |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS tr,
             |    o_orderstatus = 'F' AS yy
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |st AS (SELECT stratum,
             |    CAST(sum(CASE WHEN tr AND yy THEN 1 ELSE 0 END) AS BIGINT)
             |      AS a,
             |    CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN NOT tr AND yy THEN 1 ELSE 0 END)
             |      AS BIGINT) AS b,
             |    CAST(sum(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n0
             |  FROM o GROUP BY 1
             |  UNION ALL
             |  SELECT '_POOLED_',
             |    CAST(sum(CASE WHEN tr AND yy THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN NOT tr AND yy THEN 1 ELSE 0 END)
             |      AS BIGINT),
             |    CAST(sum(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM o),
             |x AS (SELECT stratum, n1, n0,
             |    CAST(a AS DOUBLE) / CAST(n1 AS DOUBLE) AS rt,
             |    CAST(b AS DOUBLE) / CAST(n0 AS DOUBLE) AS rc FROM st),
             |p AS (SELECT max(CASE WHEN stratum = '_POOLED_'
             |    THEN rt - rc END) OVER () AS pd, x.* FROM x)
             |SELECT stratum, n1, n0,
             |  round(rt * 1000000.0) / 1000000.0 AS rate_treat,
             |  round(rc * 1000000.0) / 1000000.0 AS rate_ctrl,
             |  round((rt - rc) * 1000000.0) / 1000000.0 AS diff,
             |  sign(rt - rc) <> sign(pd) AS reversed
             |FROM p ORDER BY stratum""".stripMargin)),

    // ---- Log-rank test: does view→purchase conversion SPEED differ
    // between the even/odd user-id cohorts? The q231 duration table
    // split by cohort; at each event day the observed-vs-expected
    // cohort-1 events and the hypergeometric variance accumulate as
    // 1e-8-quantized exact integer sums (the q340 trick — per-term
    // round, then exact decimal fold), so the χ² is engine-
    // deterministic. All window work runs on the per-day cell table.
    Q("q343_log_rank",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ev = Tables.events(s, d)
        val entry = ev.groupBy("user_id").agg(
          min(when(col("event_type") === "view", col("ts"))).as("t0"),
          max(col("ts")).as("tmax"))
          .where(col("t0").isNotNull)
        val conv = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"))
          .join(entry.select("user_id", "t0"), "user_id")
          .where(col("ts") >= col("t0"))
          .groupBy("user_id").agg(min(col("ts")).as("tp"))
        val dayNs = 86400L * 1000000000L
        val du = entry.join(conv, Seq("user_id"), "left")
          .select(pmod(col("user_id"), lit(2L)).as("grp"),
            when(col("tp").isNotNull, expr(s"(tp - t0) div $dayNs"))
              .otherwise(expr(s"(tmax - t0) div $dayNs")).as("dur"),
            col("tp").isNotNull.cast("long").as("ev"))
        val cell = du.groupBy("dur").agg(
          sum(when(col("grp") === 0, col("ev")).otherwise(0L)).as("d1"),
          sum(when(col("grp") === 1, col("ev")).otherwise(0L)).as("d2"),
          sum(when(col("grp") === 0, 1L).otherwise(0L)).as("l1"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("l2"))
        val tot = cell.agg(sum(col("l1")).as("t1"), sum(col("l2")).as("t2"))
        val prior = org.apache.spark.sql.expressions.Window.orderBy("dur")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val risked = cell.join(broadcast(tot))
          .withColumn("n1j",
            col("t1") - coalesce(sum(col("l1")).over(prior), lit(0L)))
          .withColumn("n2j",
            col("t2") - coalesce(sum(col("l2")).over(prior), lit(0L)))
          .withColumn("dj", col("d1") + col("d2"))
          .withColumn("nj", col("n1j") + col("n2j"))
          .where(col("dj") > 0)
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val e1 = dd(col("dj")) * dd(col("n1j")) / dd(col("nj"))
        val vj = when(col("nj") > 1,
          dd(col("dj")) * dd(col("n1j")) * dd(col("n2j"))
            * (dd(col("nj")) - dd(col("dj")))
            / (dd(col("nj")) * dd(col("nj")) * (dd(col("nj")) - 1.0)))
          .otherwise(lit(0.0))
        val agg = risked.agg(
          count(lit(1)).cast("long").as("n_times"),
          max(col("t1")).cast("long").as("n_grp0"),
          max(col("t2")).cast("long").as("n_grp1"),
          sum(col("d1")).cast("long").as("o1"),
          sum(round(e1 * 100000000.0).cast(dec)).as("e8"),
          sum(round(vj * 100000000.0).cast(dec)).as("v8"))
        agg.select(col("n_grp0"), col("n_grp1"), col("n_times"), col("o1"),
          (round(col("e8").cast("double") / 100000000.0 * 10000.0)
            / 10000.0).as("e1"),
          (round(col("v8").cast("double") / 100000000.0 * 10000.0)
            / 10000.0).as("variance"),
          (round(pow(col("o1").cast("double")
              - col("e8").cast("double") / 100000000.0, 2.0)
            / (col("v8").cast("double") / 100000000.0) * 10000.0)
            / 10000.0).as("chi2"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns
             |  FROM events),
             |en AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN tns END) AS t0,
             |    max(tns) AS tmax
             |  FROM e GROUP BY user_id
             |  HAVING min(CASE WHEN event_type = 'view' THEN tns END)
             |    IS NOT NULL),
             |cv AS (SELECT e.user_id, min(tns) AS tp
             |  FROM e JOIN en USING (user_id)
             |  WHERE event_type = 'purchase' AND tns >= t0
             |  GROUP BY e.user_id),
             |du AS (SELECT en.user_id % 2 AS grp,
             |    CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400000000000
             |         ELSE (tmax - t0) // 86400000000000 END AS dur,
             |    CAST(tp IS NOT NULL AS BIGINT) AS ev
             |  FROM en LEFT JOIN cv USING (user_id)),
             |cl AS (SELECT dur,
             |    sum(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS d1,
             |    sum(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS d2,
             |    sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS l1,
             |    sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS l2
             |  FROM du GROUP BY dur),
             |tt AS (SELECT sum(l1) AS t1, sum(l2) AS t2 FROM cl),
             |rk AS (SELECT dur, d1, d2,
             |    t1 - coalesce(sum(l1) OVER (ORDER BY dur
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS n1j,
             |    t2 - coalesce(sum(l2) OVER (ORDER BY dur
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS n2j,
             |    t1, t2
             |  FROM cl CROSS JOIN tt),
             |fx AS (SELECT dur, d1, d1 + d2 AS dj, n1j, n2j,
             |    n1j + n2j AS nj, t1, t2 FROM rk WHERE d1 + d2 > 0),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_times,
             |    CAST(max(t1) AS BIGINT) AS n_grp0,
             |    CAST(max(t2) AS BIGINT) AS n_grp1,
             |    CAST(sum(d1) AS BIGINT) AS o1,
             |    sum(CAST(round(CAST(dj AS DOUBLE) * CAST(n1j AS DOUBLE)
             |      / CAST(nj AS DOUBLE) * 100000000.0) AS HUGEINT)) AS e8,
             |    sum(CAST(round(CASE WHEN nj > 1
             |      THEN CAST(dj AS DOUBLE) * CAST(n1j AS DOUBLE)
             |        * CAST(n2j AS DOUBLE)
             |        * (CAST(nj AS DOUBLE) - CAST(dj AS DOUBLE))
             |        / (CAST(nj AS DOUBLE) * CAST(nj AS DOUBLE)
             |          * (CAST(nj AS DOUBLE) - 1.0))
             |      ELSE 0.0 END * 100000000.0) AS HUGEINT)) AS v8
             |  FROM fx)
             |SELECT n_grp0, n_grp1, n_times, o1,
             |  round(CAST(e8 AS DOUBLE) / 100000000.0 * 10000.0) / 10000.0
             |    AS e1,
             |  round(CAST(v8 AS DOUBLE) / 100000000.0 * 10000.0) / 10000.0
             |    AS variance,
             |  round(pow(CAST(o1 AS DOUBLE)
             |      - CAST(e8 AS DOUBLE) / 100000000.0, 2.0)
             |    / (CAST(v8 AS DOUBLE) / 100000000.0) * 10000.0) / 10000.0
             |    AS chi2
             |FROM ag""".stripMargin)),

    // ---- Durbin–Watson serial-correlation statistic on the dense
    // daily event-count series: DW = Σ(Δc)²·n / (n·Σc² − S²) — the
    // mean-centered residual form reduces to FULLY exact integer
    // algebra (Δc cancels the mean; the denominator is the scaled
    // moment determinant), one double division at the end. Day-domain
    // window (q327 convention); one pass over the calendar-sized table.
    Q("q344_durbin_watson",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        val lagged = dense.withColumn("pc", lag(col("c"), 1).over(w))
        val agg = lagged.agg(
          count(lit(1)).cast(dec).as("n"),
          sum(col("c")).cast(dec).as("sc"),
          sum(col("c").cast(dec) * col("c").cast(dec)).as("qc"),
          sum(when(col("pc").isNotNull,
            (col("c") - col("pc")).cast(dec)
              * (col("c") - col("pc")).cast(dec)).otherwise(lit(0L)
              .cast(dec))).as("nd"))
        agg.select(col("n").cast("long").as("n_days"),
            (round((col("nd") * col("n")).cast("double")
              / (col("n") * col("qc") - col("sc") * col("sc"))
                .cast("double") * 1000000.0) / 1000000.0).as("dw"))
          .select(col("n_days"), col("dw"),
            (round((lit(1.0) - col("dw") / 2.0) * 1000000.0) / 1000000.0)
              .as("rho_approx"))
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |lg AS (SELECT c, lag(c) OVER (ORDER BY day) AS pc FROM dn),
             |ag AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(c) AS HUGEINT) AS sc,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS qc,
             |    sum(CASE WHEN pc IS NOT NULL
             |      THEN CAST(c - pc AS HUGEINT) * CAST(c - pc AS HUGEINT)
             |      ELSE CAST(0 AS HUGEINT) END) AS nd
             |  FROM lg),
             |r AS (SELECT CAST(n AS BIGINT) AS n_days,
             |    round(CAST(nd * n AS DOUBLE)
             |      / CAST(n * qc - sc * sc AS DOUBLE) * 1000000.0)
             |      / 1000000.0 AS dw
             |  FROM ag)
             |SELECT n_days, dw,
             |  round((1.0 - dw / 2.0) * 1000000.0) / 1000000.0
             |    AS rho_approx
             |FROM r""".stripMargin)),

    // ---- Cochran's Q: do THREE matched language-ID rules (tokens
    // 'the' / 'a' / 'of', q329's framing extended to k=3) have equal
    // accuracy on the same documents? Q = (k−1)(k·ΣGⱼ²−N²)/(k·ΣLᵢ−ΣLᵢ²)
    // — the identity form makes every sum an exact integer (per-doc
    // success counts), one division at the end. ONE conditional-sum
    // pass; df = k−1 = 2.
    Q("q345_cochran_q",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val toks = split(col("text"), " ")
        val lab = col("lang") === "en"
        def c(word: String) = when(array_contains(toks, word) === lab, 1L)
          .otherwise(0L)
        val base = t(s, d, "documents").select(c("the").as("c1"),
          c("a").as("c2"), c("of").as("c3"))
        val l = col("c1") + col("c2") + col("c3")
        val agg = base.agg(count(lit(1)).cast("long").as("n"),
          sum(col("c1")).cast(dec).as("g1"),
          sum(col("c2")).cast(dec).as("g2"),
          sum(col("c3")).cast(dec).as("g3"),
          sum(l.cast(dec)).as("sl"), sum(l.cast(dec) * l.cast(dec)).as("sl2"))
        agg.select(col("n"), col("g1").cast("long").as("g1"),
          col("g2").cast("long").as("g2"), col("g3").cast("long").as("g3"),
          (round((lit(2L).cast(dec) * (lit(3L).cast(dec)
              * (col("g1") * col("g1") + col("g2") * col("g2")
                + col("g3") * col("g3")) - col("sl") * col("sl")))
              .cast("double")
            / (lit(3L).cast(dec) * col("sl") - col("sl2")).cast("double")
            * 10000.0) / 10000.0).as("q_stat"))
      },
      Some("""WITH b AS (SELECT
             |    CASE WHEN list_contains(string_split(text, ' '), 'the')
             |      = (lang = 'en') THEN 1 ELSE 0 END AS c1,
             |    CASE WHEN list_contains(string_split(text, ' '), 'a')
             |      = (lang = 'en') THEN 1 ELSE 0 END AS c2,
             |    CASE WHEN list_contains(string_split(text, ' '), 'of')
             |      = (lang = 'en') THEN 1 ELSE 0 END AS c3
             |  FROM documents),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(c1) AS HUGEINT) AS g1,
             |    CAST(sum(c2) AS HUGEINT) AS g2,
             |    CAST(sum(c3) AS HUGEINT) AS g3,
             |    CAST(sum(c1 + c2 + c3) AS HUGEINT) AS sl,
             |    sum(CAST(c1 + c2 + c3 AS HUGEINT)
             |      * CAST(c1 + c2 + c3 AS HUGEINT)) AS sl2
             |  FROM b)
             |SELECT n, CAST(g1 AS BIGINT) AS g1, CAST(g2 AS BIGINT) AS g2,
             |  CAST(g3 AS BIGINT) AS g3,
             |  round(CAST(2 * (3 * (g1 * g1 + g2 * g2 + g3 * g3)
             |      - sl * sl) AS DOUBLE)
             |    / CAST(3 * sl - sl2 AS DOUBLE) * 10000.0) / 10000.0
             |    AS q_stat
             |FROM a""".stripMargin)),

    // ---- Weekly top-10 churn: rank parts by shipped quantity inside
    // each ship week, then Jaccard the top-10 sets of CONSECUTIVE weeks
    // — the "trending stability" monitor (how fast does the head of the
    // distribution turn over). Rank tables are week×10 rows, so the
    // consecutive-week overlap is an equi-join on (week+1, part) over
    // tiny sorted sets; quantities stay exact via cents-free integer
    // l_quantity sums; the only data-sized work is one (week, part)
    // aggregation of the fact scan.
    Q("q346_topk_churn",
      (s, d) => {
        val wk = expr(
          "CAST(datediff(l_shipdate, DATE '1970-01-01') AS BIGINT) div 7")
          .as("week")
        val wq = t(s, d, "lineitem")
          .groupBy(wk, col("l_partkey"))
          .agg(sum(col("l_quantity").cast("long")).as("q"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("week")
          .orderBy(col("q").desc, col("l_partkey"))
        val top = wq.withColumn("rk", row_number().over(w))
          .where(col("rk") <= 10)
          .select(col("week"), col("l_partkey"))
        val ov = top.select((col("week") + 1L).as("nweek"),
            col("l_partkey").as("pk"))
          .join(top, col("nweek") === col("week")
            && col("pk") === col("l_partkey"))
          .groupBy(col("week")).agg(count(lit(1)).as("overlap"))
        top.groupBy("week").agg(count(lit(1)).as("k"))
          .join(ov, Seq("week"), "left")
          .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
          .withColumn("prev_k",
            lag(col("k"), 1).over(org.apache.spark.sql.expressions.Window
              .orderBy("week")))
          .where(col("prev_k").isNotNull)
          .select(col("week"), col("overlap").cast("long").as("overlap"),
            (round(col("overlap").cast("double")
              / (col("prev_k") + col("k") - col("overlap")).cast("double")
              * 1000000.0) / 1000000.0).as("jaccard"))
          .orderBy("week")
      },
      Some("""WITH wq AS (SELECT
             |    date_diff('day', DATE '1970-01-01', l_shipdate) // 7
             |      AS week,
             |    l_partkey, sum(CAST(l_quantity AS BIGINT)) AS q
             |  FROM lineitem GROUP BY 1, 2),
             |tp AS (SELECT week, l_partkey FROM (SELECT week, l_partkey,
             |    row_number() OVER (PARTITION BY week
             |      ORDER BY q DESC, l_partkey) AS rk FROM wq)
             |  WHERE rk <= 10),
             |ov AS (SELECT b.week AS week, count(*) AS overlap
             |  FROM tp a JOIN tp b ON a.week + 1 = b.week
             |    AND a.l_partkey = b.l_partkey
             |  GROUP BY 1),
             |ks AS (SELECT week, count(*) AS k FROM tp GROUP BY 1),
             |j AS (SELECT ks.week, ks.k,
             |    coalesce(ov.overlap, 0) AS overlap,
             |    lag(ks.k) OVER (ORDER BY ks.week) AS prev_k
             |  FROM ks LEFT JOIN ov ON ks.week = ov.week)
             |SELECT week, CAST(overlap AS BIGINT) AS overlap,
             |  round(CAST(overlap AS DOUBLE)
             |    / CAST(prev_k + k - overlap AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS jaccard
             |FROM j WHERE prev_k IS NOT NULL ORDER BY week""".stripMargin)),

    // ---- 2-D skyline (Pareto frontier) of parts: minimize retail
    // price, maximize size. The sort-based O(n log n) formulation — one
    // row per PRICE LEVEL (groupBy max-size), a running strictly-before
    // max over the price order, keep levels that beat it, join back for
    // the member rows — replaces the naive NOT-EXISTS O(n²) self-join;
    // at scale the level table is price-cardinality-sized and the
    // running max is one window pass. Equal (price, size) twins are
    // mutually non-dominated and both kept, matching dominance
    // semantics (no strict coordinate).
    Q("q347_skyline",
      (s, d) => {
        val parts = t(s, d, "part")
          .select(col("p_partkey"), col("p_retailprice"),
            col("p_size").cast("long").as("p_size"))
        val lvl = parts.groupBy("p_retailprice")
          .agg(max(col("p_size")).as("msize"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("p_retailprice")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val keep = lvl.withColumn("before", max(col("msize")).over(w))
          .where(col("before").isNull || col("msize") > col("before"))
        parts.join(keep.select(col("p_retailprice"), col("msize")),
            Seq("p_retailprice"))
          .where(col("p_size") === col("msize"))
          .select(col("p_partkey"),
            round(col("p_retailprice") * 100.0).cast("long")
              .as("price_cents"),
            col("p_size"))
          .orderBy("p_partkey")
      },
      Some("""WITH p AS (SELECT p_partkey, p_retailprice,
             |    CAST(p_size AS BIGINT) AS p_size FROM part),
             |lvl AS (SELECT p_retailprice, max(p_size) AS msize
             |  FROM p GROUP BY 1),
             |keep AS (SELECT p_retailprice, msize FROM (
             |    SELECT p_retailprice, msize,
             |      max(msize) OVER (ORDER BY p_retailprice
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |        AS before
             |    FROM lvl)
             |  WHERE before IS NULL OR msize > before)
             |SELECT p_partkey,
             |  CAST(round(p_retailprice * 100.0) AS BIGINT) AS price_cents,
             |  p_size
             |FROM p JOIN keep USING (p_retailprice)
             |WHERE p_size = msize
             |ORDER BY p_partkey""".stripMargin)),

    // ---- Quantile normalization: re-express every NON-English doc's
    // length on the English length distribution (the batch-effect
    // transform applied feature-wise in omics/ML preprocessing), via
    // the EXACT nearest-rank map r ↦ ceil(r·N₁/N₂) — integer ceil-div,
    // no interpolation, so the mapping is a pure equi-join between the
    // two ranked tables. The global row_number is one range-partitioned
    // sort pass per side at scale; the rank join is key-to-key.
    Q("q348_quantile_norm",
      (s, d) => {
        val docs = t(s, d, "documents")
        val en = docs.where(col("lang") === "en")
          .select(col("n_chars").as("v"), col("doc_id"))
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy("v", "doc_id")))
          .drop("doc_id")
        val ne = docs.where(col("lang") =!= "en")
          .select(col("doc_id"), col("n_chars"))
          .withColumn("r2", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy("n_chars", "doc_id")))
        val n1 = en.agg(count(lit(1)).as("n1"))
        val n2 = ne.agg(count(lit(1)).as("n2"))
        ne.join(broadcast(n1)).join(broadcast(n2))
          .withColumn("mr", expr("(r2 * n1 + n2 - 1) div n2"))
          .join(en, col("mr") === col("r"))
          .select(col("doc_id"), col("n_chars").as("orig_chars"),
            col("v").as("mapped_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH en AS (SELECT n_chars AS v,
             |    row_number() OVER (ORDER BY n_chars, doc_id) AS r
             |  FROM documents WHERE lang = 'en'),
             |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM en),
             |ne AS (SELECT doc_id, n_chars,
             |    row_number() OVER (ORDER BY n_chars, doc_id) AS r2
             |  FROM documents WHERE lang <> 'en'),
             |n2 AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM ne),
             |mp AS (SELECT doc_id, n_chars,
             |    (r2 * n1 + n2 - 1) // n2 AS mr
             |  FROM ne CROSS JOIN n1 CROSS JOIN n2)
             |SELECT mp.doc_id, mp.n_chars AS orig_chars,
             |  en.v AS mapped_chars
             |FROM mp JOIN en ON mp.mr = en.r
             |ORDER BY doc_id""".stripMargin)),

    // ---- Diagonal-covariance Mahalanobis outliers on the (chars,
    // tokens) document plane: z² = (x−μx)²/s²x + (y−μy)²/s²y from ONE
    // exact decimal38 moment pass broadcast back into a scan-speed
    // per-row score — the multivariate generalization of q243's
    // z-score with no matrix inverse to drift. Top-10 by (score, id):
    // every score is one fixed IEEE chain from exact integer moments.
    Q("q349_mahalanobis_diag",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = t(s, d, "documents").select(col("doc_id"),
          col("n_chars").as("x"),
          size(split(col("text"), " ")).cast("long").as("y"))
        val m = base.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x")).cast(dec).as("sx"),
          sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
          sum(col("y")).cast(dec).as("sy"),
          sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val n = dd(col("n"))
        val mx = dd(col("sx")) / n
        val my = dd(col("sy")) / n
        val vx = (dd(col("sxx")) - dd(col("sx")) * dd(col("sx")) / n) /
          (n - 1.0)
        val vy = (dd(col("syy")) - dd(col("sy")) * dd(col("sy")) / n) /
          (n - 1.0)
        val score = (dd(col("x")) - mx) * (dd(col("x")) - mx) / vx +
          (dd(col("y")) - my) * (dd(col("y")) - my) / vy
        base.join(broadcast(m))
          .select(col("doc_id"), col("x"), col("y"), score.as("sc"))
          .orderBy(col("sc").desc, col("doc_id")).limit(10)
          .select(col("doc_id"), col("x").as("n_chars"),
            col("y").as("n_tokens"),
            (round(col("sc") * 1000000.0) / 1000000.0).as("z2"))
      },
      Some("""WITH b AS (SELECT doc_id, n_chars AS x,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS y
             |  FROM documents),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(x) AS HUGEINT) AS sx,
             |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             |    CAST(sum(y) AS HUGEINT) AS sy,
             |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
             |  FROM b),
             |sc AS (SELECT doc_id, x, y,
             |    (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             |      * (CAST(x AS DOUBLE)
             |        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             |      / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
             |        * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             |        / (CAST(n AS DOUBLE) - 1.0))
             |    + (CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |      * (CAST(y AS DOUBLE)
             |        - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |      / ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
             |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |        / (CAST(n AS DOUBLE) - 1.0)) AS sc
             |  FROM b CROSS JOIN m)
             |SELECT doc_id, x AS n_chars, y AS n_tokens,
             |  round(sc * 1000000.0) / 1000000.0 AS z2
             |FROM (SELECT * FROM sc ORDER BY sc DESC, doc_id LIMIT 10)
             |ORDER BY sc DESC, doc_id""".stripMargin)),

    // ---- Page–Hinkley change-point alarm on the dense daily series,
    // in the FULLY-EXACT scaled form: Mₜ·n = n·cumₜ − t·S is an
    // integer, so PHₜ = Mₜ − min_{s≤t}Mₛ and its argmax day are
    // engine-deterministic with no double accumulating anywhere; the
    // alarm compares the descaled peak against 6·sd (also from exact
    // moments). Day-domain windows over the calendar-sized table.
    Q("q350_page_hinkley",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d)).localCheckpoint()
        val tot = dense.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("c")).cast(dec).as("s"),
          sum(col("c").cast(dec) * col("c").cast(dec)).as("q"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val m = dense.join(broadcast(tot))
          .withColumn("t", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy("day")))
          .withColumn("cum", sum(col("c")).over(w))
          .withColumn("mm", col("cum").cast(dec) * col("n")
            - col("t").cast(dec) * col("s"))
          .withColumn("ph", col("mm") - min(col("mm")).over(w))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val sd = sqrt((dd(col("n")) * dd(col("q"))
          - dd(col("s")) * dd(col("s")))
          / (dd(col("n")) * (dd(col("n")) - 1.0)))
        m.orderBy(col("ph").desc, col("day")).limit(1)
          .select(col("n").cast("long").as("n_days"), col("day")
              .as("day_at_max"),
            (round(dd(col("ph")) / dd(col("n")) * 10000.0) / 10000.0)
              .as("ph_max"),
            (round(lit(6.0) * sd * 10000.0) / 10000.0).as("threshold"),
            (dd(col("ph")) / dd(col("n")) > lit(6.0) * sd).as("alarm"))
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |bd AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day
             |    FROM bd) gs
             |  LEFT JOIN c USING (day)),
             |tt AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(c) AS HUGEINT) AS s,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS q
             |  FROM dn),
             |mm AS (SELECT day, n, s, q,
             |    CAST(sum(c) OVER w AS HUGEINT) * n
             |      - CAST(row_number() OVER w AS HUGEINT) * s AS m
             |  FROM dn CROSS JOIN tt
             |  WINDOW w AS (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |ph AS (SELECT day, n, s, q,
             |    m - min(m) OVER (ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
             |  FROM mm),
             |top AS (SELECT * FROM ph ORDER BY ph DESC, day LIMIT 1)
             |SELECT CAST(n AS BIGINT) AS n_days, day AS day_at_max,
             |  round(CAST(ph AS DOUBLE) / CAST(n AS DOUBLE) * 10000.0)
             |    / 10000.0 AS ph_max,
             |  round(6.0 * sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
             |    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             |    * 10000.0) / 10000.0 AS threshold,
             |  CAST(ph AS DOUBLE) / CAST(n AS DOUBLE)
             |    > 6.0 * sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
             |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             |    AS alarm
             |FROM top""".stripMargin)),

    // ---- Empirical semivariogram of the daily event-count series:
    // γ(k) = Σ(c_{t+k}−c_t)² / (2·pairs) for k = 1..7 — the geostat
    // companion to q203's ACF (distance-weighted dispersion instead of
    // correlation), same lag-join recipe over the dense series:
    // calendar-sized tables, exact integer numerators, one division.
    Q("q351_semivariogram",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d)).localCheckpoint()
        val lagged = dense
          .select(col("day"), col("c"),
            explode(sequence(lit(1), lit(7))).as("lag"))
          .join(dense.select(col("day").as("bday"), col("c").as("cb")),
            col("bday") === col("day") + col("lag"))
        lagged.groupBy("lag").agg(
            count(lit(1)).cast("long").as("n_pairs"),
            sum((col("cb") - col("c")).cast(dec)
              * (col("cb") - col("c")).cast(dec)).as("ss"))
          .select(col("lag").cast("long").as("lag"), col("n_pairs"),
            (round(col("ss").cast("double")
              / (lit(2.0) * col("n_pairs").cast("double")) * 10000.0)
              / 10000.0).as("gamma"))
          .orderBy("lag")
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |lg AS (SELECT l.lag, a.c AS c, bb.c AS cb
             |  FROM dn a CROSS JOIN (SELECT unnest(generate_series(1, 7))
             |    AS lag) l
             |  JOIN dn bb ON bb.day = a.day + l.lag)
             |SELECT CAST(lag AS BIGINT) AS lag,
             |  CAST(count(*) AS BIGINT) AS n_pairs,
             |  round(CAST(sum(CAST(cb - c AS HUGEINT)
             |    * CAST(cb - c AS HUGEINT)) AS DOUBLE)
             |    / (2.0 * CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0
             |    AS gamma
             |FROM lg GROUP BY lag ORDER BY lag""".stripMargin)),

    // ---- Friedman rank test for a weekday effect: each complete week
    // is a block, its 7 daily counts ranked WITH average-rank ties kept
    // exact in 2× units (avg2 = 2·rank + ties − 1), so the rank sums
    // and χ²F = 3·ΣRⱼ2²/(56n) − 24n are pure integer algebra until one
    // division — the nonparametric ANOVA that q277's F-test
    // parametrically assumes away. Calendar-sized tables throughout.
    Q("q352_friedman_weekday",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d))
          .select(expr("day div 7").as("week"),
            pmod(col("day"), lit(7L)).as("weekday"), col("c"))
        val full = dense.groupBy("week").agg(count(lit(1)).as("nd"))
          .where(col("nd") === 7).select("week")
        val wk = org.apache.spark.sql.expressions.Window
          .partitionBy("week").orderBy("c")
        val ties = org.apache.spark.sql.expressions.Window
          .partitionBy("week", "c")
        val ranked = dense.join(broadcast(full), "week")
          .withColumn("avg2",
            lit(2L) * rank().over(wk) + count(lit(1)).over(ties) - 1L)
        val rj = ranked.groupBy("weekday").agg(
          count(lit(1)).cast("long").as("n_weeks"),
          sum(col("avg2")).cast(dec).as("r2"))
        val stat = rj.agg(max(col("n_weeks")).cast(dec).as("n"),
            sum(col("r2") * col("r2")).as("sq"))
          .select((round((lit(3L).cast(dec) * col("sq")).cast("double")
            / (lit(56L).cast(dec) * col("n")).cast("double")
            * 10000.0) / 10000.0
            - round(lit(24.0) * col("n").cast("double") * 10000.0)
              / 10000.0).as("chi2_f"))
        rj.join(broadcast(stat))
          .select(col("weekday"), col("n_weeks"),
            (round(col("r2").cast("double")
              / (lit(2.0) * col("n_weeks").cast("double")) * 10000.0)
              / 10000.0).as("mean_rank"),
            (round(col("chi2_f") * 10000.0) / 10000.0).as("chi2_f"))
          .orderBy("weekday")
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |wd AS (SELECT day // 7 AS week, day % 7 AS weekday, c FROM dn),
             |full_w AS (SELECT week FROM wd GROUP BY week
             |  HAVING count(*) = 7),
             |rk AS (SELECT weekday,
             |    2 * rank() OVER (PARTITION BY wd.week ORDER BY c)
             |      + count(*) OVER (PARTITION BY wd.week, c) - 1 AS avg2
             |  FROM wd JOIN full_w ON wd.week = full_w.week),
             |rj AS (SELECT weekday, CAST(count(*) AS BIGINT) AS n_weeks,
             |    CAST(sum(avg2) AS HUGEINT) AS r2
             |  FROM rk GROUP BY weekday),
             |st AS (SELECT CAST(max(n_weeks) AS HUGEINT) AS n,
             |    sum(r2 * r2) AS sq FROM rj)
             |SELECT CAST(weekday AS BIGINT) AS weekday, n_weeks,
             |  round(CAST(r2 AS DOUBLE) / (2.0 * CAST(n_weeks AS DOUBLE))
             |    * 10000.0) / 10000.0 AS mean_rank,
             |  round((round(CAST(3 * sq AS DOUBLE) / CAST(56 * n AS DOUBLE)
             |      * 10000.0) / 10000.0
             |    - round(24.0 * CAST(n AS DOUBLE) * 10000.0) / 10000.0)
             |    * 10000.0) / 10000.0 AS chi2_f
             |FROM rj CROSS JOIN st ORDER BY weekday""".stripMargin)),

    // ---- Burrows' Delta stylometric distance between sources: the
    // top-20 corpus terms' per-source relative frequencies, 1e-9-
    // quantized (exact long), z-scored against the across-source
    // mean/sd from exact integer moments, then Δ(a,b) = mean|z_a−z_b|
    // over the marker terms for every source pair — the classic
    // authorship-attribution measure as a pure source²-sized fold (the
    // corpus pass is one term count; all downstream tables are
    // vocabulary- or source-bounded).
    Q("q353_burrows_delta",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val toks = t(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("term"))
        val top = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term")).limit(20)
          .select("term")
        val srcTot = toks.groupBy("source").agg(count(lit(1)).as("tot"))
        val st = toks.join(broadcast(top), "term")
          .groupBy("source", "term").agg(count(lit(1)).as("a"))
        val grid = srcTot.crossJoin(broadcast(top))
          .join(st, Seq("source", "term"), "left")
          .select(col("source"), col("term"),
            round(coalesce(col("a"), lit(0L)).cast("double")
              / col("tot").cast("double") * 1000000000.0).cast("long")
              .as("fq"))
        val mom = grid.groupBy("term").agg(
          count(lit(1)).cast(dec).as("ns"),
          sum(col("fq")).cast(dec).as("sf"),
          sum(col("fq").cast(dec) * col("fq").cast(dec)).as("qf"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val z = grid.join(broadcast(mom), "term")
          .where(col("ns") * col("qf") - col("sf") * col("sf") > 0)
          .select(col("source"), col("term"),
            ((dd(col("fq")) - dd(col("sf")) / dd(col("ns")))
              / sqrt((dd(col("ns")) * dd(col("qf"))
                - dd(col("sf")) * dd(col("sf")))
                / (dd(col("ns")) * (dd(col("ns")) - 1.0)))).as("z"))
        z.select(col("source").as("src_a"), col("term"), col("z").as("za"))
          .join(z.select(col("source").as("src_b"), col("term").as("tb"),
            col("z").as("zb")),
            col("term") === col("tb") && col("src_a") < col("src_b"))
          .groupBy("src_a", "src_b")
          .agg(count(lit(1)).as("m"), sum(abs(col("za") - col("zb")))
            .as("sd"))
          .select(col("src_a"), col("src_b"),
            (round(col("sd") / col("m").cast("double") * 10000.0)
              / 10000.0).as("delta"))
          .orderBy("src_a", "src_b")
      },
      Some("""WITH tk AS (SELECT source,
             |    unnest(string_split(text, ' ')) AS term FROM documents),
             |top AS (SELECT term FROM (SELECT term, count(*) AS cnt
             |    FROM tk GROUP BY term ORDER BY cnt DESC, term LIMIT 20)),
             |tot AS (SELECT source, count(*) AS tot FROM tk GROUP BY 1),
             |st AS (SELECT source, term, count(*) AS a
             |  FROM tk JOIN top USING (term) GROUP BY 1, 2),
             |grid AS (SELECT tot.source, top.term,
             |    CAST(round(CAST(coalesce(st.a, 0) AS DOUBLE)
             |      / CAST(tot.tot AS DOUBLE) * 1000000000.0) AS BIGINT)
             |      AS fq
             |  FROM tot CROSS JOIN top
             |  LEFT JOIN st ON st.source = tot.source
             |    AND st.term = top.term),
             |mom AS (SELECT term, CAST(count(*) AS HUGEINT) AS ns,
             |    CAST(sum(fq) AS HUGEINT) AS sf,
             |    sum(CAST(fq AS HUGEINT) * CAST(fq AS HUGEINT)) AS qf
             |  FROM grid GROUP BY term),
             |z AS (SELECT source, grid.term,
             |    (CAST(fq AS DOUBLE)
             |      - CAST(sf AS DOUBLE) / CAST(ns AS DOUBLE))
             |      / sqrt((CAST(ns AS DOUBLE) * CAST(qf AS DOUBLE)
             |        - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE))
             |        / (CAST(ns AS DOUBLE) * (CAST(ns AS DOUBLE) - 1.0)))
             |      AS z
             |  FROM grid JOIN mom ON grid.term = mom.term
             |  WHERE ns * qf - sf * sf > 0)
             |SELECT a.source AS src_a, b.source AS src_b,
             |  round(sum(abs(a.z - b.z)) / CAST(count(*) AS DOUBLE)
             |    * 10000.0) / 10000.0 AS delta
             |FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
             |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin)),

    // ---- Partial correlation: price↔quantity with the discount
    // channel partialled out, r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)
    // (1−r_yz²)) — the "is the raw correlation just the promo?"
    // control. All three pairwise r's come from ONE exact decimal38
    // moment pass over cents-quantized columns; every double is a fixed
    // chain from exact integers.
    Q("q354_partial_corr",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = t(s, d, "lineitem").select(
          round(col("l_extendedprice") * 100.0).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"),
          round(col("l_discount") * 100.0).cast("long").as("z"))
        def dc(c: org.apache.spark.sql.Column) = c.cast(dec)
        val m = base.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
          sum(col("z")).cast(dec).as("sz"),
          sum(dc(col("x")) * dc(col("x"))).as("sxx"),
          sum(dc(col("y")) * dc(col("y"))).as("syy"),
          sum(dc(col("z")) * dc(col("z"))).as("szz"),
          sum(dc(col("x")) * dc(col("y"))).as("sxy"),
          sum(dc(col("x")) * dc(col("z"))).as("sxz"),
          sum(dc(col("y")) * dc(col("z"))).as("syz"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        def r(sab: String, sa: String, sb: String, saa: String,
            sbb: String) =
          (dd(col("n")) * dd(col(sab)) - dd(col(sa)) * dd(col(sb))) /
            sqrt((dd(col("n")) * dd(col(saa)) - dd(col(sa)) * dd(col(sa)))
              * (dd(col("n")) * dd(col(sbb)) - dd(col(sb)) * dd(col(sb))))
        val rxy = r("sxy", "sx", "sy", "sxx", "syy")
        val rxz = r("sxz", "sx", "sz", "sxx", "szz")
        val ryz = r("syz", "sy", "sz", "syy", "szz")
        m.select(col("n").cast("long").as("n"),
          (round(rxy * 1000000.0) / 1000000.0).as("r_xy"),
          (round(rxz * 1000000.0) / 1000000.0).as("r_xz"),
          (round(ryz * 1000000.0) / 1000000.0).as("r_yz"),
          (round((rxy - rxz * ryz)
            / sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))
            * 1000000.0) / 1000000.0).as("r_partial"))
      },
      Some("""WITH b AS (SELECT
             |    CAST(round(l_extendedprice * 100.0) AS BIGINT) AS x,
             |    CAST(l_quantity AS BIGINT) AS y,
             |    CAST(round(l_discount * 100.0) AS BIGINT) AS z
             |  FROM lineitem),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(x) AS HUGEINT) AS sx,
             |    CAST(sum(y) AS HUGEINT) AS sy,
             |    CAST(sum(z) AS HUGEINT) AS sz,
             |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
             |    sum(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS szz,
             |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
             |    sum(CAST(x AS HUGEINT) * CAST(z AS HUGEINT)) AS sxz,
             |    sum(CAST(y AS HUGEINT) * CAST(z AS HUGEINT)) AS syz
             |  FROM b),
             |r AS (SELECT CAST(n AS BIGINT) AS n,
             |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
             |    (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
             |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |        * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
             |        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
             |    (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
             |      - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
             |      / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
             |        * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
             |        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz
             |  FROM m)
             |SELECT n,
             |  round(rxy * 1000000.0) / 1000000.0 AS r_xy,
             |  round(rxz * 1000000.0) / 1000000.0 AS r_xz,
             |  round(ryz * 1000000.0) / 1000000.0 AS r_yz,
             |  round((rxy - rxz * ryz)
             |    / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
             |    * 1000000.0) / 1000000.0 AS r_partial
             |FROM r""".stripMargin)),

    // ---- Tokenizer-vocabulary planning curve: corpus coverage of the
    // top-⌈V·p/10⌉ terms for each decile p — "how big must the vocab be
    // to cover X% of tokens", the sizing curve behind q124's fixed-
    // vocab coverage. One term count, then rank/cumsum windows over the
    // vocabulary-sized table; coverage ratios divide exact integers.
    Q("q355_vocab_curve",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val tc = t(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("term"))
        val ranked = tc.select(col("cnt"),
          row_number().over(w).as("rn"),
          sum(col("cnt")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            .cast(dec).as("cum"))
        val tot = ranked.agg(max(col("rn")).cast("long").as("v"),
          sum(col("cnt")).cast(dec).as("t"))
        ranked.join(broadcast(tot))
          .join(broadcast(s.range(1, 11).select(col("id").as("decile"))),
            col("rn") === expr("(v * decile + 9) div 10"))
          .select(col("decile"), col("rn").cast("long").as("vocab_size"),
            (round(col("cum").cast("double") / col("t").cast("double")
              * 1000000.0) / 1000000.0).as("coverage"))
          .orderBy("decile")
      },
      Some("""WITH tc AS (SELECT term, count(*) AS cnt FROM (
             |    SELECT unnest(string_split(text, ' ')) AS term
             |    FROM documents) GROUP BY term),
             |rk AS (SELECT cnt,
             |    row_number() OVER (ORDER BY cnt DESC, term) AS rn,
             |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS HUGEINT) AS cum
             |  FROM tc),
             |tt AS (SELECT CAST(max(rn) AS BIGINT) AS v,
             |    CAST(sum(cnt) AS HUGEINT) AS t FROM rk),
             |dc AS (SELECT unnest(generate_series(1, 10)) AS decile)
             |SELECT CAST(decile AS BIGINT) AS decile,
             |  CAST(rn AS BIGINT) AS vocab_size,
             |  round(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS coverage
             |FROM rk CROSS JOIN tt JOIN dc
             |  ON rn = (v * decile + 9) // 10
             |ORDER BY decile""".stripMargin)),

    // ---- Weekly growth accounting: every active user classified as
    // new / retained / resurrected from their PREVIOUS active week (one
    // lag over the user-week table), churn from last week's actives
    // minus this week's retained, and the quick ratio
    // (new+resurrected)/churned — the standard MAU decomposition. Two
    // key-partitioned shuffles (user, then week); all ratios divide
    // exact counts.
    Q("q356_growth_accounting",
      (s, d) => {
        val wkNs = 604800L * Tables.NanosPerSecond
        val uw = Tables.events(s, d)
          .select(col("user_id"), expr(s"ts div $wkNs").as("week"))
          .distinct()
        val wu = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("week")
        val flagged = uw.withColumn("prev", lag(col("week"), 1).over(wu))
          .select(col("week"),
            when(col("prev").isNull, 1L).otherwise(0L).as("is_new"),
            when(col("prev") === col("week") - 1, 1L).otherwise(0L)
              .as("is_ret"),
            when(col("prev").isNotNull && col("prev") < col("week") - 1, 1L)
              .otherwise(0L).as("is_res"))
        val weekly = flagged.groupBy("week").agg(
          count(lit(1)).as("active"), sum(col("is_new")).as("new_users"),
          sum(col("is_ret")).as("retained"),
          sum(col("is_res")).as("resurrected"))
        val ww = org.apache.spark.sql.expressions.Window.orderBy("week")
        weekly.withColumn("prev_active",
            lag(col("active"), 1).over(ww))
          .where(col("prev_active").isNotNull)
          .select(col("week"), col("active").cast("long").as("active"),
            col("new_users").cast("long").as("new_users"),
            col("retained").cast("long").as("retained"),
            col("resurrected").cast("long").as("resurrected"),
            (col("prev_active") - col("retained")).cast("long")
              .as("churned"),
            when(col("prev_active") - col("retained") > 0,
              round((col("new_users") + col("resurrected")).cast("double")
                / (col("prev_active") - col("retained")).cast("double")
                * 10000.0) / 10000.0).as("quick_ratio"))
          .orderBy("week")
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
             |    epoch_ns(ts) // 604800000000000 AS week FROM events),
             |fl AS (SELECT week,
             |    CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS is_new,
             |    CASE WHEN prev = week - 1 THEN 1 ELSE 0 END AS is_ret,
             |    CASE WHEN prev IS NOT NULL AND prev < week - 1
             |      THEN 1 ELSE 0 END AS is_res
             |  FROM (SELECT user_id, week,
             |      lag(week) OVER (PARTITION BY user_id ORDER BY week)
             |        AS prev
             |    FROM uw)),
             |wk AS (SELECT week, count(*) AS active,
             |    sum(is_new) AS new_users, sum(is_ret) AS retained,
             |    sum(is_res) AS resurrected
             |  FROM fl GROUP BY week),
             |lg AS (SELECT wk.*, lag(active) OVER (ORDER BY week)
             |    AS prev_active FROM wk)
             |SELECT week, CAST(active AS BIGINT) AS active,
             |  CAST(new_users AS BIGINT) AS new_users,
             |  CAST(retained AS BIGINT) AS retained,
             |  CAST(resurrected AS BIGINT) AS resurrected,
             |  CAST(prev_active - retained AS BIGINT) AS churned,
             |  CASE WHEN prev_active - retained > 0 THEN
             |    round(CAST(new_users + resurrected AS DOUBLE)
             |      / CAST(prev_active - retained AS DOUBLE) * 10000.0)
             |      / 10000.0 END AS quick_ratio
             |FROM lg WHERE prev_active IS NOT NULL
             |ORDER BY week""".stripMargin)),

    // ---- Trailing 7-day rolling MEDIAN of the daily count series —
    // the outlier-robust smoother (vs q259's EWMA): each full frame's
    // sorted 7-list yields the exact middle element, so every output is
    // an integer and the engines cannot drift on interpolation
    // conventions (both sides build the sorted frame list explicitly).
    // Day-domain window over the calendar-sized dense series.
    Q("q357_rolling_median",
      (s, d) => {
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
          .rowsBetween(-6, 0)
        dense.withColumn("arr", collect_list(col("c")).over(w))
          .where(size(col("arr")) === 7)
          .select(col("day"), col("c"),
            element_at(array_sort(col("arr")), 4).as("med7"))
          .orderBy("day")
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |fr AS (SELECT day, c, list(c) OVER (ORDER BY day
             |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS arr
             |  FROM dn)
             |SELECT day, c, list_sort(arr)[4] AS med7
             |FROM fr WHERE len(arr) = 7 ORDER BY day""".stripMargin)),

    // ---- L-moments of the order-price distribution (Hosking 1990):
    // L-scale, L-skewness τ₃, L-kurtosis τ₄ from the probability-
    // weighted moments b₀..b₃ — the outlier-robust alternative to
    // q326's classical moment profile. The rank-weighted sums
    // Σ(i−1)…(i−k)·x are EXACT decimal38 integers over cents (tied
    // values get permutation-invariant weight sums), so every ratio is
    // one fixed double chain. Global rank = one range-partitioned sort
    // pass at scale.
    Q("q358_l_moments",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ranked = t(s, d, "orders")
          .select(round(col("o_totalprice") * 100.0).cast("long").as("x"),
            col("o_orderkey"))
          .withColumn("i", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy("x", "o_orderkey")).cast("long"))
        val m = ranked.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x")).cast(dec).as("s0"),
          sum((col("i") - 1L).cast(dec) * col("x").cast(dec)).as("s1"),
          sum((col("i") - 1L).cast(dec) * (col("i") - 2L).cast(dec)
            * col("x").cast(dec)).as("s2"),
          sum((col("i") - 1L).cast(dec) * (col("i") - 2L).cast(dec)
            * (col("i") - 3L).cast(dec) * col("x").cast(dec)).as("s3"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val n = dd(col("n"))
        val b0 = dd(col("s0")) / n
        val b1 = dd(col("s1")) / (n * (n - 1.0))
        val b2 = dd(col("s2")) / (n * (n - 1.0) * (n - 2.0))
        val b3 = dd(col("s3")) / (n * (n - 1.0) * (n - 2.0) * (n - 3.0))
        val l2 = lit(2.0) * b1 - b0
        val l3 = lit(6.0) * b2 - lit(6.0) * b1 + b0
        val l4 = lit(20.0) * b3 - lit(30.0) * b2 + lit(12.0) * b1 - b0
        m.select(col("n").cast("long").as("n"),
          (round(b0 / 100.0 * 10000.0) / 10000.0).as("l1"),
          (round(l2 / 100.0 * 10000.0) / 10000.0).as("l2"),
          (round(l3 / l2 * 1000000.0) / 1000000.0).as("t3"),
          (round(l4 / l2 * 1000000.0) / 1000000.0).as("t4"))
      },
      Some("""WITH rk AS (SELECT
             |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS x,
             |    CAST(row_number() OVER (ORDER BY
             |      CAST(round(o_totalprice * 100.0) AS BIGINT), o_orderkey)
             |      AS BIGINT) AS i
             |  FROM orders),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(x) AS HUGEINT) AS s0,
             |    sum(CAST(i - 1 AS HUGEINT) * CAST(x AS HUGEINT)) AS s1,
             |    sum(CAST(i - 1 AS HUGEINT) * CAST(i - 2 AS HUGEINT)
             |      * CAST(x AS HUGEINT)) AS s2,
             |    sum(CAST(i - 1 AS HUGEINT) * CAST(i - 2 AS HUGEINT)
             |      * CAST(i - 3 AS HUGEINT) * CAST(x AS HUGEINT)) AS s3
             |  FROM rk),
             |bb AS (SELECT CAST(n AS BIGINT) AS n,
             |    CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE) AS b0,
             |    CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE)
             |      * (CAST(n AS DOUBLE) - 1.0)) AS b1,
             |    CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE)
             |      * (CAST(n AS DOUBLE) - 1.0)
             |      * (CAST(n AS DOUBLE) - 2.0)) AS b2,
             |    CAST(s3 AS DOUBLE) / (CAST(n AS DOUBLE)
             |      * (CAST(n AS DOUBLE) - 1.0) * (CAST(n AS DOUBLE) - 2.0)
             |      * (CAST(n AS DOUBLE) - 3.0)) AS b3
             |  FROM m)
             |SELECT n,
             |  round(b0 / 100.0 * 10000.0) / 10000.0 AS l1,
             |  round((2.0 * b1 - b0) / 100.0 * 10000.0) / 10000.0 AS l2,
             |  round((6.0 * b2 - 6.0 * b1 + b0) / (2.0 * b1 - b0)
             |    * 1000000.0) / 1000000.0 AS t3,
             |  round((20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0)
             |    / (2.0 * b1 - b0) * 1000000.0) / 1000000.0 AS t4
             |FROM bb""".stripMargin)),

    // ---- Spike-day detection: strict local maxima of the dense daily
    // series that clear the mean — lag/lead windows plus one exact moment
    // fold broadcast back, the alerting primitive behind q210/q350's
    // drift detectors. The threshold comparison is a fixed double chain
    // from exact integers, identical on both engines.
    Q("q359_peak_days",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d)).localCheckpoint()
        val tot = dense.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("c")).cast(dec).as("s"),
          sum(col("c").cast(dec) * col("c").cast(dec)).as("q"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val mu = dd(col("s")) / dd(col("n"))
        val sd = sqrt((dd(col("n")) * dd(col("q"))
          - dd(col("s")) * dd(col("s")))
          / (dd(col("n")) * (dd(col("n")) - 1.0)))
        dense.withColumn("pc", lag(col("c"), 1).over(w))
          .withColumn("nc", lead(col("c"), 1).over(w))
          .join(broadcast(tot))
          .where(col("pc").isNotNull && col("nc").isNotNull
            && col("c") > col("pc") && col("c") > col("nc")
            && dd(col("c")) > mu)
          .select(col("day"), col("c"),
            (round((dd(col("c")) - mu) / sd * 10000.0) / 10000.0).as("z"))
          .orderBy("day")
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |tt AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(c) AS HUGEINT) AS s,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS q
             |  FROM dn),
             |lg AS (SELECT day, c, lag(c) OVER (ORDER BY day) AS pc,
             |    lead(c) OVER (ORDER BY day) AS nc FROM dn)
             |SELECT day, c,
             |  round((CAST(c AS DOUBLE)
             |    - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |    / sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
             |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             |    * 10000.0) / 10000.0 AS z
             |FROM lg CROSS JOIN tt
             |WHERE pc IS NOT NULL AND nc IS NOT NULL AND c > pc AND c > nc
             |  AND CAST(c AS DOUBLE) > CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             |ORDER BY day""".stripMargin)),

    // ---- Ship-latency SLA percentiles per priority: NEAREST-RANK
    // (type-1) p50/p90/p99 — rank equality against ⌈n·p/100⌉ instead of
    // an interpolating quantile, so every output is an exact integer
    // day count and no interpolation convention can drift between
    // engines — plus the ≤60-day attainment rate. One fact shuffle on
    // the join key, one priority-partitioned rank window.
    Q("q360_latency_percentiles",
      (s, d) => {
        val lat = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority").as("priority"),
            datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
              .as("lat"),
            col("l_orderkey"), col("l_linenumber"))
        val wg = org.apache.spark.sql.expressions.Window
          .partitionBy("priority")
          .orderBy(col("lat"), col("l_orderkey"), col("l_linenumber"))
        val ranked = lat.withColumn("rn", row_number().over(wg).cast("long"))
        val base = ranked.groupBy("priority").agg(
          count(lit(1)).as("n"),
          sum(when(col("lat") <= 60, 1L).otherwise(0L)).as("w60"))
        val sel = ranked.join(base, "priority")
          .select(col("priority"), col("lat"), col("rn"), col("n"))
          .where(col("rn") === expr("(n * 50 + 99) div 100")
            || col("rn") === expr("(n * 90 + 99) div 100")
            || col("rn") === expr("(n * 99 + 99) div 100"))
          .groupBy("priority").agg(
            min(when(col("rn") === expr("(n * 50 + 99) div 100"),
              col("lat"))).as("p50"),
            min(when(col("rn") === expr("(n * 90 + 99) div 100"),
              col("lat"))).as("p90"),
            min(when(col("rn") === expr("(n * 99 + 99) div 100"),
              col("lat"))).as("p99"))
        base.join(sel, "priority")
          .select(col("priority"), col("n").cast("long").as("n"),
            col("p50"), col("p90"), col("p99"),
            (round(col("w60").cast("double") / col("n").cast("double")
              * 1000000.0) / 1000000.0).as("pct_within_60"))
          .orderBy("priority")
      },
      Some("""WITH lat AS (SELECT o_orderpriority AS priority,
             |    CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)
             |      AS lat, l_orderkey, l_linenumber
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |rk AS (SELECT priority, lat,
             |    CAST(row_number() OVER (PARTITION BY priority
             |      ORDER BY lat, l_orderkey, l_linenumber) AS BIGINT) AS rn
             |  FROM lat),
             |bs AS (SELECT priority, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN lat <= 60 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS w60
             |  FROM lat GROUP BY 1),
             |sel AS (SELECT rk.priority,
             |    min(CASE WHEN rn = (n * 50 + 99) // 100 THEN lat END)
             |      AS p50,
             |    min(CASE WHEN rn = (n * 90 + 99) // 100 THEN lat END)
             |      AS p90,
             |    min(CASE WHEN rn = (n * 99 + 99) // 100 THEN lat END)
             |      AS p99
             |  FROM rk JOIN bs ON rk.priority = bs.priority
             |  GROUP BY 1)
             |SELECT bs.priority AS priority, n, p50, p90, p99,
             |  round(CAST(w60 AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS pct_within_60
             |FROM bs JOIN sel ON bs.priority = sel.priority
             |ORDER BY bs.priority""".stripMargin)),

    // ---- Grubbs' max-outlier test on order prices: G = max|x−μ|/σ.
    // The argmax is selected on the EXACT integer |x·n − S| (the
    // n-scaled deviation — same ordering as |x−μ| with no double
    // compare), tiebroken by orderkey; G itself is one fixed chain from
    // exact moments. One moment fold broadcast into a scan + top-1.
    Q("q361_grubbs_test",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = t(s, d, "orders").select(col("o_orderkey"),
          round(col("o_totalprice") * 100.0).cast("long").as("x"))
        val m = base.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x")).cast(dec).as("s"),
          sum(col("x").cast(dec) * col("x").cast(dec)).as("q"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val dev = abs(col("x").cast(dec) * col("n") - col("s"))
        val sd = sqrt((dd(col("n")) * dd(col("q"))
          - dd(col("s")) * dd(col("s")))
          / (dd(col("n")) * (dd(col("n")) - 1.0)))
        base.join(broadcast(m))
          .withColumn("dev", dev)
          .orderBy(col("dev").desc, col("o_orderkey")).limit(1)
          .select(col("n").cast("long").as("n"), col("o_orderkey"),
            col("x").as("price_cents"),
            (round(dd(col("dev")) / dd(col("n")) / sd * 10000.0)
              / 10000.0).as("g"))
      },
      Some("""WITH b AS (SELECT o_orderkey,
             |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS x
             |  FROM orders),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(x) AS HUGEINT) AS s,
             |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q
             |  FROM b),
             |dv AS (SELECT o_orderkey, x, n, s, q,
             |    abs(CAST(x AS HUGEINT) * n - s) AS dev
             |  FROM b CROSS JOIN m),
             |top AS (SELECT * FROM dv ORDER BY dev DESC, o_orderkey
             |  LIMIT 1)
             |SELECT CAST(n AS BIGINT) AS n, o_orderkey,
             |  x AS price_cents,
             |  round(CAST(dev AS DOUBLE) / CAST(n AS DOUBLE)
             |    / sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
             |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             |    * 10000.0) / 10000.0 AS g
             |FROM top""".stripMargin)),

    // ---- Per-source lexical entropy and Pielou equitability: H_s =
    // −Σp·ln p over each source's term distribution, normalized by
    // ln V_s — the "how repetitive is this source" curation signal at
    // the TERM level (q220 is per-doc chars). Per-term p = a/T divides
    // exact integers; the per-source fold is vocabulary-bounded and
    // 4-dp rounded.
    Q("q362_source_term_entropy",
      (s, d) => {
        val tk = t(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("term"))
        val st = tk.groupBy("source", "term").agg(count(lit(1)).as("a"))
        val tot = st.groupBy("source").agg(sum(col("a")).as("tt"),
          count(lit(1)).as("v"))
        st.join(broadcast(tot), "source")
          .groupBy("source").agg(
            max(col("tt")).cast("long").as("n_tokens"),
            max(col("v")).cast("long").as("n_terms"),
            sum(-(col("a").cast("double") / col("tt").cast("double"))
              * log(col("a").cast("double") / col("tt").cast("double")))
              .as("h"))
          .select(col("source"), col("n_tokens"), col("n_terms"),
            (round(col("h") * 10000.0) / 10000.0).as("entropy"),
            (round(col("h") / log(col("n_terms").cast("double"))
              * 10000.0) / 10000.0).as("equitability"))
          .orderBy("source")
      },
      Some("""WITH tk AS (SELECT source,
             |    unnest(string_split(text, ' ')) AS term FROM documents),
             |st AS (SELECT source, term, count(*) AS a
             |  FROM tk GROUP BY 1, 2),
             |tot AS (SELECT source, sum(a) AS tt, count(*) AS v
             |  FROM st GROUP BY 1)
             |SELECT st.source AS source,
             |  CAST(max(tt) AS BIGINT) AS n_tokens,
             |  CAST(max(v) AS BIGINT) AS n_terms,
             |  round(sum(-(CAST(a AS DOUBLE) / CAST(tt AS DOUBLE))
             |    * ln(CAST(a AS DOUBLE) / CAST(tt AS DOUBLE))) * 10000.0)
             |    / 10000.0 AS entropy,
             |  round(sum(-(CAST(a AS DOUBLE) / CAST(tt AS DOUBLE))
             |    * ln(CAST(a AS DOUBLE) / CAST(tt AS DOUBLE)))
             |    / ln(CAST(max(v) AS DOUBLE)) * 10000.0) / 10000.0
             |    AS equitability
             |FROM st JOIN tot ON st.source = tot.source
             |GROUP BY st.source ORDER BY st.source""".stripMargin)),

    // ---- MinHash-LSH banding planner GROUNDED on the corpus's own
    // duplicate pairs: for each k=128 banding (b bands × r rows), the
    // S-curve threshold (1/b)^(1/r) and the detection probability
    // 1−(1−s^r)^b evaluated at every OBSERVED ≥0.5-Jaccard pair (q22's
    // exact pair list) — "which banding would catch the dups this
    // corpus actually has". All powers are 2ᵏ, so s^r and (·)^b are
    // pure squaring chains and the threshold is a sqrt chain — bit-
    // identical across engines; the pair list is computed once and
    // reused by all four plan folds.
    Q("q363_lsh_planner",
      (s, d) => {
        val pairs = Dedup
          .shingleJaccardPairs(t(s, d, "documents"), 0.5)
          .localCheckpoint()
        def powChain(c: org.apache.spark.sql.Column, e: Int)
            : org.apache.spark.sql.Column =
          if (e == 1) c else { val h = powChain(c, e / 2); h * h }
        def sqrtChain(c: org.apache.spark.sql.Column, m: Int)
            : org.apache.spark.sql.Column =
          if (m == 0) c else sqrtChain(sqrt(c), m - 1)
        val plans = Seq((64, 2, 1), (32, 4, 2), (16, 8, 3), (8, 16, 4))
        plans.map { case (b, r, m) =>
          val p = lit(1.0) - powChain(lit(1.0)
            - powChain(col("jaccard"), r), b)
          pairs.agg(count(lit(1)).cast("long").as("n_pairs"),
              sum(p).as("sp"), min(p).as("mp"))
            .select(lit(b.toLong).as("bands"),
              lit(r.toLong).as("rows_per_band"),
              (round(sqrtChain(lit(1.0 / b), m) * 1000000.0) / 1000000.0)
                .as("threshold"),
              col("n_pairs"),
              (round(col("sp") / col("n_pairs").cast("double") * 10000.0)
                / 10000.0).as("mean_detect"),
              (round(col("mp") * 10000.0) / 10000.0).as("min_detect"))
        }.reduce(_ unionAll _).orderBy("rows_per_band")
      },
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |     for i in range(1, len(w) - 1)])) AS s
             |  FROM ws WHERE len(w) >= 3),
             |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |pairs AS (SELECT
             |    round((i::DOUBLE / (ca.n + cb.n - i)) * 1000000.0)
             |      / 1000000.0 AS s
             |  FROM inter JOIN cnt ca ON ca.doc_id = ia
             |    JOIN cnt cb ON cb.doc_id = ib
             |  WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5),
             |px AS (SELECT s, s * s AS s2, s2 * s2 AS s4, s4 * s4 AS s8,
             |    s8 * s8 AS s16 FROM pairs),
             |p1 AS (SELECT 1.0 - s2 AS u, u * u AS u2, u2 * u2 AS u4,
             |    u4 * u4 AS u8, u8 * u8 AS u16, u16 * u16 AS u32,
             |    1.0 - u32 * u32 AS p FROM px),
             |p2 AS (SELECT 1.0 - s4 AS u, u * u AS u2, u2 * u2 AS u4,
             |    u4 * u4 AS u8, u8 * u8 AS u16, 1.0 - u16 * u16 AS p
             |  FROM px),
             |p3 AS (SELECT 1.0 - s8 AS u, u * u AS u2, u2 * u2 AS u4,
             |    u4 * u4 AS u8, 1.0 - u8 * u8 AS p FROM px),
             |p4 AS (SELECT 1.0 - s16 AS u, u * u AS u2, u2 * u2 AS u4,
             |    1.0 - u4 * u4 AS p FROM px)
             |SELECT * FROM (
             |  SELECT CAST(64 AS BIGINT) AS bands,
             |    CAST(2 AS BIGINT) AS rows_per_band,
             |    round(sqrt(1.0 / 64.0) * 1000000.0) / 1000000.0
             |      AS threshold,
             |    CAST(count(*) AS BIGINT) AS n_pairs,
             |    round(sum(p) / CAST(count(*) AS DOUBLE) * 10000.0)
             |      / 10000.0 AS mean_detect,
             |    round(min(p) * 10000.0) / 10000.0 AS min_detect
             |  FROM p1
             |  UNION ALL
             |  SELECT CAST(32 AS BIGINT), CAST(4 AS BIGINT),
             |    round(sqrt(sqrt(1.0 / 32.0)) * 1000000.0) / 1000000.0,
             |    CAST(count(*) AS BIGINT),
             |    round(sum(p) / CAST(count(*) AS DOUBLE) * 10000.0)
             |      / 10000.0,
             |    round(min(p) * 10000.0) / 10000.0
             |  FROM p2
             |  UNION ALL
             |  SELECT CAST(16 AS BIGINT), CAST(8 AS BIGINT),
             |    round(sqrt(sqrt(sqrt(1.0 / 16.0))) * 1000000.0)
             |      / 1000000.0,
             |    CAST(count(*) AS BIGINT),
             |    round(sum(p) / CAST(count(*) AS DOUBLE) * 10000.0)
             |      / 10000.0,
             |    round(min(p) * 10000.0) / 10000.0
             |  FROM p3
             |  UNION ALL
             |  SELECT CAST(8 AS BIGINT), CAST(16 AS BIGINT),
             |    round(sqrt(sqrt(sqrt(sqrt(1.0 / 8.0)))) * 1000000.0)
             |      / 1000000.0,
             |    CAST(count(*) AS BIGINT),
             |    round(sum(p) / CAST(count(*) AS DOUBLE) * 10000.0)
             |      / 10000.0,
             |    round(min(p) * 10000.0) / 10000.0
             |  FROM p4)
             |ORDER BY rows_per_band""".stripMargin)),

    // ---- Shard-skew audit of 16-way rendezvous sharding (q261's
    // portable-hash assignment): per-shard counts vs uniform, with the
    // exact-integer uniformity χ² = (k·Σc² − N²)/N, max/mean skew, and
    // the coefficient of variation — the placement-quality report a
    // 1000-executor write path needs before committing to a shard fn.
    // One shard-key shuffle; the audit fold is k-row sized.
    Q("q364_shard_skew",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val g = t(s, d, "documents")
          .select(graft.operators.Layout.rendezvousShard(col("doc_id"), 16)
            .as("shard"))
          .groupBy("shard").agg(count(lit(1)).as("c"))
        val full = s.range(16).select(col("id").as("shard"))
          .join(g, Seq("shard"), "left")
          .select(coalesce(col("c"), lit(0L)).as("c"))
        val a = full.agg(sum(col("c")).cast(dec).as("n"),
          max(col("c")).cast("long").as("mx"),
          min(col("c")).cast("long").as("mn"),
          sum(col("c").cast(dec) * col("c").cast(dec)).as("q"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        a.select(col("n").cast("long").as("n_docs"),
          lit(16L).as("n_shards"), col("mx").as("max_shard"),
          col("mn").as("min_shard"),
          (round(dd(col("mx")) * 16.0 / dd(col("n")) * 10000.0) / 10000.0)
            .as("skew"),
          (round(sqrt((lit(16.0) * dd(col("q")) - dd(col("n"))
              * dd(col("n"))) / (16.0 * 15.0)) * 16.0 / dd(col("n"))
            * 10000.0) / 10000.0).as("cv"),
          (round((lit(16.0) * dd(col("q")) - dd(col("n")) * dd(col("n")))
            / dd(col("n")) * 10000.0) / 10000.0).as("chi2"))
      },
      Some("""WITH h AS (SELECT doc_id, sh.s AS s,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
             |      || CAST(sh.s AS VARCHAR)), 1, 15)) AS BIGINT) AS h
             |  FROM documents CROSS JOIN (SELECT unnest(range(0, 16)) AS s)
             |    sh),
             |a AS (SELECT doc_id, arg_max(s, h) AS shard FROM h
             |  GROUP BY doc_id),
             |g AS (SELECT shard, count(*) AS c FROM a GROUP BY 1),
             |fu AS (SELECT coalesce(g.c, 0) AS c
             |  FROM (SELECT unnest(range(0, 16)) AS shard) r
             |  LEFT JOIN g ON r.shard = g.shard),
             |ag AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
             |    CAST(max(c) AS BIGINT) AS mx, CAST(min(c) AS BIGINT) AS mn,
             |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS q
             |  FROM fu)
             |SELECT CAST(n AS BIGINT) AS n_docs,
             |  CAST(16 AS BIGINT) AS n_shards, mx AS max_shard,
             |  mn AS min_shard,
             |  round(CAST(mx AS DOUBLE) * 16.0 / CAST(n AS DOUBLE)
             |    * 10000.0) / 10000.0 AS skew,
             |  round(sqrt((16.0 * CAST(q AS DOUBLE) - CAST(n AS DOUBLE)
             |    * CAST(n AS DOUBLE)) / (16.0 * 15.0)) * 16.0
             |    / CAST(n AS DOUBLE) * 10000.0) / 10000.0 AS cv,
             |  round((16.0 * CAST(q AS DOUBLE) - CAST(n AS DOUBLE)
             |    * CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) * 10000.0)
             |    / 10000.0 AS chi2
             |FROM ag""".stripMargin)),

    // ---- Compaction bin-packing plan: next-fit by byte budget — each
    // doc lands in bin = exclusive-prefix-bytes div 20000, the
    // streaming chunker (q60's token recipe applied to FILE layout
    // planning). The engine side is TrainingPrep.packBins — the q89
    // two-phase distributed prefix sum (range partition + broadcast
    // exclusive offsets), NEVER a one-partition global window; the
    // per-bin report is bin-count-sized. Everything is exact integer
    // arithmetic, and every oracle output column is pinned to BIGINT
    // (DuckDB's sum/'//' otherwise widen to HUGEINT, whose
    // pandas conversion is stack-version-dependent).
    Q("q365_bin_packing",
      (s, d) => graft.operators.TrainingPrep
        .packBins(t(s, d, "documents"), binBytes = 20000L),
      Some("""WITH pre AS (SELECT doc_id, n_chars,
             |    CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS pre
             |  FROM documents),
             |b AS (SELECT doc_id, n_chars,
             |    CAST(pre // 20000 AS BIGINT) AS bin FROM pre)
             |SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
             |  CAST(sum(n_chars) AS BIGINT) AS bytes,
             |  CAST(min(doc_id) AS BIGINT) AS first_doc,
             |  CAST(max(doc_id) AS BIGINT) AS last_doc
             |FROM b GROUP BY bin ORDER BY bin""".stripMargin)),

    // ---- Matthews correlation coefficient (plus precision/recall/F1)
    // for the 'the'-token language-ID rule — the single-number
    // confusion summary that stays honest under class imbalance, the
    // companion to q183's PR curve / q186's AUC. Counts are exact
    // decimal38 (the four-factor product under the sqrt would overflow
    // a long at corpus scale); one conditional-sum pass.
    Q("q366_mcc",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val pred = array_contains(split(col("text"), " "), "the")
        val lab = col("lang") === "en"
        val m = t(s, d, "documents").agg(
          sum(when(pred && lab, 1L).otherwise(0L)).cast(dec).as("tp"),
          sum(when(pred && !lab, 1L).otherwise(0L)).cast(dec).as("fp"),
          sum(when(!pred && !lab, 1L).otherwise(0L)).cast(dec).as("tn"),
          sum(when(!pred && lab, 1L).otherwise(0L)).cast(dec).as("fn"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val prec = dd(col("tp")) / dd(col("tp") + col("fp"))
        val rec = dd(col("tp")) / dd(col("tp") + col("fn"))
        m.select(col("tp").cast("long").as("tp"),
          col("fp").cast("long").as("fp"),
          col("tn").cast("long").as("tn"),
          col("fn").cast("long").as("fn"),
          (round(prec * 1000000.0) / 1000000.0).as("precision"),
          (round(rec * 1000000.0) / 1000000.0).as("recall"),
          (round(lit(2.0) * prec * rec / (prec + rec) * 1000000.0)
            / 1000000.0).as("f1"),
          (round(dd(col("tp") * col("tn") - col("fp") * col("fn"))
            / sqrt(dd(col("tp") + col("fp")) * dd(col("tp") + col("fn"))
              * dd(col("tn") + col("fp")) * dd(col("tn") + col("fn")))
            * 1000000.0) / 1000000.0).as("mcc"))
      },
      Some("""WITH m AS (SELECT
             |    CAST(sum(CASE WHEN list_contains(string_split(text, ' '),
             |      'the') AND lang = 'en' THEN 1 ELSE 0 END) AS HUGEINT)
             |      AS tp,
             |    CAST(sum(CASE WHEN list_contains(string_split(text, ' '),
             |      'the') AND lang <> 'en' THEN 1 ELSE 0 END) AS HUGEINT)
             |      AS fp,
             |    CAST(sum(CASE WHEN NOT list_contains(string_split(text,
             |      ' '), 'the') AND lang <> 'en' THEN 1 ELSE 0 END)
             |      AS HUGEINT) AS tn,
             |    CAST(sum(CASE WHEN NOT list_contains(string_split(text,
             |      ' '), 'the') AND lang = 'en' THEN 1 ELSE 0 END)
             |      AS HUGEINT) AS fn
             |  FROM documents)
             |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             |  CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
             |  round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS precision,
             |  round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS recall,
             |  round(2.0 * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
             |    * (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
             |    / ((CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
             |      + (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS f1,
             |  round(CAST(tp * tn - fp * fn AS DOUBLE)
             |    / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
             |      * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE))
             |    * 1000000.0) / 1000000.0 AS mcc
             |FROM m""".stripMargin)),

    // ---- Murphy decomposition of the Brier score (reliability −
    // resolution + uncertainty) for the stopword-ratio-as-probability
    // forecast of English: forecasts are 1-dp bins (integer tenths), so
    // the Brier sum and every per-bin term numerator are EXACT integers
    // — the ≤11-bin folds are the only doubles. The calibration-
    // diagnosis companion to q178's reliability table.
    Q("q367_brier_decomposition",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = t(s, d, "documents").select(
          round(TextAnalysis.stopwordRatio(col("text")) * 10.0)
            .cast("long").as("pt"),
          (col("lang") === "en").cast("long").as("o"))
        val tot = base.agg(count(lit(1)).cast(dec).as("nn"),
          sum(col("o")).cast(dec).as("ss"),
          sum((col("pt") - col("o") * 10L).cast(dec)
            * (col("pt") - col("o") * 10L).cast(dec)).as("bsum"))
        val bins = base.groupBy("pt").agg(count(lit(1)).cast(dec).as("nb"),
          sum(col("o")).cast(dec).as("sb"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val relT = dd((col("pt").cast(dec) * col("nb") - lit(10L).cast(dec)
          * col("sb")) * (col("pt").cast(dec) * col("nb")
          - lit(10L).cast(dec) * col("sb"))) / (lit(100.0) * dd(col("nb")))
        val resT = dd((col("sb") * col("nn") - col("ss") * col("nb"))
          * (col("sb") * col("nn") - col("ss") * col("nb"))) /
          (dd(col("nb")) * dd(col("nn")) * dd(col("nn")))
        val f = bins.join(broadcast(tot))
          .agg(max(col("nn")).as("nn"), max(col("ss")).as("ss"),
            max(col("bsum")).as("bsum"),
            sum(relT).as("rel_raw"), sum(resT).as("res_raw"))
        val obar = dd(col("ss")) / dd(col("nn"))
        f.select(col("nn").cast("long").as("n"),
          (round(dd(col("bsum")) / (lit(100.0) * dd(col("nn")))
            * 1000000.0) / 1000000.0).as("brier"),
          (round(col("rel_raw") / dd(col("nn")) * 1000000.0) / 1000000.0)
            .as("reliability"),
          (round(col("res_raw") / dd(col("nn")) * 1000000.0) / 1000000.0)
            .as("resolution"),
          (round(obar * (lit(1.0) - obar) * 1000000.0) / 1000000.0)
            .as("uncertainty"))
      },
      Some(s"""WITH b AS (SELECT
              |    CAST(round((CAST(len(list_filter(string_split(text, ' '),
              |      x -> x IN ($EnList))) AS BIGINT)::DOUBLE
              |      / len(string_split(text, ' '))) * 10.0) AS BIGINT)
              |      AS pt,
              |    CAST(lang = 'en' AS BIGINT) AS o
              |  FROM documents),
              |tt AS (SELECT CAST(count(*) AS HUGEINT) AS nn,
              |    CAST(sum(o) AS HUGEINT) AS ss,
              |    sum(CAST(pt - 10 * o AS HUGEINT)
              |      * CAST(pt - 10 * o AS HUGEINT)) AS bsum
              |  FROM b),
              |bins AS (SELECT pt, CAST(count(*) AS HUGEINT) AS nb,
              |    CAST(sum(o) AS HUGEINT) AS sb
              |  FROM b GROUP BY pt),
              |f AS (SELECT max(nn) AS nn, max(ss) AS ss,
              |    max(bsum) AS bsum,
              |    sum(CAST((pt * nb - 10 * sb) * (pt * nb - 10 * sb)
              |      AS DOUBLE) / (100.0 * CAST(nb AS DOUBLE))) AS rel_raw,
              |    sum(CAST((sb * nn - ss * nb) * (sb * nn - ss * nb)
              |      AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(nn AS DOUBLE)
              |      * CAST(nn AS DOUBLE))) AS res_raw
              |  FROM bins CROSS JOIN tt)
              |SELECT CAST(nn AS BIGINT) AS n,
              |  round(CAST(bsum AS DOUBLE) / (100.0 * CAST(nn AS DOUBLE))
              |    * 1000000.0) / 1000000.0 AS brier,
              |  round(rel_raw / CAST(nn AS DOUBLE) * 1000000.0) / 1000000.0
              |    AS reliability,
              |  round(res_raw / CAST(nn AS DOUBLE) * 1000000.0) / 1000000.0
              |    AS resolution,
              |  round((CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
              |    * (1.0 - CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
              |    * 1000000.0) / 1000000.0 AS uncertainty
              |FROM f""".stripMargin)),

    // ---- Hill tail-index estimator over the top-100 order prices:
    // α̂ = k / Σln(x_i/x_{k+1}) — the heavy-tail diagnostic that
    // complements q179 (Zipf slope) and q317 (Gumbel maxima). Each
    // ln runs on an exact integer and is 1e-8-quantized BEFORE the
    // exact decimal fold (the q340 trick), so the k-term sum cannot
    // drift; one global top-(k+1) rank pass.
    Q("q368_hill_tail_index",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ranked = t(s, d, "orders")
          .select(round(col("o_totalprice") * 100.0).cast("long").as("x"),
            col("o_orderkey"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("x").desc, col("o_orderkey"))))
        val ref = ranked.where(col("rn") === 101)
          .select(col("x").as("xref"))
        val top = ranked.where(col("rn") <= 100)
          .join(broadcast(ref))
          .agg(count(lit(1)).cast("long").as("k"),
            max(col("xref")).as("xref"),
            sum(round(log(col("x").cast("double")) * 100000000.0)
              .cast(dec)).as("tsum"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        top.select(col("k"), col("xref").as("xref_cents"),
          (round(dd(col("k"))
            / ((dd(col("tsum")) - dd(col("k"))
              * round(log(dd(col("xref"))) * 100000000.0))
              / 100000000.0) * 10000.0) / 10000.0).as("alpha"))
      },
      Some("""WITH rk AS (SELECT
             |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS x,
             |    row_number() OVER (ORDER BY
             |      CAST(round(o_totalprice * 100.0) AS BIGINT) DESC,
             |      o_orderkey) AS rn
             |  FROM orders),
             |rf AS (SELECT x AS xref FROM rk WHERE rn = 101),
             |tp AS (SELECT CAST(count(*) AS BIGINT) AS k,
             |    max(xref) AS xref,
             |    sum(CAST(round(ln(CAST(x AS DOUBLE)) * 100000000.0)
             |      AS HUGEINT)) AS tsum
             |  FROM rk CROSS JOIN rf WHERE rn <= 100)
             |SELECT k, xref AS xref_cents,
             |  round(CAST(k AS DOUBLE)
             |    / ((CAST(tsum AS DOUBLE) - CAST(k AS DOUBLE)
             |      * round(ln(CAST(xref AS DOUBLE)) * 100000000.0))
             |      / 100000000.0) * 10000.0) / 10000.0 AS alpha
             |FROM tp""".stripMargin)),

    // ---- Offline optimal single changepoint by binary segmentation:
    // the split day maximizing the two-segment SSE reduction, via the
    // identity argmax G(t) = cum_t²/t + (S−cum_t)²/(n−t) over exact
    // prefix sums — the retrospective complement to the sequential
    // CUSUM (q210) / Page–Hinkley (q350) monitors. Every candidate's
    // G is one fixed chain from exact integers; argmax tiebreaks on
    // day. One prefix-sum window over the calendar-sized series.
    Q("q369_binary_segmentation",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d)).localCheckpoint()
        val tot = dense.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("c")).cast(dec).as("s"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val cand = dense.join(broadcast(tot))
          .withColumn("t", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy("day"))
            .cast("long"))
          .withColumn("cum", sum(col("c")).over(w).cast(dec))
          .where(col("t") < col("n").cast("long"))
          .withColumn("g", dd(col("cum")) * dd(col("cum")) / dd(col("t"))
            + dd(col("s") - col("cum")) * dd(col("s") - col("cum"))
              / (dd(col("n")) - dd(col("t"))))
        cand.orderBy(col("g").desc, col("day")).limit(1)
          .select(col("day").as("split_day"),
            col("t").as("n_left"),
            (col("n").cast("long") - col("t")).as("n_right"),
            (round((col("g") - dd(col("s")) * dd(col("s")) / dd(col("n")))
              * 10000.0) / 10000.0).as("gain"))
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |tt AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(c) AS HUGEINT) AS s FROM dn),
             |pf AS (SELECT day,
             |    CAST(row_number() OVER w AS BIGINT) AS t,
             |    CAST(sum(c) OVER w AS HUGEINT) AS cum, n, s
             |  FROM dn CROSS JOIN tt
             |  WINDOW w AS (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |cd AS (SELECT day, t, n, s,
             |    CAST(cum AS DOUBLE) * CAST(cum AS DOUBLE)
             |      / CAST(t AS DOUBLE)
             |    + CAST(s - cum AS DOUBLE) * CAST(s - cum AS DOUBLE)
             |      / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)) AS g
             |  FROM pf WHERE t < CAST(n AS BIGINT)),
             |top AS (SELECT * FROM cd ORDER BY g DESC, day LIMIT 1)
             |SELECT day AS split_day, t AS n_left,
             |  CAST(n AS BIGINT) - t AS n_right,
             |  round((g - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |    / CAST(n AS DOUBLE)) * 10000.0) / 10000.0 AS gain
             |FROM top""".stripMargin)),

    // ---- Expected / maximum calibration error for the q367 stopword-
    // ratio forecast: ECE = Σ|pt·n_b − 10·s_b| / (10N) keeps the
    // per-bin gap an EXACT integer (1-dp forecasts), so the whole ECE
    // is one division; MCE is the max per-bin gap ratio. The two
    // headline calibration scalars a model card reports next to q367's
    // decomposition.
    Q("q370_calibration_error",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = t(s, d, "documents").select(
          round(TextAnalysis.stopwordRatio(col("text")) * 10.0)
            .cast("long").as("pt"),
          (col("lang") === "en").cast("long").as("o"))
        val bins = base.groupBy("pt").agg(count(lit(1)).as("nb"),
          sum(col("o")).as("sb"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val gap = abs(col("pt").cast(dec) * col("nb").cast(dec)
          - lit(10L).cast(dec) * col("sb").cast(dec))
        bins.agg(sum(col("nb")).cast("long").as("n"),
            count(lit(1)).cast("long").as("n_bins"),
            sum(gap).as("esum"),
            max(dd(gap) / (lit(10.0) * dd(col("nb")))).as("mce_raw"))
          .select(col("n"), col("n_bins"),
            (round(dd(col("esum")) / (lit(10.0) * dd(col("n")))
              * 1000000.0) / 1000000.0).as("ece"),
            (round(col("mce_raw") * 1000000.0) / 1000000.0).as("mce"))
      },
      Some(s"""WITH b AS (SELECT
              |    CAST(round((CAST(len(list_filter(string_split(text, ' '),
              |      x -> x IN ($EnList))) AS BIGINT)::DOUBLE
              |      / len(string_split(text, ' '))) * 10.0) AS BIGINT)
              |      AS pt,
              |    CAST(lang = 'en' AS BIGINT) AS o
              |  FROM documents),
              |bins AS (SELECT pt, count(*) AS nb, sum(o) AS sb
              |  FROM b GROUP BY pt)
              |SELECT CAST(sum(nb) AS BIGINT) AS n,
              |  CAST(count(*) AS BIGINT) AS n_bins,
              |  round(CAST(sum(abs(CAST(pt AS HUGEINT) * CAST(nb AS HUGEINT)
              |    - 10 * CAST(sb AS HUGEINT))) AS DOUBLE)
              |    / (10.0 * CAST(sum(nb) AS DOUBLE)) * 1000000.0)
              |    / 1000000.0 AS ece,
              |  round(max(CAST(abs(CAST(pt AS HUGEINT) * CAST(nb AS HUGEINT)
              |    - 10 * CAST(sb AS HUGEINT)) AS DOUBLE)
              |    / (10.0 * CAST(nb AS DOUBLE))) * 1000000.0) / 1000000.0
              |    AS mce
              |FROM bins""".stripMargin)),

    // ---- word2vec-style negative-sampling table: unigram counts
    // raised to the 0.75 power (1e-6-quantized per term so the fold is
    // an exact decimal sum), then NEXT-FIT bucketed into 16 equal-mass
    // shards by exclusive cumulative weight — the distributed
    // construction of the sampling table a skip-gram trainer (q278's
    // consumer) draws negatives from. One vocabulary-sized rank window.
    Q("q371_negative_sampling",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val tc = t(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .select(col("term"), col("cnt"),
            round(exp(lit(0.75) * log(col("cnt").cast("double")))
              * 1000000.0).cast("long").as("w"))
        val wnd = org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("term"))
        val ranked = tc
          .withColumn("pre", coalesce(sum(col("w")).over(
            wnd.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              -1)), lit(0L)).cast(dec))
        val tot = tc.agg(sum(col("w")).cast(dec).as("tw"))
        ranked.join(broadcast(tot))
          .withColumn("bucket", expr("(pre * 16) div tw"))
          .groupBy("bucket").agg(count(lit(1)).cast("long").as("n_terms"),
            sum(col("w")).cast("long").as("mass"),
            max(col("tw")).as("tw"))
          .select(col("bucket"), col("n_terms"),
            (round(col("mass").cast("double") / col("tw").cast("double")
              * 1000000.0) / 1000000.0).as("share"))
          .orderBy("bucket")
      },
      Some("""WITH tc AS (SELECT term, count(*) AS cnt,
             |    CAST(round(exp(0.75 * ln(CAST(count(*) AS DOUBLE)))
             |      * 1000000.0) AS BIGINT) AS w
             |  FROM (SELECT unnest(string_split(text, ' ')) AS term
             |    FROM documents) GROUP BY term),
             |rk AS (SELECT term, cnt, w,
             |    CAST(coalesce(sum(w) OVER (ORDER BY cnt DESC, term
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS HUGEINT) AS pre
             |  FROM tc),
             |tt AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM tc),
             |bk AS (SELECT (pre * 16) // tw AS bucket, w, tw
             |  FROM rk CROSS JOIN tt)
             |SELECT CAST(bucket AS BIGINT) AS bucket,
             |  CAST(count(*) AS BIGINT) AS n_terms,
             |  round(CAST(sum(w) AS DOUBLE) / CAST(max(tw) AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS share
             |FROM bk GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // ---- Permutation test for the A/B difference in per-user event
    // counts, with 100 DETERMINISTIC portable-hash relabelings (md5 —
    // the q328 recapture trick) instead of RNG permutations: every
    // permuted |mean₁−mean₀| is a fixed chain from exact conditional
    // sums, so the null distribution and the p-value (1+#{≥obs})/101
    // are engine-identical. One user fold, then a 100-way explode over
    // the USER table (not the event table) — resampling cost scales
    // with users, not events.
    Q("q372_permutation_test",
      (s, d) => {
        val ux = Tables.events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("x")).localCheckpoint()
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        def diffOf(g: org.apache.spark.sql.Column) =
          abs(dd(sum(when(g === 1, col("x")).otherwise(0L)))
            / dd(sum(when(g === 1, 1L).otherwise(0L)))
            - dd(sum(when(g === 0, col("x")).otherwise(0L)))
            / dd(sum(when(g === 0, 1L).otherwise(0L))))
        val obs = ux.agg(count(lit(1)).cast("long").as("n_users"),
          diffOf(pmod(col("user_id"), lit(2L))).as("obs_diff"))
        val perms = ux.select(col("user_id"), col("x"),
            explode(sequence(lit(1), lit(100))).as("j"))
          .select(col("j"), col("x"),
            pmod(graft.expressions.PortableHash.md5Hash60(
              concat(lit("perm"), col("j").cast("string"), lit("#"),
                col("user_id").cast("string"))), lit(2L)).as("g"))
          .groupBy("j").agg(diffOf(col("g")).as("pd"))
        perms.join(broadcast(obs))
          .agg(max(col("n_users")).as("n_users"),
            max(col("obs_diff")).as("od"),
            count(lit(1)).cast("long").as("n_perms"),
            sum(when(col("pd") >= col("obs_diff"), 1L).otherwise(0L))
              .cast("long").as("n_ge"))
          .select(col("n_users"),
            (round(col("od") * 1000000.0) / 1000000.0).as("obs_diff"),
            col("n_perms"), col("n_ge"),
            (round((col("n_ge") + 1L).cast("double")
              / (col("n_perms") + 1L).cast("double") * 1000000.0)
              / 1000000.0).as("p_value"))
      },
      Some("""WITH ux AS (SELECT user_id, count(*) AS x FROM events
             |  GROUP BY user_id),
             |ob AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |    abs(CAST(sum(CASE WHEN user_id % 2 = 1 THEN x ELSE 0 END)
             |        AS DOUBLE)
             |      / CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
             |        AS DOUBLE)
             |      - CAST(sum(CASE WHEN user_id % 2 = 0 THEN x ELSE 0 END)
             |        AS DOUBLE)
             |      / CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
             |        AS DOUBLE)) AS od
             |  FROM ux),
             |pm AS (SELECT j.j AS j,
             |    CAST(('0x' || substr(md5('perm' || CAST(j.j AS VARCHAR)
             |      || '#' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |      % 2 AS g, x
             |  FROM ux CROSS JOIN (SELECT unnest(range(1, 101)) AS j) j),
             |pd AS (SELECT j,
             |    abs(CAST(sum(CASE WHEN g = 1 THEN x ELSE 0 END) AS DOUBLE)
             |      / CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |      - CAST(sum(CASE WHEN g = 0 THEN x ELSE 0 END) AS DOUBLE)
             |      / CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS DOUBLE))
             |      AS pd
             |  FROM pm GROUP BY j)
             |SELECT n_users,
             |  round(od * 1000000.0) / 1000000.0 AS obs_diff,
             |  CAST(count(*) AS BIGINT) AS n_perms,
             |  CAST(sum(CASE WHEN pd >= od THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_ge,
             |  round(CAST(sum(CASE WHEN pd >= od THEN 1 ELSE 0 END) + 1
             |    AS DOUBLE) / CAST(count(*) + 1 AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS p_value
             |FROM pd CROSS JOIN ob
             |GROUP BY n_users, od""".stripMargin)),

    // ---- Train/test split-leakage audit: hash-split the corpus 90/10
    // (portable md5 assignment), fingerprint every doc (md5 of text),
    // and count test docs whose fingerprint also appears in train — the
    // q61-decontamination check applied to YOUR OWN split, the audit
    // that catches eval contamination before a model ships. One
    // fingerprint shuffle; the leak probe is a semi-join.
    Q("q373_split_leakage",
      (s, d) => {
        val fp = t(s, d, "documents").select(col("doc_id"),
          md5(col("text")).as("fp"),
          (pmod(graft.expressions.PortableHash.md5Hash60(
            concat(lit("split#"), col("doc_id").cast("string"))),
            lit(10L)) === 0L).as("is_test"))
        val train = fp.where(!col("is_test")).select(col("fp"))
        val leaked = fp.where(col("is_test"))
          .join(train, Seq("fp"), "left_semi")
        val counts = fp.agg(
          sum(when(col("is_test"), 1L).otherwise(0L)).cast("long")
            .as("n_test"),
          sum(when(!col("is_test"), 1L).otherwise(0L)).cast("long")
            .as("n_train"))
        val lk = leaked.agg(count(lit(1)).cast("long").as("n_leaked"))
        counts.join(broadcast(lk))
          .select(col("n_train"), col("n_test"), col("n_leaked"),
            (round(col("n_leaked").cast("double")
              / col("n_test").cast("double") * 1000000.0) / 1000000.0)
              .as("leak_rate"))
      },
      Some("""WITH fp AS (SELECT doc_id, md5(text) AS fp,
             |    CAST(('0x' || substr(md5('split#'
             |      || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0
             |      AS is_test
             |  FROM documents),
             |tr AS (SELECT DISTINCT fp FROM fp WHERE NOT is_test),
             |lk AS (SELECT CAST(count(*) AS BIGINT) AS n_leaked
             |  FROM fp WHERE is_test AND fp IN (SELECT fp FROM tr)),
             |ct AS (SELECT
             |    CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_test,
             |    CAST(sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_train
             |  FROM fp)
             |SELECT n_train, n_test, n_leaked,
             |  round(CAST(n_leaked AS DOUBLE) / CAST(n_test AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS leak_rate
             |FROM ct CROSS JOIN lk""".stripMargin)),

    // ---- Jarque–Bera normality test on order prices: JB =
    // n/6·(g₁² + g₂²/4) from the SAME exact decimal38 raw-moment pass
    // as q326's per-segment profile (central moments composed
    // identically on both engines) — the one-number normality gate in
    // front of every z-test in the register. One conditional-free scan.
    Q("q374_jarque_bera",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = t(s, d, "orders")
          .select(round(col("o_totalprice") * 100.0).cast("long").as("x"))
        def dc(c: org.apache.spark.sql.Column) = c.cast(dec)
        val m = base.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x")).cast(dec).as("s1"),
          sum(dc(col("x")) * dc(col("x"))).as("s2"),
          sum(dc(col("x")) * dc(col("x")) * dc(col("x"))).as("s3"),
          sum(dc(col("x")) * dc(col("x")) * dc(col("x")) * dc(col("x")))
            .as("s4"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val n = dd(col("n"))
        val mu = dd(col("s1")) / n
        val m2 = dd(col("s2")) / n - mu * mu
        val m3 = dd(col("s3")) / n - lit(3.0) * mu * (dd(col("s2")) / n) +
          lit(2.0) * mu * mu * mu
        val m4 = dd(col("s4")) / n - lit(4.0) * mu * (dd(col("s3")) / n) +
          lit(6.0) * mu * mu * (dd(col("s2")) / n) -
          lit(3.0) * mu * mu * mu * mu
        val g1 = m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2))
        val g2 = m4 / (m2 * m2) - 3.0
        m.select(col("n").cast("long").as("n"),
          (round(g1 * 1000000.0) / 1000000.0).as("skewness"),
          (round(g2 * 1000000.0) / 1000000.0).as("excess_kurtosis"),
          (round(n / 6.0 * (g1 * g1 + g2 * g2 / 4.0) * 10000.0)
            / 10000.0).as("jb"),
          (n / 6.0 * (g1 * g1 + g2 * g2 / 4.0) > 5.991).as("reject_5pct"))
      },
      Some("""WITH b AS (SELECT
             |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS x
             |  FROM orders),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(x) AS HUGEINT) AS s1,
             |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS s2,
             |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)
             |      * CAST(x AS HUGEINT)) AS s3,
             |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)
             |      * CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS s4
             |  FROM b),
             |c AS (SELECT CAST(n AS BIGINT) AS n,
             |    CAST(n AS DOUBLE) AS nd,
             |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
             |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
             |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
             |  FROM m),
             |g AS (SELECT n, nd,
             |    (r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu)
             |      / (sqrt(r2 - mu * mu) * sqrt(r2 - mu * mu)
             |        * sqrt(r2 - mu * mu)) AS g1,
             |    (r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
             |      - 3.0 * mu * mu * mu * mu)
             |      / ((r2 - mu * mu) * (r2 - mu * mu)) - 3.0 AS g2
             |  FROM c)
             |SELECT n,
             |  round(g1 * 1000000.0) / 1000000.0 AS skewness,
             |  round(g2 * 1000000.0) / 1000000.0 AS excess_kurtosis,
             |  round(nd / 6.0 * (g1 * g1 + g2 * g2 / 4.0) * 10000.0)
             |    / 10000.0 AS jb,
             |  nd / 6.0 * (g1 * g1 + g2 * g2 / 4.0) > 5.991 AS reject_5pct
             |FROM g""".stripMargin)),

    // ---- Two-way ANOVA with interaction: weekday × event-type effects
    // on daily per-type counts over COMPLETE weeks (q352's balanced
    // blocks). Every sum of squares comes from the Σ(group²/n) − T²/N
    // identity over exact integer group sums (cell table is 7×5), so
    // the F ratios are fixed chains; extends q277's one-way test with
    // the interaction term. One (day, type) fact fold; everything
    // after is cell-sized.
    Q("q375_two_way_anova",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dayNs = 86400L * 1000000000L
        val obs = Tables.events(s, d)
          .select(expr(s"ts div $dayNs").as("day"), col("event_type"))
          .groupBy("day", "event_type").agg(count(lit(1)).as("y"))
        val wk = obs.select(expr("day div 7").as("week")).distinct()
          .join(obs.select(expr("day div 7").as("week"), col("day"))
            .distinct().groupBy("week").agg(count(lit(1)).as("nd")),
            "week")
          .where(col("nd") === 7).select("week")
        val b = obs.join(broadcast(wk),
            expr("day div 7") === col("week"))
          .select(pmod(col("day"), lit(7L)).as("wd"), col("event_type"),
            col("y")).localCheckpoint()
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val tot = b.agg(count(lit(1)).cast(dec).as("nn"),
          sum(col("y")).cast(dec).as("tt"),
          sum(col("y").cast(dec) * col("y").cast(dec)).as("qq"))
        def ssOf(g: org.apache.spark.sql.DataFrame) = g
          .agg(count(lit(1)).cast("long").as("k"),
            sum(dd(col("gs")) * dd(col("gs")) / dd(col("gn"))).as("raw"))
        val ssA = ssOf(b.groupBy("wd").agg(sum(col("y")).cast(dec)
          .as("gs"), count(lit(1)).cast(dec).as("gn")))
          .select(col("k").as("ka"), col("raw").as("rawa"))
        val ssB = ssOf(b.groupBy("event_type").agg(sum(col("y")).cast(dec)
          .as("gs"), count(lit(1)).cast(dec).as("gn")))
          .select(col("k").as("kb"), col("raw").as("rawb"))
        val ssC = ssOf(b.groupBy("wd", "event_type")
          .agg(sum(col("y")).cast(dec).as("gs"),
            count(lit(1)).cast(dec).as("gn")))
          .select(col("k").as("kc"), col("raw").as("rawc"))
        val j = tot.join(broadcast(ssA)).join(broadcast(ssB))
          .join(broadcast(ssC))
        val cm = dd(col("tt")) * dd(col("tt")) / dd(col("nn"))
        val sst = dd(col("qq")) - cm
        val sa = col("rawa") - cm
        val sb = col("rawb") - cm
        val scells = col("rawc") - cm
        val sab = scells - sa - sb
        val se = sst - scells
        val dfa = col("ka") - 1L
        val dfb = col("kb") - 1L
        val dfab = dfa * dfb
        val dfe = col("nn").cast("long") - col("kc")
        def row(src: String, ss: org.apache.spark.sql.Column,
            df: org.apache.spark.sql.Column,
            f: Option[org.apache.spark.sql.Column]) =
          j.select(lit(src).as("source"), df.cast("long").as("df"),
            (round(ss * 100.0) / 100.0).as("ss"),
            f.map(x => (round(x * 10000.0) / 10000.0).as("f"))
              .getOrElse(lit(null).cast("double").as("f")))
        val fe = se / dfe.cast("double")
        row("weekday", sa, dfa, Some(sa / dfa.cast("double") / fe))
          .unionAll(row("event_type", sb, dfb,
            Some(sb / dfb.cast("double") / fe)))
          .unionAll(row("interaction", sab, dfab,
            Some(sab / dfab.cast("double") / fe)))
          .unionAll(row("error", se, dfe, None))
          .orderBy("source")
      },
      Some("""WITH obs AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             |    event_type, count(*) AS y
             |  FROM events GROUP BY 1, 2),
             |wk AS (SELECT day // 7 AS week
             |  FROM (SELECT DISTINCT day FROM obs)
             |  GROUP BY 1 HAVING count(*) = 7),
             |b AS (SELECT day % 7 AS wd, event_type, y
             |  FROM obs JOIN wk ON obs.day // 7 = wk.week),
             |tt AS (SELECT CAST(count(*) AS HUGEINT) AS nn,
             |    CAST(sum(y) AS HUGEINT) AS t,
             |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS qq
             |  FROM b),
             |ga AS (SELECT CAST(count(*) AS BIGINT) AS ka,
             |    sum(CAST(gs AS DOUBLE) * CAST(gs AS DOUBLE)
             |      / CAST(gn AS DOUBLE)) AS rawa
             |  FROM (SELECT CAST(sum(y) AS HUGEINT) AS gs,
             |      CAST(count(*) AS HUGEINT) AS gn FROM b GROUP BY wd)),
             |gb AS (SELECT CAST(count(*) AS BIGINT) AS kb,
             |    sum(CAST(gs AS DOUBLE) * CAST(gs AS DOUBLE)
             |      / CAST(gn AS DOUBLE)) AS rawb
             |  FROM (SELECT CAST(sum(y) AS HUGEINT) AS gs,
             |      CAST(count(*) AS HUGEINT) AS gn
             |    FROM b GROUP BY event_type)),
             |gc AS (SELECT CAST(count(*) AS BIGINT) AS kc,
             |    sum(CAST(gs AS DOUBLE) * CAST(gs AS DOUBLE)
             |      / CAST(gn AS DOUBLE)) AS rawc
             |  FROM (SELECT CAST(sum(y) AS HUGEINT) AS gs,
             |      CAST(count(*) AS HUGEINT) AS gn
             |    FROM b GROUP BY wd, event_type)),
             |x AS (SELECT nn, qq, ka, kb, kc, rawa, rawb, rawc,
             |    CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
             |      / CAST(nn AS DOUBLE) AS cm
             |  FROM tt CROSS JOIN ga CROSS JOIN gb CROSS JOIN gc),
             |y AS (SELECT ka, kb, kc, CAST(nn AS BIGINT) AS nl,
             |    CAST(qq AS DOUBLE) - cm AS sst,
             |    rawa - cm AS sa, rawb - cm AS sb,
             |    rawc - cm AS scells FROM x),
             |z AS (SELECT ka - 1 AS dfa, kb - 1 AS dfb,
             |    (ka - 1) * (kb - 1) AS dfab, nl - kc AS dfe,
             |    sa, sb, scells - sa - sb AS sab, sst - scells AS se
             |  FROM y)
             |SELECT * FROM (
             |  SELECT 'weekday' AS source, CAST(dfa AS BIGINT) AS df,
             |    round(sa * 100.0) / 100.0 AS ss,
             |    round(sa / CAST(dfa AS DOUBLE)
             |      / (se / CAST(dfe AS DOUBLE)) * 10000.0) / 10000.0 AS f
             |  FROM z
             |  UNION ALL
             |  SELECT 'event_type', CAST(dfb AS BIGINT),
             |    round(sb * 100.0) / 100.0,
             |    round(sb / CAST(dfb AS DOUBLE)
             |      / (se / CAST(dfe AS DOUBLE)) * 10000.0) / 10000.0
             |  FROM z
             |  UNION ALL
             |  SELECT 'interaction', CAST(dfab AS BIGINT),
             |    round(sab * 100.0) / 100.0,
             |    round(sab / CAST(dfab AS DOUBLE)
             |      / (se / CAST(dfe AS DOUBLE)) * 10000.0) / 10000.0
             |  FROM z
             |  UNION ALL
             |  SELECT 'error', CAST(dfe AS BIGINT),
             |    round(se * 100.0) / 100.0, NULL
             |  FROM z)
             |ORDER BY source""".stripMargin)),

    // ---- Dedup sensitivity to shingle SIZE: the 3-gram (q22) and
    // 2-gram exact-Jaccard pair sets at τ=0.5, their overlap, and the
    // pair-set agreement Jaccard — q306 swept the THRESHOLD; this
    // sweeps the FEATURE, the other knob a dedup config exposes. Both
    // pair sets come from the same banded-prefix machinery; agreement
    // is a pair-key join of two tiny pair lists.
    //
    // SCALE: the registered form runs BOTH arms over the q66
    // deterministic 10% md5 doc-sample (same universe for both, so the
    // agreement statistic is a valid paired estimator). The unsampled
    // 2-gram arm was the register's one measured sf1 spill cliff
    // (2-grams are so common the posting-list join is near-quadratic:
    // 409 GB spill / 916 s cold at sf1) — a sensitivity ANALYSIS never
    // needs the full corpus, so the sample IS the right production
    // shape, not a workaround.
    Q("q376_shingle_sensitivity",
      (s, d) => {
        val docs = t(s, d, "documents")
          .where(pmod(graft.expressions.PortableHash.md5Hash60(
            concat(lit("shs:"), col("doc_id"))), lit(100L)) < 10)
        val p3 = Dedup.shingleJaccardPairs(docs, 0.5, n = 3)
          .select(col("id_a"), col("id_b"))
        val p2 = Dedup.shingleJaccardPairs(docs, 0.5, n = 2)
          .select(col("id_a").as("a2"), col("id_b").as("b2"))
        val both = p3.join(p2, col("id_a") === col("a2")
          && col("id_b") === col("b2"))
          .agg(count(lit(1)).cast("long").as("n_both"))
        val c3 = p3.agg(count(lit(1)).cast("long").as("n_3gram"))
        val c2 = p2.agg(count(lit(1)).cast("long").as("n_2gram"))
        c3.join(broadcast(c2)).join(broadcast(both))
          .select(col("n_3gram"), col("n_2gram"), col("n_both"),
            when(col("n_3gram") + col("n_2gram") - col("n_both") > 0,
              round(col("n_both").cast("double")
                / (col("n_3gram") + col("n_2gram") - col("n_both"))
                  .cast("double") * 1000000.0) / 1000000.0)
              .as("agreement")) // NULL when the sample has no pairs
      },
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents
             |  WHERE CAST(('0x' || substr(md5('shs:'
             |      || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |    % 100 < 10),
             |sh3 AS (SELECT doc_id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |     for i in range(1, len(w) - 1)])) AS s
             |  FROM ws WHERE len(w) >= 3),
             |c3 AS (SELECT doc_id, count(*) AS n FROM sh3 GROUP BY doc_id),
             |i3 AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |  FROM sh3 a JOIN sh3 b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |p3 AS (SELECT ia, ib FROM i3
             |  JOIN c3 ca ON ca.doc_id = ia JOIN c3 cb ON cb.doc_id = ib
             |  WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5),
             |sh2 AS (SELECT doc_id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] for i in range(1, len(w))])) AS s
             |  FROM ws WHERE len(w) >= 2),
             |c2 AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
             |i2 AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |  FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |p2 AS (SELECT ia, ib FROM i2
             |  JOIN c2 ca ON ca.doc_id = ia JOIN c2 cb ON cb.doc_id = ib
             |  WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5),
             |bt AS (SELECT CAST(count(*) AS BIGINT) AS n_both
             |  FROM p3 JOIN p2 ON p3.ia = p2.ia AND p3.ib = p2.ib),
             |n3 AS (SELECT CAST(count(*) AS BIGINT) AS n_3gram FROM p3),
             |n2 AS (SELECT CAST(count(*) AS BIGINT) AS n_2gram FROM p2)
             |SELECT n_3gram, n_2gram, n_both,
             |  CASE WHEN n_3gram + n_2gram - n_both > 0 THEN
             |    round(CAST(n_both AS DOUBLE)
             |      / CAST(n_3gram + n_2gram - n_both AS DOUBLE)
             |      * 1000000.0) / 1000000.0
             |  END AS agreement
             |FROM n3 CROSS JOIN n2 CROSS JOIN bt""".stripMargin)),

    // ---- Customer value-quartile migration: each customer's revenue
    // quartile in the first half (orders before 1998-07-01) vs the
    // second, as a 4×4 transition matrix over customers active in BOTH
    // — the loyalty-migration report behind q190's static RFM. EXACT
    // quartiles by rank arithmetic q = ((rank−1)·4) div n (no ntile
    // positional drift); two period folds, one customer join.
    Q("q377_quartile_migration",
      (s, d) => {
        def half(cond: org.apache.spark.sql.Column, tag: String) =
          t(s, d, "orders").where(cond)
            .groupBy("o_custkey")
            .agg(sum(round(col("o_totalprice") * 100.0).cast("long"))
              .as(s"rev$tag"))
        val split = lit("1998-07-01").cast("timestamp")
        val h1 = half(col("o_orderdate") < split, "1")
        val h2 = half(col("o_orderdate") >= split, "2")
        val both = h1.join(h2, "o_custkey")
        def rk(revCol: String) = (row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col(revCol), col("o_custkey"))).cast("long") - 1L) * 4L
        val ranked = both
          .withColumn("nn", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
          .withColumn("r1", rk("rev1")).withColumn("r2", rk("rev2"))
          .withColumn("q1", expr("r1 div nn") + 1L)
          .withColumn("q2", expr("r2 div nn") + 1L)
        ranked.groupBy("q1", "q2")
          .agg(count(lit(1)).cast("long").as("n_users"))
          .join(broadcast(ranked.groupBy("q1")
            .agg(count(lit(1)).as("row_n"))), "q1")
          .select(col("q1"), col("q2"), col("n_users"),
            (round(col("n_users").cast("double")
              / col("row_n").cast("double") * 1000000.0) / 1000000.0)
              .as("row_share"))
          .orderBy("q1", "q2")
      },
      Some("""WITH h1 AS (SELECT o_custkey,
             |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS rev1
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-07-01'
             |  GROUP BY 1),
             |h2 AS (SELECT o_custkey,
             |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS rev2
             |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-07-01'
             |  GROUP BY 1),
             |b AS (SELECT h1.o_custkey, rev1, rev2
             |  FROM h1 JOIN h2 ON h1.o_custkey = h2.o_custkey),
             |n AS (SELECT count(*) AS n FROM b),
             |rk AS (SELECT o_custkey,
             |    ((row_number() OVER (ORDER BY rev1, o_custkey) - 1) * 4)
             |      // n + 1 AS q1,
             |    ((row_number() OVER (ORDER BY rev2, o_custkey) - 1) * 4)
             |      // n + 1 AS q2
             |  FROM b CROSS JOIN n),
             |mx AS (SELECT q1, q2, CAST(count(*) AS BIGINT) AS n_users
             |  FROM rk GROUP BY 1, 2),
             |rn AS (SELECT q1, sum(n_users) AS row_n FROM mx GROUP BY 1)
             |SELECT CAST(mx.q1 AS BIGINT) AS q1,
             |  CAST(mx.q2 AS BIGINT) AS q2, n_users,
             |  round(CAST(n_users AS DOUBLE) / CAST(row_n AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS row_share
             |FROM mx JOIN rn ON mx.q1 = rn.q1
             |ORDER BY q1, q2""".stripMargin)),

    // ---- Jelinek–Mercer interpolated bigram LM: train on the 90%
    // hash split (q373's assignment), score the held-out 10% with
    // p = 0.75·p_bigram + 0.25·p_unigram-add-one — the linear-
    // interpolation smoother bracketing q265 (Kneser-Ney) from below.
    // Per-token ln terms are 1e-8-quantized into an exact decimal fold
    // (thousands of terms — the unordered-double-sum risk is real
    // here), so cross-entropy and perplexity are engine-exact.
    Q("q378_jelinek_mercer",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"),
          (pmod(graft.expressions.PortableHash.md5Hash60(
            concat(lit("split#"), col("doc_id").cast("string"))),
            lit(10L)) === 0L).as("is_test"))
        val grams = docs.select(col("is_test"),
            posexplode(split(col("text"), " ")).as(Seq("i", "w")),
            col("doc_id"))
          .withColumn("u", lag(col("w"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id").orderBy("i")))
          .where(col("u").isNotNull)
          .localCheckpoint()
        val uniT = grams.where(!col("is_test"))
          .groupBy("w").agg(count(lit(1)).as("cw"))
        val biT = grams.where(!col("is_test"))
          .groupBy("u", "w").agg(count(lit(1)).as("cuw"))
        val ctxT = grams.where(!col("is_test"))
          .groupBy("u").agg(count(lit(1)).as("cu"))
        val tot = uniT.agg(sum(col("cw")).cast("long").as("tt"),
          count(lit(1)).cast("long").as("vv"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val test = grams.where(col("is_test"))
          .join(uniT, Seq("w"), "left")
          .join(biT, Seq("u", "w"), "left")
          .join(ctxT, Seq("u"), "left")
          .join(broadcast(tot))
        val pBi = when(col("cu").isNotNull && col("cuw").isNotNull,
          dd(col("cuw")) / dd(col("cu"))).otherwise(lit(0.0))
        val pUni = (dd(coalesce(col("cw"), lit(0L))) + 1.0) /
          (dd(col("tt")) + dd(col("vv")))
        val lp = round(log(lit(0.75) * pBi + lit(0.25) * pUni)
          * 100000000.0).cast(dec)
        val ag = test.agg(count(lit(1)).cast("long").as("m"),
          sum(lp).as("sl"))
        val docCounts = docs.agg(
          sum(when(!col("is_test"), 1L).otherwise(0L)).cast("long")
            .as("n_train_docs"),
          sum(when(col("is_test"), 1L).otherwise(0L)).cast("long")
            .as("n_test_docs"))
        docCounts.join(broadcast(ag))
          .select(col("n_train_docs"), col("n_test_docs"), col("m"),
            (round(-dd(col("sl")) / 100000000.0 / dd(col("m")) * 10000.0)
              / 10000.0).as("cross_entropy"),
            (round(exp(-dd(col("sl")) / 100000000.0 / dd(col("m")))
              * 10000.0) / 10000.0).as("perplexity"))
      },
      Some("""WITH dc AS (SELECT doc_id, text,
             |    CAST(('0x' || substr(md5('split#'
             |      || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0
             |      AS is_test
             |  FROM documents),
             |ws AS (SELECT is_test, string_split(text, ' ') AS w
             |  FROM dc),
             |gx AS (SELECT is_test, unnest([{'u': w[i], 'w': w[i+1]}
             |    for i in range(1, len(w))]) AS g
             |  FROM ws WHERE len(w) >= 2),
             |g2 AS (SELECT is_test, g.u AS u, g.w AS w FROM gx),
             |uni AS (SELECT w, count(*) AS cw FROM g2 WHERE NOT is_test
             |  GROUP BY w),
             |bi AS (SELECT u, w, count(*) AS cuw FROM g2
             |  WHERE NOT is_test GROUP BY u, w),
             |ctx AS (SELECT u, count(*) AS cu FROM g2 WHERE NOT is_test
             |  GROUP BY u),
             |tt AS (SELECT CAST(sum(cw) AS BIGINT) AS t,
             |    CAST(count(*) AS BIGINT) AS v FROM uni),
             |ts AS (SELECT
             |    CASE WHEN ctx.cu IS NOT NULL AND bi.cuw IS NOT NULL
             |      THEN CAST(bi.cuw AS DOUBLE) / CAST(ctx.cu AS DOUBLE)
             |      ELSE 0.0 END AS pbi,
             |    (CAST(coalesce(uni.cw, 0) AS DOUBLE) + 1.0)
             |      / (CAST(t AS DOUBLE) + CAST(v AS DOUBLE)) AS puni
             |  FROM g2
             |  LEFT JOIN uni ON g2.w = uni.w
             |  LEFT JOIN bi ON g2.u = bi.u AND g2.w = bi.w
             |  LEFT JOIN ctx ON g2.u = ctx.u
             |  CROSS JOIN tt
             |  WHERE g2.is_test),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS m,
             |    sum(CAST(round(ln(0.75 * pbi + 0.25 * puni)
             |      * 100000000.0) AS HUGEINT)) AS sl
             |  FROM ts),
             |ds AS (SELECT
             |    CAST(sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_train_docs,
             |    CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_test_docs
             |  FROM dc)
             |SELECT n_train_docs, n_test_docs, m,
             |  round(-CAST(sl AS DOUBLE) / 100000000.0 / CAST(m AS DOUBLE)
             |    * 10000.0) / 10000.0 AS cross_entropy,
             |  round(exp(-CAST(sl AS DOUBLE) / 100000000.0
             |    / CAST(m AS DOUBLE)) * 10000.0) / 10000.0 AS perplexity
             |FROM ds CROSS JOIN ag""".stripMargin),
      bench = true),

    // ---- Laspeyres / Paasche / Fisher price indices between the two
    // order-date halves, with parts as the basket: period unit values
    // S/Q stay exact rationals and each cross-period term S₂ᵢQ₁ᵢ/Q₂ᵢ is
    // rounded to one integer cent BEFORE the exact fold — the
    // index-number kernel of any longitudinal pricing monitor. Two
    // part-keyed folds and one part join; all fact scans are single
    // passes.
    Q("q379_price_indices",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val li = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_partkey"),
            (col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
              .as("h1"),
            round(col("l_extendedprice") * 100.0).cast("long").as("pc"),
            col("l_quantity").cast("long").as("q"))
        def per(h1: Boolean, tag: String) = li
          .where(if (h1) col("h1") else !col("h1"))
          .groupBy("l_partkey")
          .agg(sum(col("pc")).as(s"s$tag"), sum(col("q")).as(s"q$tag"))
        val both = per(true, "1").join(per(false, "2"), "l_partkey")
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val ag = both.agg(count(lit(1)).cast("long").as("n_parts"),
          sum(col("s1")).cast(dec).as("ss1"),
          sum(col("s2")).cast(dec).as("ss2"),
          sum(round(dd(col("s2")) * dd(col("q1")) / dd(col("q2")))
            .cast(dec)).as("l_num"),
          sum(round(dd(col("s1")) * dd(col("q2")) / dd(col("q1")))
            .cast(dec)).as("p_den"))
        val lasp = dd(col("l_num")) / dd(col("ss1"))
        val paas = dd(col("ss2")) / dd(col("p_den"))
        ag.select(col("n_parts"),
          (round(lasp * 1000000.0) / 1000000.0).as("laspeyres"),
          (round(paas * 1000000.0) / 1000000.0).as("paasche"),
          (round(sqrt(lasp * paas) * 1000000.0) / 1000000.0).as("fisher"))
      },
      Some("""WITH li AS (SELECT l_partkey,
             |    o_orderdate < TIMESTAMP '1998-07-01' AS h1,
             |    CAST(round(l_extendedprice * 100.0) AS BIGINT) AS pc,
             |    CAST(l_quantity AS BIGINT) AS q
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |p1 AS (SELECT l_partkey, sum(pc) AS s1, sum(q) AS q1
             |  FROM li WHERE h1 GROUP BY 1),
             |p2 AS (SELECT l_partkey, sum(pc) AS s2, sum(q) AS q2
             |  FROM li WHERE NOT h1 GROUP BY 1),
             |b AS (SELECT p1.l_partkey, s1, q1, s2, q2
             |  FROM p1 JOIN p2 ON p1.l_partkey = p2.l_partkey),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
             |    CAST(sum(s1) AS HUGEINT) AS ss1,
             |    CAST(sum(s2) AS HUGEINT) AS ss2,
             |    sum(CAST(round(CAST(s2 AS DOUBLE) * CAST(q1 AS DOUBLE)
             |      / CAST(q2 AS DOUBLE)) AS HUGEINT)) AS l_num,
             |    sum(CAST(round(CAST(s1 AS DOUBLE) * CAST(q2 AS DOUBLE)
             |      / CAST(q1 AS DOUBLE)) AS HUGEINT)) AS p_den
             |  FROM b)
             |SELECT n_parts,
             |  round(CAST(l_num AS DOUBLE) / CAST(ss1 AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS laspeyres,
             |  round(CAST(ss2 AS DOUBLE) / CAST(p_den AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS paasche,
             |  round(sqrt((CAST(l_num AS DOUBLE) / CAST(ss1 AS DOUBLE))
             |    * (CAST(ss2 AS DOUBLE) / CAST(p_den AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS fisher
             |FROM ag""".stripMargin)),

    // ---- Empirical-Bayes shrinkage of per-nation fulfillment rates
    // toward the grand mean (beta-binomial method of moments): prior
    // strength M = p̄(1−p̄)/τ̂² − 1 with τ̂² from the moment identity,
    // then rate_i ↦ (a_i + M·p̄)/(n_i + M) — the small-sample-stable
    // leaderboard every per-segment metric page needs. τ̂² is 1e-9-
    // rounded before M so both engines shrink identically; everything
    // upstream is exact counts. Dims broadcast; one nation fold.
    Q("q380_eb_shrinkage",
      (s, d) => {
        val base = t(s, d, "orders")
          .join(broadcast(t(s, d, "customer")
            .select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")
            .select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name").agg(
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
              .as("a"),
            count(lit(1)).as("n"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val tot = base.agg(sum(col("a")).as("aa"), sum(col("n")).as("nn"),
          count(lit(1)).as("k"),
          sum(dd(col("n")) * dd(col("n"))).as("sn2"))
        val withTot = base.join(broadcast(tot))
        val pbar = dd(col("aa")) / dd(col("nn"))
        val dev = withTot.agg(max(col("aa")).as("aa"),
          max(col("nn")).as("nn"), max(col("k")).as("k"),
          max(col("sn2")).as("sn2"),
          sum(dd(col("n")) * (dd(col("a")) / dd(col("n")) - pbar)
            * (dd(col("a")) / dd(col("n")) - pbar)).as("ssb"))
        val tau2 = round((col("ssb") - (dd(col("k")) - 1.0) * pbar
          * (lit(1.0) - pbar))
          / (dd(col("nn")) - col("sn2") / dd(col("nn"))) * 1.0e9) / 1.0e9
        val m = dev.select(col("aa"), col("nn"), col("k"),
          (pbar * (lit(1.0) - pbar) / greatest(tau2, lit(1.0e-9)) - 1.0)
            .as("mm"), pbar.as("pb"))
        base.join(broadcast(m))
          .select(col("n_name").as("nation"), col("n").cast("long").as("n"),
            (round(dd(col("a")) / dd(col("n")) * 1000000.0) / 1000000.0)
              .as("raw_rate"),
            (round((dd(col("a")) + col("mm") * col("pb"))
              / (dd(col("n")) + col("mm")) * 1000000.0) / 1000000.0)
              .as("shrunk_rate"),
            (round(dd(col("n")) / (dd(col("n")) + col("mm")) * 1000000.0)
              / 1000000.0).as("weight"))
          .orderBy("nation")
      },
      Some("""WITH b AS (SELECT n_name,
             |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS a,
             |    count(*) AS n
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |    JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY 1),
             |tt AS (SELECT CAST(sum(a) AS BIGINT) AS aa,
             |    CAST(sum(n) AS BIGINT) AS nn,
             |    CAST(count(*) AS BIGINT) AS k,
             |    sum(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS sn2
             |  FROM b),
             |dv AS (SELECT aa, nn, k, sn2,
             |    sum(CAST(n AS DOUBLE)
             |      * (CAST(a AS DOUBLE) / CAST(n AS DOUBLE)
             |        - CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))
             |      * (CAST(a AS DOUBLE) / CAST(n AS DOUBLE)
             |        - CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))) AS ssb
             |  FROM b CROSS JOIN tt GROUP BY aa, nn, k, sn2),
             |mm AS (SELECT aa, nn, k,
             |    (CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))
             |      * (1.0 - CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))
             |      / greatest(round(((ssb - (CAST(k AS DOUBLE) - 1.0)
             |        * (CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))
             |        * (1.0 - CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE)))
             |        / (CAST(nn AS DOUBLE) - sn2 / CAST(nn AS DOUBLE)))
             |        * 1000000000.0) / 1000000000.0, 0.000000001) - 1.0
             |      AS m,
             |    CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE) AS pb
             |  FROM dv)
             |SELECT n_name AS nation, CAST(n AS BIGINT) AS n,
             |  round(CAST(a AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS raw_rate,
             |  round((CAST(a AS DOUBLE) + m * pb)
             |    / (CAST(n AS DOUBLE) + m) * 1000000.0) / 1000000.0
             |    AS shrunk_rate,
             |  round(CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) + m)
             |    * 1000000.0) / 1000000.0 AS weight
             |FROM b CROSS JOIN mm ORDER BY nation""".stripMargin)),

    // ---- Coupon-collector coverage deficit: per event type, observed
    // distinct users vs the uniform-traffic expectation
    // U·(1−exp(N·ln(1−1/U))) — a deficit means traffic concentrates on
    // repeat users. The null expectation is one exp/ln chain from
    // exact counts; one exact-distinct fold per type plus the global
    // user universe broadcast.
    Q("q381_coverage_deficit",
      (s, d) => {
        val ev = Tables.events(s, d)
        val uni = ev.agg(countDistinct(col("user_id")).as("u"))
        val per = ev.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("dobs"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val expected = dd(col("u")) * (lit(1.0)
          - exp(dd(col("n")) * log(lit(1.0) - lit(1.0) / dd(col("u")))))
        per.join(broadcast(uni))
          .select(col("event_type"), col("n").cast("long").as("n_events"),
            col("dobs").cast("long").as("distinct_users"),
            col("u").cast("long").as("universe"),
            (round(expected * 100.0) / 100.0).as("expected_uniform"),
            (round((expected - dd(col("dobs"))) / expected * 1000000.0)
              / 1000000.0).as("deficit"))
          .orderBy("event_type")
      },
      Some("""WITH u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
             |    AS u FROM events),
             |p AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS dobs
             |  FROM events GROUP BY 1)
             |SELECT event_type, n AS n_events, dobs AS distinct_users,
             |  u AS universe,
             |  round(CAST(u AS DOUBLE) * (1.0 - exp(CAST(n AS DOUBLE)
             |    * ln(1.0 - 1.0 / CAST(u AS DOUBLE)))) * 100.0) / 100.0
             |    AS expected_uniform,
             |  round((CAST(u AS DOUBLE) * (1.0 - exp(CAST(n AS DOUBLE)
             |    * ln(1.0 - 1.0 / CAST(u AS DOUBLE))))
             |    - CAST(dobs AS DOUBLE))
             |    / (CAST(u AS DOUBLE) * (1.0 - exp(CAST(n AS DOUBLE)
             |    * ln(1.0 - 1.0 / CAST(u AS DOUBLE))))) * 1000000.0)
             |    / 1000000.0 AS deficit
             |FROM p CROSS JOIN u ORDER BY event_type""".stripMargin)),

    // ---- Winsorized vs raw correlation (price, quantity): clamp both
    // margins at their own nearest-rank p5/p95 (exact rank equality,
    // q360's convention), recompute Pearson r on the clamped integers,
    // and report the outlier influence Δr — the robustness check that
    // says whether q354's raw correlation is tail-driven. Cutoffs are
    // four scalar broadcasts; both moment passes are exact decimal38.
    Q("q382_winsorized_corr",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = t(s, d, "lineitem").select(
          round(col("l_extendedprice") * 100.0).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"),
          col("l_orderkey"), col("l_linenumber")).localCheckpoint()
        def cuts(vCol: String) = {
          val w = org.apache.spark.sql.expressions.Window
            .orderBy(col(vCol), col("l_orderkey"), col("l_linenumber"))
          val r = base.withColumn("rn", row_number().over(w).cast("long"))
            .withColumn("nn", count(lit(1)).over(
              org.apache.spark.sql.expressions.Window.partitionBy()))
          r.where(col("rn") === expr("(nn * 5 + 99) div 100")
              || col("rn") === expr("(nn * 95 + 99) div 100"))
            .agg(min(when(col("rn") === expr("(nn * 5 + 99) div 100"),
              col(vCol))).as(s"lo_$vCol"),
              min(when(col("rn") === expr("(nn * 95 + 99) div 100"),
                col(vCol))).as(s"hi_$vCol"))
        }
        val cx = cuts("x"); val cy = cuts("y")
        val clamped = base.join(broadcast(cx)).join(broadcast(cy))
          .select(
            least(greatest(col("x"), col("lo_x")), col("hi_x")).as("xw"),
            least(greatest(col("y"), col("lo_y")), col("hi_y")).as("yw"),
            col("x"), col("y"))
        def dc(c: org.apache.spark.sql.Column) = c.cast(dec)
        val m = clamped.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
          sum(dc(col("x")) * dc(col("x"))).as("sxx"),
          sum(dc(col("y")) * dc(col("y"))).as("syy"),
          sum(dc(col("x")) * dc(col("y"))).as("sxy"),
          sum(col("xw")).cast(dec).as("wx"), sum(col("yw")).cast(dec).as("wy"),
          sum(dc(col("xw")) * dc(col("xw"))).as("wxx"),
          sum(dc(col("yw")) * dc(col("yw"))).as("wyy"),
          sum(dc(col("xw")) * dc(col("yw"))).as("wxy"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        def pearson(sab: String, sa: String, sb: String, saa: String,
            sbb: String) =
          (dd(col("n")) * dd(col(sab)) - dd(col(sa)) * dd(col(sb))) /
            sqrt((dd(col("n")) * dd(col(saa)) - dd(col(sa)) * dd(col(sa)))
              * (dd(col("n")) * dd(col(sbb)) - dd(col(sb)) * dd(col(sb))))
        val rRaw = pearson("sxy", "sx", "sy", "sxx", "syy")
        val rW = pearson("wxy", "wx", "wy", "wxx", "wyy")
        m.select(col("n").cast("long").as("n"),
          (round(rRaw * 1000000.0) / 1000000.0).as("r_raw"),
          (round(rW * 1000000.0) / 1000000.0).as("r_winsorized"),
          (round((rW - rRaw) * 1000000.0) / 1000000.0).as("delta"))
      },
      Some("""WITH b AS (SELECT
             |    CAST(round(l_extendedprice * 100.0) AS BIGINT) AS x,
             |    CAST(l_quantity AS BIGINT) AS y,
             |    l_orderkey, l_linenumber
             |  FROM lineitem),
             |rx AS (SELECT x, CAST(row_number() OVER (ORDER BY x,
             |      l_orderkey, l_linenumber) AS BIGINT) AS rn,
             |    CAST(count(*) OVER () AS BIGINT) AS nn FROM b),
             |cx AS (SELECT
             |    min(CASE WHEN rn = (nn * 5 + 99) // 100 THEN x END)
             |      AS lo_x,
             |    min(CASE WHEN rn = (nn * 95 + 99) // 100 THEN x END)
             |      AS hi_x
             |  FROM rx),
             |ry AS (SELECT y, CAST(row_number() OVER (ORDER BY y,
             |      l_orderkey, l_linenumber) AS BIGINT) AS rn,
             |    CAST(count(*) OVER () AS BIGINT) AS nn FROM b),
             |cy AS (SELECT
             |    min(CASE WHEN rn = (nn * 5 + 99) // 100 THEN y END)
             |      AS lo_y,
             |    min(CASE WHEN rn = (nn * 95 + 99) // 100 THEN y END)
             |      AS hi_y
             |  FROM ry),
             |cl AS (SELECT x, y,
             |    least(greatest(x, lo_x), hi_x) AS xw,
             |    least(greatest(y, lo_y), hi_y) AS yw
             |  FROM b CROSS JOIN cx CROSS JOIN cy),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(x) AS HUGEINT) AS sx,
             |    CAST(sum(y) AS HUGEINT) AS sy,
             |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
             |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
             |    CAST(sum(xw) AS HUGEINT) AS wx,
             |    CAST(sum(yw) AS HUGEINT) AS wy,
             |    sum(CAST(xw AS HUGEINT) * CAST(xw AS HUGEINT)) AS wxx,
             |    sum(CAST(yw AS HUGEINT) * CAST(yw AS HUGEINT)) AS wyy,
             |    sum(CAST(xw AS HUGEINT) * CAST(yw AS HUGEINT)) AS wxy
             |  FROM cl)
             |SELECT CAST(n AS BIGINT) AS n,
             |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS r_raw,
             |  round((CAST(n AS DOUBLE) * CAST(wxy AS DOUBLE)
             |    - CAST(wx AS DOUBLE) * CAST(wy AS DOUBLE))
             |    / sqrt((CAST(n AS DOUBLE) * CAST(wxx AS DOUBLE)
             |      - CAST(wx AS DOUBLE) * CAST(wx AS DOUBLE))
             |      * (CAST(n AS DOUBLE) * CAST(wyy AS DOUBLE)
             |      - CAST(wy AS DOUBLE) * CAST(wy AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS r_winsorized,
             |  round(((CAST(n AS DOUBLE) * CAST(wxy AS DOUBLE)
             |    - CAST(wx AS DOUBLE) * CAST(wy AS DOUBLE))
             |    / sqrt((CAST(n AS DOUBLE) * CAST(wxx AS DOUBLE)
             |      - CAST(wx AS DOUBLE) * CAST(wx AS DOUBLE))
             |      * (CAST(n AS DOUBLE) * CAST(wyy AS DOUBLE)
             |      - CAST(wy AS DOUBLE) * CAST(wy AS DOUBLE)))
             |    - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             |    * 1000000.0) / 1000000.0 AS delta
             |FROM m""".stripMargin)),

    // ---- Mutual-best-match entity pairs: within q171's first-word
    // blocks, each name's argmax-Jaro-Winkler partner (directed), kept
    // only when the choice is RECIPROCAL — the stable-pairing filter
    // that turns a similarity join into high-precision merge
    // candidates (one-sided best matches are where ER false-merges
    // live). One in-block pair pass, one argmax window, one self-join
    // of the name-sized best-edge table; the JW kernel is the pinned
    // cross-engine expression.
    Q("q383_mutual_best_match",
      (s, d) => {
        val names = t(s, d, "part").groupBy("p_name")
          .agg(min("p_partkey").as("id"))
          .select(col("id"), col("p_name").as("name"),
            split(col("p_name"), " ").getItem(0).as("blk"))
        val a = names.select(col("id").as("id_a"), col("name").as("na"),
          col("blk"))
        val b = names.select(col("id").as("id_b"), col("name").as("nb"),
          col("blk").as("blk_b"))
        val pairs = a.join(b, col("blk") === col("blk_b")
            && col("id_a") =!= col("id_b"))
          .withColumn("jw", graft.expressions.JaroWinkler
            .jaro_winkler(col("na"), col("nb")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("id_a").orderBy(col("jw").desc, col("id_b"))
        val best = pairs.withColumn("rk", row_number().over(w))
          .where(col("rk") === 1)
          .select(col("id_a"), col("id_b"), col("jw"))
        best.join(best.select(col("id_a").as("ra"), col("id_b").as("rb")),
            col("id_a") === col("rb") && col("id_b") === col("ra"))
          .where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            (round(col("jw") * 1000000.0) / 1000000.0).as("jw"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH names AS (SELECT min(p_partkey) AS id, p_name AS name
             |  FROM part GROUP BY p_name),
             |n AS (SELECT id, name, string_split(name, ' ')[1] AS blk
             |  FROM names),
             |pr AS (SELECT a.id AS id_a, b.id AS id_b,
             |    jaro_winkler_similarity(a.name, b.name) AS jw
             |  FROM n a JOIN n b ON a.blk = b.blk AND a.id <> b.id),
             |best AS (SELECT id_a, id_b, jw FROM (SELECT id_a, id_b, jw,
             |    row_number() OVER (PARTITION BY id_a
             |      ORDER BY jw DESC, id_b) AS rk FROM pr)
             |  WHERE rk = 1)
             |SELECT l.id_a, l.id_b,
             |  round(l.jw * 1000000.0) / 1000000.0 AS jw
             |FROM best l JOIN best r ON l.id_a = r.id_b
             |  AND l.id_b = r.id_a
             |WHERE l.id_a < l.id_b
             |ORDER BY l.id_a, l.id_b""".stripMargin)),

    // ---- Retention half-life: pool q125's cohort curves into r(k) =
    // active-at-offset-k / observable-cohort-size (cohorts censored at
    // the data edge are EXCLUDED per offset, not silently diluted),
    // then ln-OLS over k ≥ 1 gives the decay rate and half-life
    // −ln2/λ — the one-number summary of the retention table. DAILY
    // periods (weekly is degenerate on this corpus: every user is
    // active every week, r ≡ 1, slope exactly 0); a flat curve still
    // yields slope 0, so the half-life is guarded to NULL. Exact count
    // ratios; the OLS runs over calendar-bounded offset points.
    Q("q384_retention_halflife",
      (s, d) => {
        val pNs = 86400000000000L
        val e = Tables.events(s, d)
          .select(col("user_id"), expr(s"ts div $pNs").as("p"))
        val first = e.groupBy("user_id").agg(min(col("p")).as("cohort"))
        val active = e.distinct()
        val maxP = e.agg(max(col("p")).as("mx"))
        val curve = first.join(active, "user_id")
          .join(broadcast(maxP))
          .select((col("p") - col("cohort")).as("k"), col("cohort"),
            col("mx"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val byK = curve.groupBy("k").agg(
            count(lit(1)).as("users"), max(col("mx")).as("mx"))
        val size0 = curve.where(col("k") === 0)
          .groupBy("cohort").agg(count(lit(1)).as("c0"),
            max(col("mx")).as("mx2"))
        // observable cohort mass at offset k: cohorts with cohort+k<=mx
        val obs = size0.crossJoin(
            broadcast(byK.select(col("k").as("kk"))))
          .where(col("cohort") + col("kk") <= col("mx2"))
          .groupBy("kk").agg(sum(col("c0")).as("base"))
        val r = byK.join(obs, col("k") === col("kk"))
          .select(col("k").cast("long").as("k"),
            col("users").cast("long").as("users"),
            col("base").cast("long").as("base"),
            (dd(col("users")) / dd(col("base"))).as("r"))
        val pts = r.where(col("k") >= 1)
          .select(dd(col("k")).as("x"), log(col("r")).as("y"))
        val ols = pts.agg(count(lit(1)).cast("long").as("m"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        val slope = (dd(col("m")) * col("sxy") - col("sx") * col("sy")) /
          (dd(col("m")) * col("sxx") - col("sx") * col("sx"))
        ols.select(col("m").as("n_offsets"),
          (round(slope * 1000000.0) / 1000000.0).as("lambda"),
          when(slope < 0,
            round(-log(lit(2.0)) / slope * 10000.0) / 10000.0)
            .as("halflife_days"))
      },
      Some("""WITH e AS (SELECT DISTINCT user_id,
             |    epoch_ns(ts) // 86400000000000 AS p FROM events),
             |first AS (SELECT user_id, min(p) AS cohort FROM e
             |  GROUP BY user_id),
             |mx AS (SELECT max(p) AS mx FROM e),
             |cv AS (SELECT p - cohort AS k, cohort
             |  FROM first JOIN e USING (user_id)),
             |byk AS (SELECT k, count(*) AS users FROM cv GROUP BY k),
             |s0 AS (SELECT cohort, count(*) AS c0 FROM cv WHERE k = 0
             |  GROUP BY cohort),
             |ob AS (SELECT byk.k AS kk, sum(c0) AS base
             |  FROM s0 CROSS JOIN mx JOIN byk ON s0.cohort + byk.k <= mx.mx
             |  GROUP BY byk.k),
             |r AS (SELECT byk.k, CAST(users AS DOUBLE)
             |    / CAST(base AS DOUBLE) AS r
             |  FROM byk JOIN ob ON byk.k = ob.kk),
             |pts AS (SELECT CAST(k AS DOUBLE) AS x, ln(r) AS y FROM r
             |  WHERE k >= 1),
             |ols AS (SELECT CAST(count(*) AS BIGINT) AS m,
             |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             |    sum(x * y) AS sxy
             |  FROM pts)
             |SELECT m AS n_offsets,
             |  round((CAST(m AS DOUBLE) * sxy - sx * sy)
             |    / (CAST(m AS DOUBLE) * sxx - sx * sx) * 1000000.0)
             |    / 1000000.0 AS lambda,
             |  CASE WHEN (CAST(m AS DOUBLE) * sxy - sx * sy)
             |      / (CAST(m AS DOUBLE) * sxx - sx * sx) < 0 THEN
             |    round(-ln(2.0) / ((CAST(m AS DOUBLE) * sxy - sx * sy)
             |      / (CAST(m AS DOUBLE) * sxx - sx * sx)) * 10000.0)
             |      / 10000.0 END AS halflife_days
             |FROM ols""".stripMargin)),

    // ---- Local Outlier Factor (k=5) over the q321 bounded audit
    // prefix (vec_id < 100): squared distances stay exact integer
    // zip-folds of the 1e-4-quantized vectors, k-distance / kNN come
    // from exact rank windows, and reachability max commutes with the
    // final sqrt — only the 5-term lrd folds are doubles. Output is
    // ALL prefix rows ordered by id (never by a float), so no double
    // ordering can drift. The density-relative outlier score q349's
    // global Mahalanobis cannot express.
    Q("q385_lof",
      (s, d) => {
        val q = t(s, d, "embeddings").where(col("vec_id") < 100)
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) " +
              "* 10000.0) AS LONG))").as("q")).localCheckpoint()
        val pairs = q.select(col("vec_id").as("ia"), col("q").as("qa"))
          .join(q.select(col("vec_id").as("ib"), col("q").as("qb")),
            col("ia") =!= col("ib"))
          .select(col("ia"), col("ib"),
            expr("aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y))" +
              ", 0L, (acc, v) -> acc + v)").as("d2"))
          .localCheckpoint()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("ia").orderBy(col("d2"), col("ib"))
        val ranked = pairs.withColumn("rk", row_number().over(w))
        val kd = ranked.where(col("rk") === 5)
          .select(col("ia").as("kda"), col("d2").as("kd2"))
        val knn = ranked.where(col("rk") <= 5)
          .join(kd.select(col("kda").as("ib2"), col("kd2").as("kd2b")),
            col("ib") === col("ib2"))
          .select(col("ia"), col("ib"),
            sqrt(greatest(col("d2"), col("kd2b")).cast("double"))
              .as("reach"))
        val lrd = knn.groupBy("ia")
          .agg((lit(5.0) / sum(col("reach"))).as("lrd"))
        val lof = knn.select(col("ia"), col("ib"))
          .join(lrd.select(col("ia").as("ja"), col("lrd").as("lrd_n")),
            col("ib") === col("ja"))
          .groupBy("ia").agg((sum(col("lrd_n")) / 5.0).as("avg_lrd_n"))
          .join(lrd, "ia")
          .join(kd, col("ia") === col("kda"))
        lof.select(col("ia").as("vec_id"),
            (round(sqrt(col("kd2").cast("double")) / 10000.0 * 10000.0)
              / 10000.0).as("k_dist"),
            (round(col("lrd") * 10000.0 * 1000000.0) / 1000000.0)
              .as("lrd_scaled"),
            (round(col("avg_lrd_n") / col("lrd") * 10000.0) / 10000.0)
              .as("lof"))
          .orderBy("vec_id")
      },
      Some("""WITH q AS (SELECT vec_id,
             |    [CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)
             |     for x in embedding] AS q
             |  FROM embeddings WHERE vec_id < 100),
             |pr AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             |    CAST(list_sum([(a.q[i] - b.q[i]) * (a.q[i] - b.q[i])
             |      for i in range(1, 65)]) AS BIGINT) AS d2
             |  FROM q a JOIN q b ON a.vec_id <> b.vec_id),
             |rk AS (SELECT ia, ib, d2, row_number() OVER (PARTITION BY ia
             |    ORDER BY d2, ib) AS rk FROM pr),
             |kd AS (SELECT ia AS kda, d2 AS kd2 FROM rk WHERE rk = 5),
             |knn AS (SELECT rk.ia, rk.ib,
             |    sqrt(CAST(greatest(rk.d2, kd.kd2) AS DOUBLE)) AS reach
             |  FROM rk JOIN kd ON rk.ib = kd.kda WHERE rk.rk <= 5),
             |lrd AS (SELECT ia, 5.0 / sum(reach) AS lrd FROM knn
             |  GROUP BY ia),
             |ln2 AS (SELECT knn.ia, sum(nb.lrd) / 5.0 AS avg_lrd_n
             |  FROM knn JOIN lrd nb ON knn.ib = nb.ia GROUP BY knn.ia)
             |SELECT lrd.ia AS vec_id,
             |  round(sqrt(CAST(kd.kd2 AS DOUBLE)) / 10000.0 * 10000.0)
             |    / 10000.0 AS k_dist,
             |  round(lrd.lrd * 10000.0 * 1000000.0) / 1000000.0
             |    AS lrd_scaled,
             |  round(ln2.avg_lrd_n / lrd.lrd * 10000.0) / 10000.0 AS lof
             |FROM lrd JOIN ln2 ON lrd.ia = ln2.ia
             |  JOIN kd ON lrd.ia = kd.kda
             |ORDER BY vec_id""".stripMargin)),

    // ---- Split-conformal prediction interval for order prices: the
    // hash-half calibration set's mean is the predictor, its 90%
    // nearest-rank absolute residual is the radius, and the held-out
    // half's EXACT coverage is the guarantee check. Residual ranking
    // and the coverage comparison run entirely on the exact integer
    // |x·N − S| scale (q361's trick) — the whole query is
    // integer-exact until the two display divisions.
    Q("q386_split_conformal",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = t(s, d, "orders").select(col("o_orderkey"),
          round(col("o_totalprice") * 100.0).cast("long").as("x"),
          (pmod(graft.expressions.PortableHash.md5Hash60(
            concat(lit("cal#"), col("o_orderkey").cast("string"))),
            lit(2L)) === 0L).as("is_cal")).localCheckpoint()
        val m = base.where(col("is_cal")).agg(
          count(lit(1)).cast(dec).as("nc"), sum(col("x")).cast(dec).as("sc"))
        val dev = base.join(broadcast(m))
          .withColumn("ad", abs(col("x").cast(dec) * col("nc") - col("sc")))
        val wr = org.apache.spark.sql.expressions.Window
          .orderBy(col("ad"), col("o_orderkey"))
        val calRanked = dev.where(col("is_cal"))
          .withColumn("rn", row_number().over(wr).cast("long"))
        val qhat = calRanked
          .where(col("rn") === expr(
            "CAST(floor((CAST(nc AS DOUBLE) + 1.0) * 0.9) AS BIGINT) + 1"))
          .select(col("ad").as("qh"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val cov = dev.where(!col("is_cal")).join(broadcast(qhat))
          .agg(count(lit(1)).cast("long").as("n_test"),
            sum(when(col("ad") <= col("qh"), 1L).otherwise(0L))
              .cast("long").as("covered"),
            max(col("nc")).as("nc"), max(col("sc")).as("sc"),
            max(col("qh")).as("qh"))
        cov.select(col("nc").cast("long").as("n_cal"), col("n_test"),
          (round(dd(col("sc")) / dd(col("nc"))) / 100.0).as("center"),
          (round(dd(col("qh")) / dd(col("nc"))) / 100.0).as("radius"),
          (round(col("covered").cast("double")
            / col("n_test").cast("double") * 1000000.0) / 1000000.0)
            .as("coverage"))
      },
      Some("""WITH b AS (SELECT o_orderkey,
             |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS x,
             |    CAST(('0x' || substr(md5('cal#'
             |      || CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
             |      % 2 = 0 AS is_cal
             |  FROM orders),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS nc,
             |    CAST(sum(x) AS HUGEINT) AS sc FROM b WHERE is_cal),
             |dv AS (SELECT o_orderkey, x, is_cal,
             |    abs(CAST(x AS HUGEINT) * nc - sc) AS ad, nc, sc
             |  FROM b CROSS JOIN m),
             |cr AS (SELECT ad, nc,
             |    CAST(row_number() OVER (ORDER BY ad, o_orderkey)
             |      AS BIGINT) AS rn
             |  FROM dv WHERE is_cal),
             |qh AS (SELECT ad AS qh FROM cr
             |  WHERE rn = CAST(floor((CAST(nc AS DOUBLE) + 1.0) * 0.9)
             |    AS BIGINT) + 1),
             |cv AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
             |    CAST(sum(CASE WHEN ad <= qh THEN 1 ELSE 0 END) AS BIGINT)
             |      AS covered,
             |    max(nc) AS nc, max(sc) AS sc, max(qh) AS qh
             |  FROM dv CROSS JOIN qh WHERE NOT is_cal)
             |SELECT CAST(nc AS BIGINT) AS n_cal, n_test,
             |  round(CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)) / 100.0
             |    AS center,
             |  round(CAST(qh AS DOUBLE) / CAST(nc AS DOUBLE)) / 100.0
             |    AS radius,
             |  round(CAST(covered AS DOUBLE) / CAST(n_test AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS coverage
             |FROM cv""".stripMargin)),

    // ---- Wilcoxon signed-rank test: did per-user activity change
    // between the first and second half of the observation window? The
    // PAIRED nonparametric complement to q257 (Mann-Whitney, unpaired):
    // zero differences dropped, |d| ranked with average ties in exact
    // 2× units (the q309/q352 convention), z from the closed-form null
    // moments — everything integer until the final chain. One user
    // fold, one |d| rank window.
    Q("q387_wilcoxon_signed",
      (s, d) => {
        val ev = Tables.events(s, d)
        val mid = ev.agg(((min(expr("ts div 86400000000000"))
          + max(expr("ts div 86400000000000"))) / 2).cast("long")
          .as("mid"))
        val ux = ev.select(col("user_id"),
            expr("ts div 86400000000000").as("day"))
          .join(broadcast(mid))
          .groupBy("user_id").agg(
            sum(when(col("day") <= col("mid"), 1L).otherwise(0L)).as("x"),
            sum(when(col("day") > col("mid"), 1L).otherwise(0L)).as("y"))
          .select((col("y") - col("x")).as("dd"))
          .where(col("dd") =!= 0)
        val wAbs = org.apache.spark.sql.expressions.Window
          .orderBy(abs(col("dd")))
        val ties = org.apache.spark.sql.expressions.Window
          .partitionBy(abs(col("dd")))
        val ranked = ux.withColumn("r2",
          lit(2L) * rank().over(wAbs) + count(lit(1)).over(ties) - 1L)
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val ag = ranked.agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("dd") > 0, col("r2")).otherwise(0L)).cast("long")
            .as("w2p"),
          sum(when(col("dd") < 0, col("r2")).otherwise(0L)).cast("long")
            .as("w2m"))
        val n = db(col("n"))
        val wp = db(col("w2p")) / 2.0
        val mu = n * (n + 1.0) / 4.0
        val sd = sqrt(n * (n + 1.0) * (lit(2.0) * n + 1.0) / 24.0)
        ag.select(col("n").as("n_nonzero"),
          (db(col("w2p")) / 2.0).as("w_plus"),
          (db(col("w2m")) / 2.0).as("w_minus"),
          (round((wp - mu) / sd * 1000000.0) / 1000000.0).as("z"))
      },
      Some("""WITH e AS (SELECT user_id,
             |    epoch_ns(ts) // 86400000000000 AS day FROM events),
             |md AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
             |ux AS (SELECT
             |    sum(CASE WHEN day > mid THEN 1 ELSE 0 END)
             |      - sum(CASE WHEN day <= mid THEN 1 ELSE 0 END) AS dd
             |  FROM e CROSS JOIN md GROUP BY user_id),
             |nz AS (SELECT dd FROM ux WHERE dd <> 0),
             |rk AS (SELECT dd, 2 * rank() OVER (ORDER BY abs(dd))
             |    + count(*) OVER (PARTITION BY abs(dd)) - 1 AS r2
             |  FROM nz),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN dd > 0 THEN r2 ELSE 0 END) AS BIGINT)
             |      AS w2p,
             |    CAST(sum(CASE WHEN dd < 0 THEN r2 ELSE 0 END) AS BIGINT)
             |      AS w2m
             |  FROM rk)
             |SELECT n AS n_nonzero,
             |  CAST(w2p AS DOUBLE) / 2.0 AS w_plus,
             |  CAST(w2m AS DOUBLE) / 2.0 AS w_minus,
             |  round((CAST(w2p AS DOUBLE) / 2.0
             |    - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
             |    / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
             |      * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0)
             |    * 1000000.0) / 1000000.0 AS z
             |FROM ag""".stripMargin)),

    // ---- Weekday-adjusted Durbin-Watson: q344's serial-correlation
    // statistic on the DESEASONALIZED series. Over complete weeks every
    // weekday has the same count n_w, so the residual scales to the
    // EXACT integer Eₜ = cₜ·n_w − S_wd(t) (common denominator cancels
    // in the ratio) — the whole statistic is integer algebra with one
    // division, answering "is the autocorrelation real or just the
    // weekly cycle q344 conflates".
    Q("q388_deseasonalized_dw",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d))
          .select(col("day"), col("c"), expr("day div 7").as("week"),
            pmod(col("day"), lit(7L)).as("wd"))
        val full = dense.groupBy("week").agg(count(lit(1)).as("nd"))
          .where(col("nd") === 7).select("week")
        val kept = dense.join(broadcast(full), "week").localCheckpoint()
        val wdSum = kept.groupBy("wd").agg(sum(col("c")).as("s_wd"),
          count(lit(1)).as("n_w"))
        val e = kept.join(broadcast(wdSum), "wd")
          .select(col("day"),
            (col("c").cast(dec) * col("n_w").cast(dec)
              - col("s_wd").cast(dec)).as("e"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        val lagged = e.withColumn("pe", lag(col("e"), 1).over(w))
        val ag = lagged.agg(count(lit(1)).cast("long").as("n_days"),
          sum(col("e") * col("e")).as("den"),
          sum(when(col("pe").isNotNull,
            (col("e") - col("pe")) * (col("e") - col("pe")))
            .otherwise(lit(0L).cast(dec))).as("num"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        ag.select(col("n_days"),
            (round(db(col("num")) / db(col("den")) * 1000000.0)
              / 1000000.0).as("dw_adj"))
          .select(col("n_days"), col("dw_adj"),
            (round((lit(1.0) - col("dw_adj") / 2.0) * 1000000.0)
              / 1000000.0).as("rho_adj"))
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |wd AS (SELECT day, c, day // 7 AS week, day % 7 AS wdy
             |  FROM dn),
             |fw AS (SELECT week FROM wd GROUP BY week
             |  HAVING count(*) = 7),
             |kp AS (SELECT day, c, wdy FROM wd
             |  JOIN fw ON wd.week = fw.week),
             |ws AS (SELECT wdy, CAST(sum(c) AS HUGEINT) AS s_wd,
             |    CAST(count(*) AS HUGEINT) AS n_w FROM kp GROUP BY wdy),
             |e AS (SELECT day, CAST(c AS HUGEINT) * n_w - s_wd AS e
             |  FROM kp JOIN ws ON kp.wdy = ws.wdy),
             |lg AS (SELECT e, lag(e) OVER (ORDER BY day) AS pe FROM e),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
             |    sum(e * e) AS den,
             |    sum(CASE WHEN pe IS NOT NULL THEN (e - pe) * (e - pe)
             |      ELSE CAST(0 AS HUGEINT) END) AS num
             |  FROM lg)
             |SELECT n_days,
             |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS dw_adj,
             |  round((1.0 - (round(CAST(num AS DOUBLE)
             |    / CAST(den AS DOUBLE) * 1000000.0) / 1000000.0) / 2.0)
             |    * 1000000.0) / 1000000.0 AS rho_adj
             |FROM ag""".stripMargin)),

    // ---- Records test for trend: count of strict record-high days in
    // the dense series vs the iid null E = H_n, Var = H_n − H_n⁽²⁾ —
    // records accumulate like ln n under exchangeability, so an excess
    // says trend (the distribution-free cousin of q319's Mann-Kendall).
    // Each harmonic term is 1e-12-quantized into an exact fold; the
    // record flags come from a strict running max.
    Q("q389_records_test",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d)).localCheckpoint()
        val prior = org.apache.spark.sql.expressions.Window.orderBy("day")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val recs = dense.withColumn("pm", max(col("c")).over(prior))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("pm").isNull || col("c") > col("pm"), 1L)
              .otherwise(0L)).cast("long").as("n_records"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val harm = recs.join(
          dense.select(row_number().over(
              org.apache.spark.sql.expressions.Window.orderBy("day"))
              .cast("long").as("k"))
            .agg(
              sum(round(lit(1.0e12) / col("k").cast("double")).cast(dec))
                .as("h1"),
              sum(round(lit(1.0e12) / (col("k") * col("k")).cast("double"))
                .cast(dec)).as("h2")))
        harm.select(col("n").as("n_days"), col("n_records"),
          (round(db(col("h1")) / 1.0e12 * 10000.0) / 10000.0)
            .as("expected"),
          (round((col("n_records").cast("double")
            - db(col("h1")) / 1.0e12)
            / sqrt(db(col("h1")) / 1.0e12 - db(col("h2")) / 1.0e12)
            * 10000.0) / 10000.0).as("z"))
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |rc AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN pm IS NULL OR c > pm THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_records
             |  FROM (SELECT c, max(c) OVER (ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
             |    FROM dn)),
             |hm AS (SELECT
             |    sum(CAST(round(1000000000000.0 / CAST(k AS DOUBLE))
             |      AS HUGEINT)) AS h1,
             |    sum(CAST(round(1000000000000.0
             |      / CAST(k * k AS DOUBLE)) AS HUGEINT)) AS h2
             |  FROM (SELECT CAST(row_number() OVER (ORDER BY day)
             |      AS BIGINT) AS k FROM dn))
             |SELECT n AS n_days, n_records,
             |  round(CAST(h1 AS DOUBLE) / 1000000000000.0 * 10000.0)
             |    / 10000.0 AS expected,
             |  round((CAST(n_records AS DOUBLE)
             |    - CAST(h1 AS DOUBLE) / 1000000000000.0)
             |    / sqrt(CAST(h1 AS DOUBLE) / 1000000000000.0
             |      - CAST(h2 AS DOUBLE) / 1000000000000.0) * 10000.0)
             |    / 10000.0 AS z
             |FROM rc CROSS JOIN hm""".stripMargin)),

    // ---- Lead/lag cross-correlation between the view and purchase
    // daily series at lags −7..+7: does one series LEAD the other
    // (positive-lag peak), the question q203's single-series ACF can't
    // ask. Per-type counts are zero-filled onto the dense day domain;
    // per-lag Pearson r comes from exact decimal38 moment sums over the
    // overlapping pairs — calendar-sized tables throughout.
    Q("q390_cross_correlation",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ev = Tables.events(s, d)
        val dom = graft.operators.EventOps.dailyCountsDense(ev)
          .select("day")
        def series(tp: String, nm: String) = ev
          .where(col("event_type") === tp)
          .select(expr("ts div 86400000000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as(nm))
        val ser = dom
          .join(series("view", "x"), Seq("day"), "left")
          .join(series("purchase", "y"), Seq("day"), "left")
          .select(col("day"), coalesce(col("x"), lit(0L)).as("x"),
            coalesce(col("y"), lit(0L)).as("y")).localCheckpoint()
        val lagged = ser.select(col("day"), col("x"),
            explode(sequence(lit(-7), lit(7))).as("lag"))
          .join(ser.select(col("day").as("d2"), col("y").as("y2")),
            col("d2") === col("day") + col("lag"))
        def dc(c: org.apache.spark.sql.Column) = c.cast(dec)
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        lagged.groupBy("lag").agg(
            count(lit(1)).cast(dec).as("n"),
            sum(col("x")).cast(dec).as("sx"),
            sum(col("y2")).cast(dec).as("sy"),
            sum(dc(col("x")) * dc(col("x"))).as("sxx"),
            sum(dc(col("y2")) * dc(col("y2"))).as("syy"),
            sum(dc(col("x")) * dc(col("y2"))).as("sxy"))
          .select(col("lag").cast("long").as("lag"),
            col("n").cast("long").as("n_pairs"),
            (round((db(col("n")) * db(col("sxy"))
              - db(col("sx")) * db(col("sy")))
              / sqrt((db(col("n")) * db(col("sxx"))
                - db(col("sx")) * db(col("sx")))
                * (db(col("n")) * db(col("syy"))
                - db(col("sy")) * db(col("sy")))) * 1000000.0)
              / 1000000.0).as("ccf"))
          .orderBy("lag")
      },
      Some("""WITH e AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             |    event_type FROM events),
             |c AS (SELECT day, count(*) AS c FROM e GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dom AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b),
             |xv AS (SELECT day, count(*) AS x FROM e
             |  WHERE event_type = 'view' GROUP BY 1),
             |yv AS (SELECT day, count(*) AS y FROM e
             |  WHERE event_type = 'purchase' GROUP BY 1),
             |ser AS (SELECT dom.day, coalesce(x, 0) AS x,
             |    coalesce(y, 0) AS y
             |  FROM dom LEFT JOIN xv ON dom.day = xv.day
             |  LEFT JOIN yv ON dom.day = yv.day),
             |lg AS (SELECT l.lag, a.x AS x, bb.y AS y2
             |  FROM ser a CROSS JOIN
             |    (SELECT unnest(generate_series(-7, 7)) AS lag) l
             |  JOIN ser bb ON bb.day = a.day + l.lag)
             |SELECT CAST(lag AS BIGINT) AS lag,
             |  CAST(count(*) AS BIGINT) AS n_pairs,
             |  round((CAST(count(*) AS DOUBLE)
             |      * CAST(sum(CAST(x AS HUGEINT) * CAST(y2 AS HUGEINT))
             |        AS DOUBLE)
             |    - CAST(CAST(sum(x) AS HUGEINT) AS DOUBLE)
             |      * CAST(CAST(sum(y2) AS HUGEINT) AS DOUBLE))
             |    / sqrt((CAST(count(*) AS DOUBLE)
             |      * CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
             |        AS DOUBLE)
             |      - CAST(CAST(sum(x) AS HUGEINT) AS DOUBLE)
             |        * CAST(CAST(sum(x) AS HUGEINT) AS DOUBLE))
             |      * (CAST(count(*) AS DOUBLE)
             |      * CAST(sum(CAST(y2 AS HUGEINT) * CAST(y2 AS HUGEINT))
             |        AS DOUBLE)
             |      - CAST(CAST(sum(y2) AS HUGEINT) AS DOUBLE)
             |        * CAST(CAST(sum(y2) AS HUGEINT) AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS ccf
             |FROM lg GROUP BY lag ORDER BY lag""".stripMargin)),

    // ---- Audience-overlap matrix: Jaccard of the user sets behind
    // every event-type pair — the "are these the same people" report
    // that decides whether two surfaces can share an experiment. Exact
    // distinct sets, one (type, user) dedup shuffle, type²-sized join.
    Q("q391_audience_overlap",
      (s, d) => {
        val tu = Tables.events(s, d)
          .select(col("event_type").as("t"), col("user_id")).distinct()
          .localCheckpoint()
        val sizes = tu.groupBy("t").agg(count(lit(1)).as("nu"))
        val inter = tu.select(col("t").as("ta"), col("user_id"))
          .join(tu.select(col("t").as("tb"), col("user_id").as("ub")),
            col("user_id") === col("ub") && col("ta") < col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("inter"))
        inter
          .join(broadcast(sizes.select(col("t").as("ta"),
            col("nu").as("na"))), "ta")
          .join(broadcast(sizes.select(col("t").as("tb"),
            col("nu").as("nb"))), "tb")
          .select(col("ta"), col("tb"),
            col("na").cast("long").as("n_a"),
            col("nb").cast("long").as("n_b"),
            col("inter").cast("long").as("n_both"),
            (round(col("inter").cast("double")
              / (col("na") + col("nb") - col("inter")).cast("double")
              * 1000000.0) / 1000000.0).as("jaccard"))
          .orderBy("ta", "tb")
      },
      Some("""WITH tu AS (SELECT DISTINCT event_type AS t, user_id
             |  FROM events),
             |sz AS (SELECT t, count(*) AS nu FROM tu GROUP BY 1),
             |iv AS (SELECT a.t AS ta, b.t AS tb, count(*) AS inter
             |  FROM tu a JOIN tu b ON a.user_id = b.user_id
             |    AND a.t < b.t
             |  GROUP BY 1, 2)
             |SELECT ta, tb, CAST(na.nu AS BIGINT) AS n_a,
             |  CAST(nb.nu AS BIGINT) AS n_b,
             |  CAST(inter AS BIGINT) AS n_both,
             |  round(CAST(inter AS DOUBLE)
             |    / CAST(na.nu + nb.nu - inter AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS jaccard
             |FROM iv JOIN sz na ON iv.ta = na.t
             |  JOIN sz nb ON iv.tb = nb.t
             |ORDER BY ta, tb""".stripMargin)),

    // ---- Harmonic centrality over the nation-trade graph: Σ 1/d(u,v)
    // truncated at the q293 depth — the closeness variant that stays
    // finite on disconnected graphs (unreachable pairs add 0). Shares
    // q293's all-pairs BFS level stream (refactored into
    // GraphOps.bfsLevelStream); level counts exact, ≤6-term fold.
    Q("q392_harmonic_centrality",
      (s, d) => graft.operators.GraphOps
        .harmonicCentrality(tradeEdges(s, d), depth = 6).orderBy("node"),
      Some {
        val fwd = (1 to 6).map { r =>
          s"""f$r AS MATERIALIZED (SELECT DISTINCT f.s, e.v AS node
             |  FROM f${r - 1} f JOIN sym e ON e.u = f.node
             |  WHERE NOT EXISTS (SELECT 1 FROM vis${r - 1} x
             |    WHERE x.s = f.s AND x.node = e.v)),
             |vis$r AS MATERIALIZED (SELECT s, node FROM vis${r - 1}
             |  UNION ALL SELECT s, node FROM f$r)""".stripMargin
        }.mkString(",\n")
        val lv = (1 to 6).map(r =>
          s"SELECT s, CAST($r AS BIGINT) AS lev FROM f$r")
          .mkString("\nUNION ALL ")
        s"""WITH $tradeEdgeCtes,
           |sym AS MATERIALIZED (SELECT a AS u, b AS v FROM ed
           |  UNION ALL SELECT b, a FROM ed),
           |nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym),
           |f0 AS MATERIALIZED (SELECT node AS s, node FROM nodes),
           |vis0 AS MATERIALIZED (SELECT s, node FROM f0),
           |$fwd,
           |lv AS ($lv),
           |lc AS (SELECT s, lev, count(*) AS cnt FROM lv GROUP BY 1, 2)
           |SELECT s AS node, CAST(sum(cnt) AS BIGINT) AS n_reached_excl,
           |  round(sum(CAST(cnt AS DOUBLE) / CAST(lev AS DOUBLE))
           |    * 1000000.0) / 1000000.0 AS harmonic
           |FROM lc GROUP BY s ORDER BY node""".stripMargin
      }),

    // ---- Hub-removal resilience: component structure of the trade
    // graph BEFORE vs AFTER deleting the top-3 degree hubs — does the
    // network shatter or reroute, the attack-surface audit for any
    // dependency graph. Components via the q71 pointer-jumping min-
    // label machinery (string labels compare lexicographically on both
    // engines); edge-less survivors counted as singleton components.
    Q("q393_attack_resilience",
      (s, d) => {
        val ed = tradeEdges(s, d).select(col("src"), col("dst"))
          .localCheckpoint()
        val deg = ed.select(col("src").as("n"), col("dst").as("m"))
          .union(ed.select(col("dst"), col("src")))
          .distinct().groupBy("n").agg(count(lit(1)).as("deg"))
        val top3 = deg.orderBy(col("deg").desc, col("n")).limit(3)
          .select(col("n").as("hub"))
        def summarize(edges: org.apache.spark.sql.DataFrame,
            nNodes: org.apache.spark.sql.DataFrame, phase: String) = {
          val cc = graft.operators.Dedup.duplicateClusters(
            edges.select(col("src").as("id_a"), col("dst").as("id_b")))
          val sizes = cc.groupBy("cluster").agg(count(lit(1)).as("sz"))
          sizes.agg(count(lit(1)).as("n_edge_comps"),
              max(col("sz")).as("largest"),
              sum(col("sz")).as("covered"))
            .join(broadcast(nNodes))
            .select(lit(phase).as("phase"),
              col("nn").cast("long").as("n_nodes"),
              (col("n_edge_comps") + (col("nn") - col("covered")))
                .cast("long").as("n_components"),
              col("largest").cast("long").as("largest"))
        }
        val allNodes = ed.select(col("src").as("x"))
          .union(ed.select(col("dst"))).distinct()
        val nAll = allNodes.agg(count(lit(1)).as("nn"))
        val kept = ed.join(top3, col("src") === col("hub"), "left_anti")
          .join(top3, col("dst") === col("hub"), "left_anti")
          .localCheckpoint()
        val nAfter = allNodes.join(top3, col("x") === col("hub"),
          "left_anti").agg(count(lit(1)).as("nn"))
        summarize(ed, nAll, "before")
          .unionAll(summarize(kept, nAfter, "after"))
          .orderBy("phase")
      },
      Some(s"""WITH RECURSIVE $tradeEdgeCtes,
              |deg AS (SELECT n, count(*) AS deg FROM (
              |    SELECT a AS n, b AS m FROM ed
              |    UNION SELECT b, a FROM ed) GROUP BY n),
              |top3 AS (SELECT n AS hub FROM deg
              |  ORDER BY deg DESC, n LIMIT 3),
              |nodes AS (SELECT DISTINCT n AS x FROM (
              |  SELECT a AS n FROM ed UNION SELECT b FROM ed)),
              |kept AS (SELECT a, b FROM ed
              |  WHERE a NOT IN (SELECT hub FROM top3)
              |    AND b NOT IN (SELECT hub FROM top3)),
              |eb AS (SELECT a AS u, b AS v FROM ed
              |  UNION SELECT b, a FROM ed),
              |rb AS (SELECT u AS src, u AS dst FROM eb
              |  UNION SELECT r.src, e.v FROM rb r JOIN eb e
              |    ON r.dst = e.u),
              |ccb AS (SELECT src, min(dst) AS cluster FROM rb
              |  GROUP BY src),
              |szb AS (SELECT cluster, count(*) AS sz FROM ccb
              |  GROUP BY cluster),
              |sb AS (SELECT count(*) AS n_edge_comps, max(sz) AS largest,
              |    sum(sz) AS covered FROM szb),
              |ea AS (SELECT a AS u, b AS v FROM kept
              |  UNION SELECT b, a FROM kept),
              |ra AS (SELECT u AS src, u AS dst FROM ea
              |  UNION SELECT r.src, e.v FROM ra r JOIN ea e
              |    ON r.dst = e.u),
              |cca AS (SELECT src, min(dst) AS cluster FROM ra
              |  GROUP BY src),
              |sza AS (SELECT cluster, count(*) AS sz FROM cca
              |  GROUP BY cluster),
              |sa AS (SELECT count(*) AS n_edge_comps, max(sz) AS largest,
              |    sum(sz) AS covered FROM sza),
              |nb AS (SELECT count(*) AS nn FROM nodes),
              |na AS (SELECT count(*) AS nn FROM nodes
              |  WHERE x NOT IN (SELECT hub FROM top3))
              |SELECT * FROM (
              |  SELECT 'before' AS phase, CAST(nn AS BIGINT) AS n_nodes,
              |    CAST(n_edge_comps + (nn - covered) AS BIGINT)
              |      AS n_components,
              |    CAST(largest AS BIGINT) AS largest
              |  FROM sb CROSS JOIN nb
              |  UNION ALL
              |  SELECT 'after', CAST(nn AS BIGINT),
              |    CAST(n_edge_comps + (nn - covered) AS BIGINT),
              |    CAST(largest AS BIGINT)
              |  FROM sa CROSS JOIN na)
              |ORDER BY phase""".stripMargin)),

    // ---- Difference-in-differences: treated (odd users) vs control
    // across the two halves of the window, with the per-user-delta CI
    // — the parallel-trends causal estimate a raw q188-style z-test
    // cannot give. User×period cells are zero-filled (absent users
    // count 0, not missing); all moments exact decimal38; one user
    // fold.
    Q("q394_diff_in_diff",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ev = Tables.events(s, d)
        val mid = ev.agg(((min(expr("ts div 86400000000000"))
          + max(expr("ts div 86400000000000"))) / 2).cast("long").as("mid"))
        val ux = ev.select(col("user_id"),
            expr("ts div 86400000000000").as("day"))
          .join(broadcast(mid))
          .groupBy("user_id").agg(
            sum(when(col("day") <= col("mid"), 1L).otherwise(0L)).as("y1"),
            sum(when(col("day") > col("mid"), 1L).otherwise(0L)).as("y2"))
          .select(pmod(col("user_id"), lit(2L)).as("g"),
            (col("y2") - col("y1")).as("dd"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val m = ux.groupBy("g").agg(count(lit(1)).cast(dec).as("n"),
          sum(col("dd")).cast(dec).as("sd"),
          sum(col("dd").cast(dec) * col("dd").cast(dec)).as("sdd"))
        val wide = m.agg(
          max(when(col("g") === 1, col("n"))).as("n1"),
          max(when(col("g") === 1, col("sd"))).as("s1"),
          max(when(col("g") === 1, col("sdd"))).as("q1"),
          max(when(col("g") === 0, col("n"))).as("n0"),
          max(when(col("g") === 0, col("sd"))).as("s0"),
          max(when(col("g") === 0, col("sdd"))).as("q0"))
        val d1 = db(col("s1")) / db(col("n1"))
        val d0 = db(col("s0")) / db(col("n0"))
        val v1 = (db(col("q1")) - db(col("s1")) * db(col("s1"))
          / db(col("n1"))) / (db(col("n1")) - 1.0)
        val v0 = (db(col("q0")) - db(col("s0")) * db(col("s0"))
          / db(col("n0"))) / (db(col("n0")) - 1.0)
        val se = sqrt(v1 / db(col("n1")) + v0 / db(col("n0")))
        wide.select(col("n1").cast("long").as("n_treat"),
          col("n0").cast("long").as("n_ctrl"),
          (round(d1 * 1000000.0) / 1000000.0).as("delta_treat"),
          (round(d0 * 1000000.0) / 1000000.0).as("delta_ctrl"),
          (round((d1 - d0) * 1000000.0) / 1000000.0).as("did"),
          (round(se * 1000000.0) / 1000000.0).as("se"),
          (round((d1 - d0 - lit(1.96) * se) * 1000000.0) / 1000000.0)
            .as("ci_lo"),
          (round((d1 - d0 + lit(1.96) * se) * 1000000.0) / 1000000.0)
            .as("ci_hi"))
      },
      Some("""WITH e AS (SELECT user_id,
             |    epoch_ns(ts) // 86400000000000 AS day FROM events),
             |md AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
             |ux AS (SELECT user_id % 2 AS g,
             |    sum(CASE WHEN day > mid THEN 1 ELSE 0 END)
             |      - sum(CASE WHEN day <= mid THEN 1 ELSE 0 END) AS dd
             |  FROM e CROSS JOIN md GROUP BY user_id),
             |m AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(dd) AS HUGEINT) AS sd,
             |    sum(CAST(dd AS HUGEINT) * CAST(dd AS HUGEINT)) AS sdd
             |  FROM ux GROUP BY g),
             |w AS (SELECT
             |    max(CASE WHEN g = 1 THEN n END) AS n1,
             |    max(CASE WHEN g = 1 THEN sd END) AS s1,
             |    max(CASE WHEN g = 1 THEN sdd END) AS q1,
             |    max(CASE WHEN g = 0 THEN n END) AS n0,
             |    max(CASE WHEN g = 0 THEN sd END) AS s0,
             |    max(CASE WHEN g = 0 THEN sdd END) AS q0
             |  FROM m)
             |SELECT CAST(n1 AS BIGINT) AS n_treat,
             |  CAST(n0 AS BIGINT) AS n_ctrl,
             |  round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS delta_treat,
             |  round(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS delta_ctrl,
             |  round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) * 1000000.0)
             |    / 1000000.0 AS did,
             |  round(sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
             |      * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             |      / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
             |    + ((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE)
             |      * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             |      / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE))
             |    * 1000000.0) / 1000000.0 AS se,
             |  round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
             |    - 1.96 * sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
             |      * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             |      / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
             |    + ((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE)
             |      * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             |      / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS ci_lo,
             |  round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
             |    + 1.96 * sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
             |      * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             |      / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
             |    + ((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE)
             |      * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             |      / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS ci_hi
             |FROM w""".stripMargin)),

    // ---- Log-log price elasticity per part type: ε = cov(ln q, ln p)
    // / var(ln p) over line items (unit price = extended/qty) — the
    // econometric demand slope q198's linear OLS can't express. Each
    // ln is 1e-8-quantized into exact decimal type-level sums (the
    // q368 recipe), so per-type slopes are engine-exact; one fact
    // fold with the part dim broadcast.
    Q("q395_price_elasticity",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val li = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_type"),
            round(log(col("l_extendedprice") / col("l_quantity"))
              * 100000000.0).cast(dec).as("lp"),
            round(log(col("l_quantity")) * 100000000.0).cast(dec).as("lq"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        li.groupBy("p_type").agg(count(lit(1)).cast(dec).as("n"),
            sum(col("lp")).as("sp"), sum(col("lq")).as("sq"),
            sum(col("lp") * col("lp")).as("spp"),
            sum(col("lp") * col("lq")).as("spq"))
          .select(col("p_type"), col("n").cast("long").as("n"),
            (round((db(col("n")) * db(col("spq"))
              - db(col("sp")) * db(col("sq")))
              / (db(col("n")) * db(col("spp"))
              - db(col("sp")) * db(col("sp"))) * 1000000.0) / 1000000.0)
              .as("elasticity"))
          .orderBy("p_type")
      },
      Some("""WITH li AS (SELECT p_type,
             |    CAST(round(ln(l_extendedprice / l_quantity)
             |      * 100000000.0) AS HUGEINT) AS lp,
             |    CAST(round(ln(l_quantity) * 100000000.0) AS HUGEINT)
             |      AS lq
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |m AS (SELECT p_type, CAST(count(*) AS HUGEINT) AS n,
             |    sum(lp) AS sp, sum(lq) AS sq, sum(lp * lp) AS spp,
             |    sum(lp * lq) AS spq
             |  FROM li GROUP BY 1)
             |SELECT p_type, CAST(n AS BIGINT) AS n,
             |  round((CAST(n AS DOUBLE) * CAST(spq AS DOUBLE)
             |    - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE))
             |    / (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
             |    - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) * 1000000.0)
             |    / 1000000.0 AS elasticity
             |FROM m ORDER BY p_type""".stripMargin)),

    // ---- Rolling-origin backtest of the seasonal-naive forecaster:
    // four consecutive 7-day evaluation windows walking back from the
    // data edge, each scored independently — the time-series CV that
    // exposes whether q331's single-window MAE was luck. Exact long
    // error sums per fold; one day-domain window pass shared by all
    // folds.
    Q("q396_rolling_origin",
      (s, d) => {
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        val fc = dense.withColumn("f", lag(col("c"), 7).over(w))
          .where(col("f").isNotNull)
        val mx = fc.agg(max(col("day")).as("mx"))
        val folds = fc.join(broadcast(mx))
          .withColumn("fold", expr("(mx - day) div 7") + 1L)
          .where(col("fold") <= 4)
        val dif = col("c") - col("f")
        folds.groupBy("fold").agg(
            count(lit(1)).cast("long").as("n_days"),
            sum(abs(dif)).cast("long").as("sa"),
            sum(dif * dif).cast("long").as("sq"))
          .select(col("fold").cast("long").as("fold"), col("n_days"),
            (round(col("sa").cast("double") / col("n_days").cast("double")
              * 10000.0) / 10000.0).as("mae"),
            (round(sqrt(col("sq").cast("double")
              / col("n_days").cast("double")) * 10000.0) / 10000.0)
              .as("rmse"))
          .orderBy("fold")
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |fc AS (SELECT day, c, lag(c, 7) OVER (ORDER BY day) AS f
             |  FROM dn),
             |fv AS (SELECT * FROM fc WHERE f IS NOT NULL),
             |mx AS (SELECT max(day) AS mx FROM fv),
             |fd AS (SELECT (mx - day) // 7 + 1 AS fold, c, f
             |  FROM fv CROSS JOIN mx)
             |SELECT CAST(fold AS BIGINT) AS fold,
             |  CAST(count(*) AS BIGINT) AS n_days,
             |  round(CAST(sum(abs(c - f)) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) * 10000.0) / 10000.0 AS mae,
             |  round(sqrt(CAST(sum((c - f) * (c - f)) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0 AS rmse
             |FROM fd WHERE fold <= 4 GROUP BY fold ORDER BY fold""".stripMargin)),

    // ---- Mantel-Haenszel pooled odds ratio (the ESTIMATE behind
    // q330's CMH test): OR_MH = Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ) over the segment
    // strata, with per-stratum ORs alongside — cross-product terms are
    // 1e-8-quantized into exact folds. Same one-shuffle shape as q330.
    Q("q397_mh_odds_ratio",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val o = t(s, d, "orders").select(col("o_custkey"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("tr"),
          (col("o_orderstatus") === "F").as("yy"))
        val st = o.join(broadcast(t(s, d, "customer")
              .select("c_custkey", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment").agg(
            sum(when(col("tr") && col("yy"), 1L).otherwise(0L)).as("a"),
            sum(when(col("tr") && !col("yy"), 1L).otherwise(0L)).as("b"),
            sum(when(!col("tr") && col("yy"), 1L).otherwise(0L)).as("c"),
            sum(when(!col("tr") && !col("yy"), 1L).otherwise(0L)).as("dd"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val nk = db(col("a")) + db(col("b")) + db(col("c")) + db(col("dd"))
        val agg = st.agg(count(lit(1)).cast("long").as("n_strata"),
          sum(round(db(col("a")) * db(col("dd")) / nk * 100000000.0)
            .cast(dec)).as("num"),
          sum(round(db(col("b")) * db(col("c")) / nk * 100000000.0)
            .cast(dec)).as("den"))
        agg.select(col("n_strata"),
          (round(db(col("num")) / db(col("den")) * 1000000.0)
            / 1000000.0).as("or_mh"))
      },
      Some("""WITH o AS (SELECT o_custkey,
             |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS tr,
             |    o_orderstatus = 'F' AS yy FROM orders),
             |st AS (SELECT c_mktsegment,
             |    sum(CASE WHEN tr AND yy THEN 1 ELSE 0 END) AS a,
             |    sum(CASE WHEN tr AND NOT yy THEN 1 ELSE 0 END) AS b,
             |    sum(CASE WHEN NOT tr AND yy THEN 1 ELSE 0 END) AS c,
             |    sum(CASE WHEN NOT tr AND NOT yy THEN 1 ELSE 0 END) AS dd
             |  FROM o JOIN customer ON o_custkey = c_custkey GROUP BY 1),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
             |    sum(CAST(round(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
             |      / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)
             |        + CAST(c AS DOUBLE) + CAST(dd AS DOUBLE))
             |      * 100000000.0) AS HUGEINT)) AS num,
             |    sum(CAST(round(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
             |      / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)
             |        + CAST(c AS DOUBLE) + CAST(dd AS DOUBLE))
             |      * 100000000.0) AS HUGEINT)) AS den
             |  FROM st)
             |SELECT n_strata,
             |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS or_mh
             |FROM ag""".stripMargin)),

    // ---- Out-of-vocabulary audit of the q373/q378 hash split: per
    // language, the unigram and bigram OOV rates of the held-out 10%
    // against the train vocabulary — the "will the tokenizer/LM see
    // novel surface forms" report. Exact count ratios; train vocabs are
    // vocabulary-sized anti-join probes.
    Q("q398_oov_rate",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("lang"),
          split(col("text"), " ").as("w"),
          (pmod(graft.expressions.PortableHash.md5Hash60(
            concat(lit("split#"), col("doc_id").cast("string"))),
            lit(10L)) === 0L).as("is_test"))
        val uni = docs.select(col("lang"), col("is_test"),
          explode(col("w")).as("t1")).localCheckpoint()
        val bi = docs.where(size(col("w")) >= 2)
          .select(col("lang"), col("is_test"),
            explode(expr("transform(sequence(1, size(w) - 1), " +
              "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
              .as("t2")).localCheckpoint()
        val uniV = uni.where(!col("is_test")).select("t1").distinct()
        val biV = bi.where(!col("is_test")).select("t2").distinct()
        val uRate = uni.where(col("is_test"))
          .join(uniV.withColumn("known1", lit(true)), Seq("t1"), "left")
          .groupBy("lang").agg(count(lit(1)).as("n_uni"),
            sum(when(col("known1").isNull, 1L).otherwise(0L)).as("oov_uni"))
        val bRate = bi.where(col("is_test"))
          .join(biV.withColumn("known2", lit(true)), Seq("t2"), "left")
          .groupBy("lang").agg(count(lit(1)).as("n_bi"),
            sum(when(col("known2").isNull, 1L).otherwise(0L)).as("oov_bi"))
        uRate.join(bRate, "lang")
          .select(col("lang"), col("n_uni").cast("long").as("n_uni"),
            (round(col("oov_uni").cast("double")
              / col("n_uni").cast("double") * 1000000.0) / 1000000.0)
              .as("oov_uni_rate"),
            col("n_bi").cast("long").as("n_bi"),
            (round(col("oov_bi").cast("double")
              / col("n_bi").cast("double") * 1000000.0) / 1000000.0)
              .as("oov_bi_rate"))
          .orderBy("lang")
      },
      Some("""WITH dc AS (SELECT doc_id, lang,
             |    string_split(text, ' ') AS w,
             |    CAST(('0x' || substr(md5('split#'
             |      || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0
             |      AS is_test
             |  FROM documents),
             |uni AS (SELECT lang, is_test, unnest(w) AS t1 FROM dc),
             |bi AS (SELECT lang, is_test,
             |    unnest([w[i] || ' ' || w[i+1]
             |      for i in range(1, len(w))]) AS t2
             |  FROM dc WHERE len(w) >= 2),
             |uv AS (SELECT DISTINCT t1 FROM uni WHERE NOT is_test),
             |bv AS (SELECT DISTINCT t2 FROM bi WHERE NOT is_test),
             |ur AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_uni,
             |    CAST(sum(CASE WHEN uv.t1 IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS oov_uni
             |  FROM uni LEFT JOIN uv ON uni.t1 = uv.t1
             |  WHERE is_test GROUP BY lang),
             |br AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_bi,
             |    CAST(sum(CASE WHEN bv.t2 IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS oov_bi
             |  FROM bi LEFT JOIN bv ON bi.t2 = bv.t2
             |  WHERE is_test GROUP BY lang)
             |SELECT ur.lang AS lang, n_uni,
             |  round(CAST(oov_uni AS DOUBLE) / CAST(n_uni AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS oov_uni_rate,
             |  n_bi,
             |  round(CAST(oov_bi AS DOUBLE) / CAST(n_bi AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS oov_bi_rate
             |FROM ur JOIN br ON ur.lang = br.lang
             |ORDER BY ur.lang""".stripMargin)),

    // ---- Dedup-savings report: documents and bytes removed by exact
    // (md5 fingerprint, min-id keeper) vs near (q22 shingle clusters,
    // min-id keeper) dedup — the curation-economics rollup that says
    // what each method actually buys at the corpus level. Near-dup
    // removals reuse the q71 component machinery; byte masses are
    // exact sums.
    Q("q399_dedup_savings",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("n_chars"), md5(col("text")).as("fp"))
          .localCheckpoint()
        val tot = docs.agg(count(lit(1)).as("nd"),
          sum(col("n_chars")).as("nb"))
        val exactGone = docs.join(
            docs.groupBy("fp").agg(min(col("doc_id")).as("keep")), "fp")
          .where(col("doc_id") =!= col("keep"))
          .agg(count(lit(1)).as("docs_removed"),
            sum(col("n_chars")).as("bytes_removed"))
          .select(lit("exact").as("method"), col("docs_removed"),
            col("bytes_removed"))
        val cc = graft.operators.Dedup.duplicateClusters(
          graft.operators.Dedup.shingleJaccardPairs(
            t(s, d, "documents"), 0.5))
        val nearGone = cc.where(col("doc_id") =!= col("cluster"))
          .join(docs, "doc_id")
          .agg(count(lit(1)).as("docs_removed"),
            sum(col("n_chars")).as("bytes_removed"))
          .select(lit("near_shingle").as("method"), col("docs_removed"),
            col("bytes_removed"))
        exactGone.unionAll(nearGone).join(broadcast(tot))
          .select(col("method"),
            col("docs_removed").cast("long").as("docs_removed"),
            col("bytes_removed").cast("long").as("bytes_removed"),
            (round(col("bytes_removed").cast("double")
              / col("nb").cast("double") * 1000000.0) / 1000000.0)
              .as("byte_share"))
          .orderBy("method")
      },
      Some("""WITH RECURSIVE dc AS (SELECT doc_id, n_chars,
             |    md5(text) AS fp FROM documents),
             |tot AS (SELECT count(*) AS nd, sum(n_chars) AS nb FROM dc),
             |ex AS (SELECT CAST(count(*) AS BIGINT) AS docs_removed,
             |    CAST(sum(n_chars) AS BIGINT) AS bytes_removed
             |  FROM dc JOIN (SELECT fp, min(doc_id) AS keep FROM dc
             |    GROUP BY fp) k ON dc.fp = k.fp
             |  WHERE doc_id <> keep),
             |ws AS (SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |     for i in range(1, len(w) - 1)])) AS s
             |  FROM ws WHERE len(w) >= 3),
             |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |pairs AS (SELECT ia, ib FROM inter
             |  JOIN cnt ca ON ca.doc_id = ia JOIN cnt cb ON cb.doc_id = ib
             |  WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5),
             |edges AS (SELECT ia AS u, ib AS v FROM pairs
             |  UNION SELECT ib, ia FROM pairs),
             |reach AS (SELECT u AS src, u AS dst FROM edges
             |  UNION SELECT r.src, e.v FROM reach r JOIN edges e
             |    ON r.dst = e.u),
             |cc AS (SELECT src AS doc_id, min(dst) AS cluster FROM reach
             |  GROUP BY src),
             |nr AS (SELECT CAST(count(*) AS BIGINT) AS docs_removed,
             |    CAST(sum(n_chars) AS BIGINT) AS bytes_removed
             |  FROM cc JOIN dc ON cc.doc_id = dc.doc_id
             |  WHERE cc.doc_id <> cc.cluster)
             |SELECT * FROM (
             |  SELECT 'exact' AS method, docs_removed, bytes_removed,
             |    round(CAST(bytes_removed AS DOUBLE) / CAST(nb AS DOUBLE)
             |      * 1000000.0) / 1000000.0 AS byte_share
             |  FROM ex CROSS JOIN tot
             |  UNION ALL
             |  SELECT 'near_shingle', docs_removed, bytes_removed,
             |    round(CAST(bytes_removed AS DOUBLE) / CAST(nb AS DOUBLE)
             |      * 1000000.0) / 1000000.0
             |  FROM nr CROSS JOIN tot)
             |ORDER BY method""".stripMargin)),

    // ---- Curation pipeline v6 (session-5 capstone): quality gate
    // (q29's composite ≥ 0.5) → exact dedup (min-id keeper per md5
    // fingerprint) → 8-way rendezvous sharding (q261's portable
    // assignment) → per-shard packing report with byte mass and mean
    // quality — the end-to-end curation pass whose every stage is an
    // already-oracled component composed into ONE dataflow. Quality
    // means are 1e-6-quantized exact sums per shard.
    Q("q400_curation_v6",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val docs = t(s, d, "documents")
        val scored = docs.select(col("doc_id"), col("n_chars"),
            md5(col("text")).as("fp"),
            round(graft.operators.TextAnalysis.qualityScore(col("text"))
              * 1000000.0).cast("long").as("q6"))
          .where(col("q6") >= 500000L)
        val kept = scored.join(
            scored.groupBy("fp").agg(min(col("doc_id")).as("keep")), "fp")
          .where(col("doc_id") === col("keep"))
        kept.select(
            graft.operators.Layout.rendezvousShard(col("doc_id"), 8)
              .as("shard"), col("n_chars"), col("q6"))
          .groupBy("shard").agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_chars")).cast("long").as("bytes"),
            sum(col("q6")).cast(dec).as("sq"))
          .select(col("shard"), col("n_docs"), col("bytes"),
            (round(col("sq").cast("double") / col("n_docs").cast("double"))
              / 1000000.0).as("mean_quality"))
          .orderBy("shard")
      },
      Some(s"""WITH sc AS (SELECT doc_id, n_chars, md5(text) AS fp,
              |    CAST(round((least(len(string_split(text, ' '))::DOUBLE
              |        / 50.0, 1.0) * 0.4
              |      + greatest(1.0 - (length(regexp_replace(text,
              |        '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / length(text))
              |        * 5.0, 0.0) * 0.4
              |      + least((CAST(len(list_filter(string_split(text, ' '),
              |        x -> x IN ($EnList))) AS BIGINT)::DOUBLE
              |        / len(string_split(text, ' '))) * 10.0, 1.0) * 0.2)
              |      * 1000000.0) AS BIGINT) AS q6
              |  FROM documents),
              |fl AS (SELECT * FROM sc WHERE q6 >= 500000),
              |kp AS (SELECT fl.doc_id, fl.n_chars, fl.q6
              |  FROM fl JOIN (SELECT fp, min(doc_id) AS keep FROM fl
              |    GROUP BY fp) k ON fl.fp = k.fp
              |  WHERE fl.doc_id = k.keep),
              |h AS (SELECT doc_id, n_chars, q6, sh.s AS s,
              |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
              |      || CAST(sh.s AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
              |  FROM kp CROSS JOIN (SELECT unnest(range(0, 8)) AS s) sh),
              |a AS (SELECT doc_id, max(n_chars) AS n_chars,
              |    max(q6) AS q6, arg_max(s, hv) AS shard
              |  FROM h GROUP BY doc_id)
              |SELECT CAST(shard AS BIGINT) AS shard,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_chars) AS BIGINT) AS bytes,
              |  round(CAST(sum(q6) AS DOUBLE) / CAST(count(*) AS DOUBLE))
              |    / 1000000.0 AS mean_quality
              |FROM a GROUP BY shard ORDER BY shard""".stripMargin),
      bench = true),

    // ---- Brown-Forsythe variance-equality test between the A/B
    // variants' per-user activity: one-way ANOVA F on |y − median_g|
    // with the group medians taken at the EXACT nearest lower rank —
    // the robust homoscedasticity check q283's Cohen's d silently
    // assumes. Deviations are exact integers; the F chain runs on
    // exact decimal sums.
    Q("q401_brown_forsythe",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ux = Tables.events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("y"))
          .select(pmod(col("user_id"), lit(2L)).as("g"), col("y"),
            col("user_id")).localCheckpoint()
        val wg = org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("y"), col("user_id"))
        val ranked = ux.withColumn("rn", row_number().over(wg).cast("long"))
          .withColumn("ng", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("g")))
        val med = ranked.where(col("rn") === expr("(ng + 1) div 2"))
          .select(col("g").as("gm"), col("y").as("med"))
        val z = ux.join(broadcast(med), col("g") === col("gm"))
          .select(col("g"), abs(col("y") - col("med")).as("z"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val grp = z.groupBy("g").agg(count(lit(1)).cast(dec).as("n"),
          sum(col("z")).cast(dec).as("sz"),
          sum(col("z").cast(dec) * col("z").cast(dec)).as("qz"))
        val tot = grp.agg(sum(col("n")).as("nn"), sum(col("sz")).as("tz"),
          sum(col("qz")).as("qq"),
          sum(round(db(col("sz")) * db(col("sz")) / db(col("n"))
            * 100.0).cast(dec)).as("g2"))
        val medw = med.agg(
          max(when(col("gm") === 0, col("med"))).as("med0"),
          max(when(col("gm") === 1, col("med"))).as("med1"))
        val ssb = db(col("g2")) / 100.0 -
          db(col("tz")) * db(col("tz")) / db(col("nn"))
        val ssw = db(col("qq")) - db(col("g2")) / 100.0
        tot.join(broadcast(medw))
          .select(col("nn").cast("long").as("n_users"),
            col("med0").cast("long").as("med0"),
            col("med1").cast("long").as("med1"),
            (round(ssb / (ssw / (db(col("nn")) - 2.0)) * 10000.0)
              / 10000.0).as("w_stat"))
      },
      Some("""WITH ux AS (SELECT user_id % 2 AS g, count(*) AS y,
             |    user_id FROM events GROUP BY user_id),
             |rk AS (SELECT g, y,
             |    CAST(row_number() OVER (PARTITION BY g
             |      ORDER BY y, user_id) AS BIGINT) AS rn,
             |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS ng
             |  FROM ux),
             |md AS (SELECT g AS gm, y AS med FROM rk
             |  WHERE rn = (ng + 1) // 2),
             |z AS (SELECT ux.g, abs(y - med) AS z
             |  FROM ux JOIN md ON ux.g = md.gm),
             |grp AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(z) AS HUGEINT) AS sz,
             |    sum(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS qz
             |  FROM z GROUP BY g),
             |tt AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
             |    CAST(sum(sz) AS HUGEINT) AS tz,
             |    CAST(sum(qz) AS HUGEINT) AS qq,
             |    sum(CAST(round(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
             |      / CAST(n AS DOUBLE) * 100.0) AS HUGEINT)) AS g2
             |  FROM grp),
             |mw AS (SELECT max(CASE WHEN gm = 0 THEN med END) AS med0,
             |    max(CASE WHEN gm = 1 THEN med END) AS med1 FROM md)
             |SELECT CAST(nn AS BIGINT) AS n_users,
             |  CAST(med0 AS BIGINT) AS med0, CAST(med1 AS BIGINT) AS med1,
             |  round((CAST(g2 AS DOUBLE) / 100.0
             |    - CAST(tz AS DOUBLE) * CAST(tz AS DOUBLE)
             |      / CAST(nn AS DOUBLE))
             |    / ((CAST(qq AS DOUBLE) - CAST(g2 AS DOUBLE) / 100.0)
             |      / (CAST(nn AS DOUBLE) - 2.0)) * 10000.0) / 10000.0
             |    AS w_stat
             |FROM tt CROSS JOIN mw""".stripMargin)),

    // ---- Sessionization timeout sensitivity: session counts and mean
    // session length under 15/30/60-minute gap thresholds — the
    // parameter sweep (q306's idea applied to q18's operator) that
    // shows whether downstream session metrics are stable to the one
    // magic number they all depend on. One per-user lag pass shared by
    // all three thresholds; everything exact integers.
    Q("q402_session_timeout_sweep",
      (s, d) => {
        val gapped = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("gap", col("ts") - lag(col("ts"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("user_id").orderBy("ts", "event_id")))
          .localCheckpoint()
        val thr = Seq(900L, 1800L, 3600L)
        thr.map { t =>
          val ns = t * Tables.NanosPerSecond
          gapped.agg(count(lit(1)).cast("long").as("n_events"),
              (countDistinct(col("user_id"))
                + sum(when(col("gap") > ns, 1L).otherwise(0L)))
                .cast("long").as("n_sessions"))
            .select(lit(t).as("timeout_s"), col("n_events"),
              col("n_sessions"),
              (round(col("n_events").cast("double")
                / col("n_sessions").cast("double") * 10000.0) / 10000.0)
                .as("mean_events_per_session"))
        }.reduce(_ unionAll _).orderBy("timeout_s")
      },
      Some("""WITH g AS (SELECT user_id, epoch_ns(ts)
             |      - lag(epoch_ns(ts)) OVER (PARTITION BY user_id
             |        ORDER BY epoch_ns(ts), event_id) AS gap
             |  FROM events),
             |t AS (SELECT unnest([900, 1800, 3600]) AS timeout_s),
             |ag AS (SELECT timeout_s,
             |    CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(count(DISTINCT user_id)
             |      + sum(CASE WHEN gap > CAST(timeout_s AS BIGINT)
             |        * 1000000000 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_sessions
             |  FROM g CROSS JOIN t GROUP BY timeout_s)
             |SELECT CAST(timeout_s AS BIGINT) AS timeout_s, n_events,
             |  n_sessions,
             |  round(CAST(n_events AS DOUBLE) / CAST(n_sessions AS DOUBLE)
             |    * 10000.0) / 10000.0 AS mean_events_per_session
             |FROM ag ORDER BY timeout_s""".stripMargin)),

    // ---- Nested variance components: how much order-price variance
    // lives BETWEEN regions, between nations WITHIN region, and within
    // nation — the hierarchical Σ(G²/n) − Σ(G²/n) ladder over exact
    // cent sums, each level's share of total. The sampling-design
    // question ("stratify by what?") behind q82/q261's partitioning
    // choices. Dims broadcast; one fact fold per level key.
    Q("q403_variance_components",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = t(s, d, "orders")
          .join(broadcast(t(s, d, "customer")
            .select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")
            .select("n_nationkey", "n_regionkey")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_regionkey").as("r"), col("c_nationkey").as("n"),
            round(col("o_totalprice") * 100.0).cast("long").as("y"))
          .localCheckpoint()
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val tot = base.agg(count(lit(1)).cast(dec).as("nn"),
          sum(col("y")).cast(dec).as("tt"),
          sum(col("y").cast(dec) * col("y").cast(dec)).as("qq"))
        def lvl(keys: Seq[String], nm: String) = base.groupBy(
            keys.map(col): _*)
          .agg(count(lit(1)).cast(dec).as("gn"),
            sum(col("y")).cast(dec).as("gs"))
          .agg(sum(round(db(col("gs")) * db(col("gs")) / db(col("gn")))
            .cast(dec)).as(nm))
        val byR = lvl(Seq("r"), "g2r")
        val byN = lvl(Seq("r", "n"), "g2n")
        val j = tot.join(broadcast(byR)).join(broadcast(byN))
        val cm = db(col("tt")) * db(col("tt")) / db(col("nn"))
        val sst = db(col("qq")) - cm
        val ssr = db(col("g2r")) - cm
        val ssn = db(col("g2n")) - db(col("g2r"))
        val sse = db(col("qq")) - db(col("g2n"))
        def row(nm: String, ss: org.apache.spark.sql.Column) =
          j.select(lit(nm).as("level"),
            (round(ss / 10000.0 / 100.0) / 100.0).as("ss_dollars2"),
            (round(ss / sst * 1000000.0) / 1000000.0).as("share"))
        row("1_between_region", ssr)
          .unionAll(row("2_nation_within_region", ssn))
          .unionAll(row("3_within_nation", sse))
          .orderBy("level")
      },
      Some("""WITH b AS (SELECT n_regionkey AS r, c_nationkey AS n,
             |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS y
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |    JOIN nation ON c_nationkey = n_nationkey),
             |tt AS (SELECT CAST(count(*) AS HUGEINT) AS nn,
             |    CAST(sum(y) AS HUGEINT) AS t,
             |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS qq
             |  FROM b),
             |gr AS (SELECT sum(CAST(round(CAST(gs AS DOUBLE)
             |      * CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)) AS HUGEINT))
             |      AS g2r
             |  FROM (SELECT CAST(count(*) AS HUGEINT) AS gn,
             |      CAST(sum(y) AS HUGEINT) AS gs FROM b GROUP BY r)),
             |gn AS (SELECT sum(CAST(round(CAST(gs AS DOUBLE)
             |      * CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)) AS HUGEINT))
             |      AS g2n
             |  FROM (SELECT CAST(count(*) AS HUGEINT) AS gn,
             |      CAST(sum(y) AS HUGEINT) AS gs FROM b GROUP BY r, n)),
             |x AS (SELECT nn, t, qq, g2r, g2n,
             |    CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
             |      / CAST(nn AS DOUBLE) AS cm
             |  FROM tt CROSS JOIN gr CROSS JOIN gn)
             |SELECT * FROM (
             |  SELECT '1_between_region' AS level,
             |    round((CAST(g2r AS DOUBLE) - cm) / 10000.0 / 100.0)
             |      / 100.0 AS ss_dollars2,
             |    round((CAST(g2r AS DOUBLE) - cm)
             |      / (CAST(qq AS DOUBLE) - cm) * 1000000.0) / 1000000.0
             |      AS share
             |  FROM x
             |  UNION ALL
             |  SELECT '2_nation_within_region',
             |    round((CAST(g2n AS DOUBLE) - CAST(g2r AS DOUBLE))
             |      / 10000.0 / 100.0) / 100.0,
             |    round((CAST(g2n AS DOUBLE) - CAST(g2r AS DOUBLE))
             |      / (CAST(qq AS DOUBLE) - cm) * 1000000.0) / 1000000.0
             |  FROM x
             |  UNION ALL
             |  SELECT '3_within_nation',
             |    round((CAST(qq AS DOUBLE) - CAST(g2n AS DOUBLE))
             |      / 10000.0 / 100.0) / 100.0,
             |    round((CAST(qq AS DOUBLE) - CAST(g2n AS DOUBLE))
             |      / (CAST(qq AS DOUBLE) - cm) * 1000000.0) / 1000000.0
             |  FROM x)
             |ORDER BY level""".stripMargin)),

    // ---- Jonckheere-Terpstra ordered-alternative trend: does ship
    // latency increase MONOTONICALLY with priority class (1<2<3<4<5),
    // the hypothesis q258's unordered ANOVA wastes power on. Pairwise
    // Mann-Whitney counts in exact 2× units over the group×VALUE count
    // tables (latency-cardinality-bounded — the value-pair join is tiny
    // however big the fact is; the one BroadcastNestedLoopJoin is this
    // deliberate bounded non-equi pair, the documented class); null
    // moments in closed form.
    Q("q404_jonckheere",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val lat = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(substring(col("o_orderpriority"), 1, 1).cast("long")
            .as("g"),
            datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
              .as("v"))
        val cnt = lat.groupBy("g", "v").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        // inequality-only pair join over the value-count relation:
        // broadcast the build side so the plan is the documented
        // model-size BNLJ, not a CartesianProduct (r13 audit fix)
        val jt2 = cnt.select(col("g").as("ga"), col("v").as("va"),
            col("c").as("ca"))
          .join(broadcast(cnt.select(col("g").as("gb"), col("v").as("vb"),
            col("c").as("cb"))), col("ga") < col("gb"))
          .select(when(col("va") < col("vb"),
              lit(2L).cast(dec) * col("ca").cast(dec) * col("cb").cast(dec))
            .when(col("va") === col("vb"),
              col("ca").cast(dec) * col("cb").cast(dec))
            .otherwise(lit(0L).cast(dec)).as("u2"))
          .agg(sum(col("u2")).as("jt2"))
        val sizes = cnt.groupBy("g").agg(sum(col("c")).as("ng"))
          .agg(sum(col("ng")).cast(dec).as("nn"),
            sum(col("ng").cast(dec) * col("ng").cast(dec)).as("sn2"),
            sum(col("ng").cast(dec) * col("ng").cast(dec)
              * (lit(2L).cast(dec) * col("ng").cast(dec)
                + lit(3L).cast(dec))).as("sn23"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val e = (db(col("nn")) * db(col("nn")) - db(col("sn2"))) / 4.0
        val vr = (db(col("nn")) * db(col("nn"))
          * (lit(2.0) * db(col("nn")) + 3.0) - db(col("sn23"))) / 72.0
        jt2.join(broadcast(sizes))
          .select(col("nn").cast("long").as("n"),
            (db(col("jt2")) / 2.0).as("jt"),
            (round(e * 100.0) / 100.0).as("e_jt"),
            (round((db(col("jt2")) / 2.0 - e) / sqrt(vr) * 1000000.0)
              / 1000000.0).as("z"))
      },
      Some("""WITH lat AS (SELECT
             |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
             |    CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)
             |      AS v
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |cnt AS (SELECT g, v, count(*) AS c FROM lat GROUP BY 1, 2),
             |jt AS (SELECT sum(CASE WHEN a.v < b.v
             |      THEN 2 * CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)
             |    WHEN a.v = b.v
             |      THEN CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)
             |    ELSE CAST(0 AS HUGEINT) END) AS jt2
             |  FROM cnt a JOIN cnt b ON a.g < b.g),
             |sz AS (SELECT CAST(sum(ng) AS HUGEINT) AS nn,
             |    sum(CAST(ng AS HUGEINT) * CAST(ng AS HUGEINT)) AS sn2,
             |    sum(CAST(ng AS HUGEINT) * CAST(ng AS HUGEINT)
             |      * (2 * CAST(ng AS HUGEINT) + 3)) AS sn23
             |  FROM (SELECT g, sum(c) AS ng FROM cnt GROUP BY g))
             |SELECT CAST(nn AS BIGINT) AS n,
             |  CAST(jt2 AS DOUBLE) / 2.0 AS jt,
             |  round((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
             |    - CAST(sn2 AS DOUBLE)) / 4.0 * 100.0) / 100.0 AS e_jt,
             |  round((CAST(jt2 AS DOUBLE) / 2.0
             |    - (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
             |      - CAST(sn2 AS DOUBLE)) / 4.0)
             |    / sqrt((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
             |      * (2.0 * CAST(nn AS DOUBLE) + 3.0)
             |      - CAST(sn23 AS DOUBLE)) / 72.0) * 1000000.0)
             |    / 1000000.0 AS z
             |FROM jt CROSS JOIN sz""".stripMargin)),

    // ---- Page's L trend test: is there a MONOTONE weekday ordering in
    // daily traffic (Mon < ... < Sun), the ordered sharpening of q352's
    // Friedman omnibus. L = Σ j·R_j from the SAME exact 2×-unit average
    // ranks; null moments closed-form; everything integer until the z
    // chain.
    Q("q405_page_trend",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d))
          .select(expr("day div 7").as("week"),
            pmod(col("day"), lit(7L)).as("weekday"), col("c"))
        val full = dense.groupBy("week").agg(count(lit(1)).as("nd"))
          .where(col("nd") === 7).select("week")
        val wk = org.apache.spark.sql.expressions.Window
          .partitionBy("week").orderBy("c")
        val ties = org.apache.spark.sql.expressions.Window
          .partitionBy("week", "c")
        val ranked = dense.join(broadcast(full), "week")
          .withColumn("avg2",
            lit(2L) * rank().over(wk) + count(lit(1)).over(ties) - 1L)
        val rj = ranked.groupBy("weekday").agg(
          count(lit(1)).cast(dec).as("nw"),
          sum(col("avg2")).cast(dec).as("r2"))
        val ag = rj.agg(max(col("nw")).as("n"),
          sum((col("weekday").cast(dec) + 1L) * col("r2")).as("l2"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val n = db(col("n"))
        val el = n * 7.0 * 64.0 / 4.0        // n·k(k+1)²/4, k = 7
        val vl = n * 49.0 * 64.0 * 6.0 / 144.0
        ag.select(col("n").cast("long").as("n_weeks"),
          (db(col("l2")) / 2.0).as("l_stat"),
          (round(el * 100.0) / 100.0).as("e_l"),
          (round((db(col("l2")) / 2.0 - el) / sqrt(vl) * 1000000.0)
            / 1000000.0).as("z"))
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT gs.day, coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) gs
             |  LEFT JOIN c USING (day)),
             |wd AS (SELECT day // 7 AS week, day % 7 AS weekday, c FROM dn),
             |fw AS (SELECT week FROM wd GROUP BY week
             |  HAVING count(*) = 7),
             |rk AS (SELECT weekday,
             |    2 * rank() OVER (PARTITION BY wd.week ORDER BY c)
             |      + count(*) OVER (PARTITION BY wd.week, c) - 1 AS avg2
             |  FROM wd JOIN fw ON wd.week = fw.week),
             |rj AS (SELECT weekday, CAST(count(*) AS HUGEINT) AS nw,
             |    CAST(sum(avg2) AS HUGEINT) AS r2
             |  FROM rk GROUP BY weekday),
             |ag AS (SELECT CAST(max(nw) AS BIGINT) AS n,
             |    CAST(sum((CAST(weekday AS HUGEINT) + 1) * r2) AS HUGEINT)
             |      AS l2
             |  FROM rj)
             |SELECT n AS n_weeks, CAST(l2 AS DOUBLE) / 2.0 AS l_stat,
             |  round(CAST(n AS DOUBLE) * 7.0 * 64.0 / 4.0 * 100.0) / 100.0
             |    AS e_l,
             |  round((CAST(l2 AS DOUBLE) / 2.0
             |    - CAST(n AS DOUBLE) * 7.0 * 64.0 / 4.0)
             |    / sqrt(CAST(n AS DOUBLE) * 49.0 * 64.0 * 6.0 / 144.0)
             |    * 1000000.0) / 1000000.0 AS z
             |FROM ag""".stripMargin)),

    // ---- Eigenvector centrality over the symmetrized trade graph:
    // five L1-normalized power rounds (q113's fixed-round replay
    // convention — each round unrolled in the oracle, 6-dp rounding at
    // the end only), the "important neighbors make you important"
    // complement to PageRank's teleporting walk.
    Q("q406_eigenvector_centrality",
      (s, d) => {
        val nation = t(s, d, "nation")
        val edges = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation.select(col("n_nationkey").as("ck"),
            col("n_name").as("src"))), col("c_nationkey") === col("ck"))
          .join(broadcast(nation.select(col("n_nationkey").as("sk"),
            col("n_name").as("dst"))), col("s_nationkey") === col("sk"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.operators.GraphOps.eigenvectorCentrality(edges, 5)
          .select(col("node"), round(col("v"), 6).as("ev"))
          .orderBy("node")
      },
      Some {
        val rounds = (1 to 5).map { r =>
          s"""c$r AS (SELECT m.dst AS node, sum(m.w * r.v) AS c
             |  FROM sym m JOIN v${r - 1} r ON r.node = m.src
             |  GROUP BY m.dst),
             |t$r AS (SELECT sum(c) AS t FROM c$r),
             |v$r AS (SELECT node, c / t AS v FROM c$r CROSS JOIN t$r)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH edges AS (SELECT cn.n_name AS src, sn.n_name AS dst,
           |    CAST(count(*) AS DOUBLE) AS w
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation cn ON c_nationkey = cn.n_nationkey
           |  JOIN nation sn ON s_nationkey = sn.n_nationkey
           |  GROUP BY 1, 2),
           |sym AS (SELECT src, dst, sum(w) AS w FROM (
           |    SELECT src, dst, w FROM edges WHERE src <> dst
           |    UNION ALL
           |    SELECT dst, src, w FROM edges WHERE src <> dst)
           |  GROUP BY 1, 2),
           |nodes AS (SELECT DISTINCT src AS node FROM sym),
           |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
           |v0 AS (SELECT node, 1.0 / nn.n AS v FROM nodes, nn),
           |$rounds
           |SELECT node, round(v, 6) AS ev FROM v5 ORDER BY node"""
          .stripMargin
      }),

    // ---- Katz centrality over the same graph: x ← α·A·x + 1 for five
    // rounds with a conservative α = 1e-6 (well under 1/λ₁ for this
    // weighted graph), the path-count measure that keeps a baseline
    // for peripheral nodes where eigenvector centrality starves them.
    // Same fixed-round replay convention.
    Q("q407_katz_centrality",
      (s, d) => {
        val nation = t(s, d, "nation")
        val edges = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation.select(col("n_nationkey").as("ck"),
            col("n_name").as("src"))), col("c_nationkey") === col("ck"))
          .join(broadcast(nation.select(col("n_nationkey").as("sk"),
            col("n_name").as("dst"))), col("s_nationkey") === col("sk"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.operators.GraphOps.katzCentrality(edges, 5, alpha = 1.0e-6)
          .select(col("node"), round(col("x"), 6).as("katz"))
          .orderBy("node")
      },
      Some {
        val rounds = (1 to 5).map { r =>
          s"""x$r AS (SELECT v.node,
             |    0.000001 * coalesce((SELECT sum(m.w * p.x) FROM sym m
             |      JOIN x${r - 1} p ON p.node = m.src
             |      WHERE m.dst = v.node), 0.0) + 1.0 AS x
             |  FROM nodes v)""".stripMargin
        }.mkString(",\n")
        s"""WITH edges AS (SELECT cn.n_name AS src, sn.n_name AS dst,
           |    CAST(count(*) AS DOUBLE) AS w
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation cn ON c_nationkey = cn.n_nationkey
           |  JOIN nation sn ON s_nationkey = sn.n_nationkey
           |  GROUP BY 1, 2),
           |sym AS (SELECT src, dst, sum(w) AS w FROM (
           |    SELECT src, dst, w FROM edges WHERE src <> dst
           |    UNION ALL
           |    SELECT dst, src, w FROM edges WHERE src <> dst)
           |  GROUP BY 1, 2),
           |nodes AS (SELECT DISTINCT src AS node FROM sym),
           |x0 AS (SELECT node, 1.0 AS x FROM nodes),
           |$rounds
           |SELECT node, round(x, 6) AS katz FROM x5 ORDER BY node"""
          .stripMargin
      }),

    // ---- Bowker symmetry test on q377's quartile-migration matrix:
    // B = Σ_{i<j}(n_ij − n_ji)²/(n_ij + n_ji) — "are upgrades as common
    // as downgrades", the k×k generalization of McNemar (q329). Cell
    // counts come from the same exact rank-quartile machinery; the six
    // off-diagonal pair terms are exact-integer ratios.
    Q("q408_bowker_symmetry",
      (s, d) => {
        def half(cond: org.apache.spark.sql.Column, tag: String) =
          t(s, d, "orders").where(cond)
            .groupBy("o_custkey")
            .agg(sum(round(col("o_totalprice") * 100.0).cast("long"))
              .as(s"rev$tag"))
        val split = lit("1998-07-01").cast("timestamp")
        val both = half(col("o_orderdate") < split, "1")
          .join(half(col("o_orderdate") >= split, "2"), "o_custkey")
        def rk(revCol: String) = (row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col(revCol), col("o_custkey"))).cast("long") - 1L) * 4L
        val cells = both
          .withColumn("nn", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
          .withColumn("r1", rk("rev1")).withColumn("r2", rk("rev2"))
          .withColumn("q1", expr("r1 div nn") + 1L)
          .withColumn("q2", expr("r2 div nn") + 1L)
          .groupBy("q1", "q2").agg(count(lit(1)).as("c"))
        val pairs = cells.select(col("q1").as("i"), col("q2").as("j"),
            col("c").as("nij"))
          .join(cells.select(col("q1").as("j2"), col("q2").as("i2"),
            col("c").as("nji")),
            col("i") === col("i2") && col("j") === col("j2"))
          .where(col("i") < col("j"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        pairs.agg(count(lit(1)).cast("long").as("n_pairs"),
            sum(when(col("nij") + col("nji") > 0,
              db((col("nij") - col("nji")) * (col("nij") - col("nji")))
                / db(col("nij") + col("nji"))).otherwise(lit(0.0)))
              .as("b"))
          .select(col("n_pairs"), lit(6L).as("df"),
            (round(col("b") * 10000.0) / 10000.0).as("b_stat"))
      },
      Some("""WITH h1 AS (SELECT o_custkey,
             |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS rev1
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-07-01'
             |  GROUP BY 1),
             |h2 AS (SELECT o_custkey,
             |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS rev2
             |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-07-01'
             |  GROUP BY 1),
             |b AS (SELECT h1.o_custkey, rev1, rev2
             |  FROM h1 JOIN h2 ON h1.o_custkey = h2.o_custkey),
             |n AS (SELECT count(*) AS n FROM b),
             |rk AS (SELECT
             |    ((row_number() OVER (ORDER BY rev1, o_custkey) - 1) * 4)
             |      // n + 1 AS q1,
             |    ((row_number() OVER (ORDER BY rev2, o_custkey) - 1) * 4)
             |      // n + 1 AS q2
             |  FROM b CROSS JOIN n),
             |mx AS (SELECT q1, q2, count(*) AS c FROM rk GROUP BY 1, 2),
             |pr AS (SELECT a.q1 AS i, a.q2 AS j, a.c AS nij, t.c AS nji
             |  FROM mx a JOIN mx t ON a.q1 = t.q2 AND a.q2 = t.q1
             |  WHERE a.q1 < a.q2)
             |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST(6 AS BIGINT) AS df,
             |  round(sum(CASE WHEN nij + nji > 0 THEN
             |    CAST((nij - nji) * (nij - nji) AS DOUBLE)
             |      / CAST(nij + nji AS DOUBLE) ELSE 0.0 END) * 10000.0)
             |    / 10000.0 AS b_stat
             |FROM pr""".stripMargin)),

    // ---- Markov stationarity: is the q189 event-transition matrix the
    // SAME in the first and second half of the window? χ² homogeneity
    // over (transition-type × half) counts — the assumption q240's
    // stationary distribution and q269's entropy rate silently make.
    // Transition pairs come from one per-user lag pass; every expected
    // count divides exact integers.
    Q("q409_markov_stationarity",
      (s, d) => {
        val ev = Tables.events(s, d)
        val mid = ev.agg(((min(expr("ts div 86400000000000"))
          + max(expr("ts div 86400000000000"))) / 2).cast("long").as("mid"))
        val tr = ev.select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), expr("ts div 86400000000000").as("day"))
          .withColumn("prev", lag(col("event_type"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("user_id").orderBy("ts", "event_id")))
          .where(col("prev").isNotNull)
          .join(broadcast(mid))
          .select(concat(col("prev"), lit(">"), col("event_type"))
            .as("tt"), (col("day") <= col("mid")).as("h1"))
        val cells = tr.groupBy("tt").agg(
          sum(when(col("h1"), 1L).otherwise(0L)).as("c1"),
          sum(when(!col("h1"), 1L).otherwise(0L)).as("c2"))
        val tot = cells.agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"),
          count(lit(1)).cast("long").as("k"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val j = cells.join(broadcast(tot))
        val nAll = db(col("t1")) + db(col("t2"))
        val rt = db(col("c1")) + db(col("c2"))
        def term(o: org.apache.spark.sql.Column,
            ct: org.apache.spark.sql.Column) = {
          val e = rt * ct / nAll
          (db(o) - e) * (db(o) - e) / e
        }
        j.agg(max(col("k")).as("n_types"),
            max(col("t1")).cast("long").as("n_first"),
            max(col("t2")).cast("long").as("n_second"),
            sum(term(col("c1"), db(col("t1")))
              + term(col("c2"), db(col("t2")))).as("chi2"))
          .select(col("n_types"), col("n_first"), col("n_second"),
            (col("n_types") - 1L).as("df"),
            (round(col("chi2") * 10000.0) / 10000.0).as("chi2"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id,
             |    event_type, epoch_ns(ts) // 86400000000000 AS day
             |  FROM events),
             |md AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
             |tr AS (SELECT prev || '>' || event_type AS tt,
             |    day <= mid AS h1
             |  FROM (SELECT event_type, day,
             |      lag(event_type) OVER (PARTITION BY user_id
             |        ORDER BY tns, event_id) AS prev
             |    FROM e) x CROSS JOIN md
             |  WHERE prev IS NOT NULL),
             |cl AS (SELECT tt,
             |    sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS c1,
             |    sum(CASE WHEN NOT h1 THEN 1 ELSE 0 END) AS c2
             |  FROM tr GROUP BY tt),
             |tt2 AS (SELECT sum(c1) AS t1, sum(c2) AS t2,
             |    CAST(count(*) AS BIGINT) AS k FROM cl)
             |SELECT k AS n_types, CAST(t1 AS BIGINT) AS n_first,
             |  CAST(t2 AS BIGINT) AS n_second, k - 1 AS df,
             |  round(sum(
             |    (CAST(c1 AS DOUBLE) - (CAST(c1 AS DOUBLE)
             |      + CAST(c2 AS DOUBLE)) * CAST(t1 AS DOUBLE)
             |      / (CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE)))
             |    * (CAST(c1 AS DOUBLE) - (CAST(c1 AS DOUBLE)
             |      + CAST(c2 AS DOUBLE)) * CAST(t1 AS DOUBLE)
             |      / (CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE)))
             |    / ((CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE))
             |      * CAST(t1 AS DOUBLE)
             |      / (CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE)))
             |    + (CAST(c2 AS DOUBLE) - (CAST(c1 AS DOUBLE)
             |      + CAST(c2 AS DOUBLE)) * CAST(t2 AS DOUBLE)
             |      / (CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE)))
             |    * (CAST(c2 AS DOUBLE) - (CAST(c1 AS DOUBLE)
             |      + CAST(c2 AS DOUBLE)) * CAST(t2 AS DOUBLE)
             |      / (CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE)))
             |    / ((CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE))
             |      * CAST(t2 AS DOUBLE)
             |      / (CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE)))
             |  ) * 10000.0) / 10000.0 AS chi2
             |FROM cl CROSS JOIN tt2
             |GROUP BY k, t1, t2""".stripMargin)),

    // ---- Cochran-Armitage trend in proportions: does the fulfillment
    // rate trend MONOTONICALLY across the ordered priority classes
    // (scores 1..5)? z from score-weighted exact counts — the ordered
    // sharpening of a plain r×2 χ² (q288's framing), one conditional
    // fold and a fixed closed-form chain.
    Q("q410_cochran_armitage",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val g = t(s, d, "orders")
          .select(substring(col("o_orderpriority"), 1, 1).cast("long")
            .as("sc"), (col("o_orderstatus") === "F").as("yy"))
          .groupBy("sc").agg(
            sum(when(col("yy"), 1L).otherwise(0L)).as("a"),
            count(lit(1)).as("n"))
        val agg = g.agg(sum(col("a")).cast(dec).as("aa"),
          sum(col("n")).cast(dec).as("nn"),
          sum(col("sc").cast(dec) * col("a").cast(dec)).as("sa"),
          sum(col("sc").cast(dec) * col("n").cast(dec)).as("sn"),
          sum(col("sc").cast(dec) * col("sc").cast(dec)
            * col("n").cast(dec)).as("s2n"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val pbar = db(col("aa")) / db(col("nn"))
        val num = db(col("sa")) - db(col("sn")) * pbar
        val den = sqrt(pbar * (lit(1.0) - pbar)
          * (db(col("s2n")) - db(col("sn")) * db(col("sn")) / db(col("nn"))))
        agg.select(col("nn").cast("long").as("n"),
          col("aa").cast("long").as("n_fulfilled"),
          (round(num * 100.0) / 100.0).as("trend_num"),
          (round(num / den * 1000000.0) / 1000000.0).as("z"))
      },
      Some("""WITH g AS (SELECT
             |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS sc,
             |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS a,
             |    count(*) AS n
             |  FROM orders GROUP BY 1),
             |ag AS (SELECT CAST(sum(a) AS HUGEINT) AS aa,
             |    CAST(sum(n) AS HUGEINT) AS nn,
             |    sum(CAST(sc AS HUGEINT) * CAST(a AS HUGEINT)) AS sa,
             |    sum(CAST(sc AS HUGEINT) * CAST(n AS HUGEINT)) AS sn,
             |    sum(CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT)
             |      * CAST(n AS HUGEINT)) AS s2n
             |  FROM g)
             |SELECT CAST(nn AS BIGINT) AS n,
             |  CAST(aa AS BIGINT) AS n_fulfilled,
             |  round((CAST(sa AS DOUBLE) - CAST(sn AS DOUBLE)
             |    * (CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))) * 100.0)
             |    / 100.0 AS trend_num,
             |  round((CAST(sa AS DOUBLE) - CAST(sn AS DOUBLE)
             |    * (CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE)))
             |    / sqrt((CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))
             |      * (1.0 - CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))
             |      * (CAST(s2n AS DOUBLE) - CAST(sn AS DOUBLE)
             |        * CAST(sn AS DOUBLE) / CAST(nn AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS z
             |FROM ag""".stripMargin)),

    // ---- Tukey HSD post-hoc pairs: after an omnibus segment effect,
    // WHICH segment pairs differ in mean order value — the studentized-
    // range q statistic per pair against the k=5/df→∞ 5% critical value
    // (3.86, a literal on both engines). Pooled MSE and group means
    // come from one exact decimal moment fold; the pair table is k²-
    // sized.
    Q("q411_tukey_hsd",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val g = t(s, d, "orders")
          .join(broadcast(t(s, d, "customer")
            .select("c_custkey", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"),
            round(col("o_totalprice") * 100.0).cast("long").as("y"))
          .groupBy("seg").agg(count(lit(1)).cast(dec).as("n"),
            sum(col("y")).cast(dec).as("sy"),
            sum(col("y").cast(dec) * col("y").cast(dec)).as("qy"))
          .localCheckpoint()
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val mse = g.agg(sum(col("n")).as("nn"),
            count(lit(1)).cast("long").as("k"),
            sum(db(col("qy")) - db(col("sy")) * db(col("sy"))
              / db(col("n"))).as("ssw"))
          .select(col("nn"), col("k"),
            (col("ssw") / (db(col("nn")) - db(col("k")))).as("mse"))
        // broadcast the segment-sized build side: documented BNLJ, not
        // a CartesianProduct (r13 audit fix)
        val pairs = g.select(col("seg").as("sa"), col("n").as("na"),
            col("sy").as("ya"))
          .join(broadcast(g.select(col("seg").as("sb"), col("n").as("nb"),
            col("sy").as("yb"))), col("sa") < col("sb"))
          .join(broadcast(mse))
        val diff = db(col("ya")) / db(col("na")) -
          db(col("yb")) / db(col("nb"))
        val se = sqrt(col("mse") / 2.0
          * (lit(1.0) / db(col("na")) + lit(1.0) / db(col("nb"))))
        val q = abs(diff) / se
        pairs.select(col("sa"), col("sb"),
            (round(diff / 100.0 * 100.0) / 100.0).as("diff_dollars"),
            (round(q * 10000.0) / 10000.0).as("q_stat"),
            (q > 3.86).as("significant"))
          .orderBy("sa", "sb")
      },
      Some("""WITH g AS (SELECT c_mktsegment AS seg,
             |    CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
             |      AS HUGEINT) AS sy,
             |    sum(CAST(CAST(round(o_totalprice * 100.0) AS BIGINT)
             |      AS HUGEINT)
             |      * CAST(CAST(round(o_totalprice * 100.0) AS BIGINT)
             |      AS HUGEINT)) AS qy
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1),
             |ms AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
             |    CAST(count(*) AS BIGINT) AS k,
             |    sum(CAST(qy AS DOUBLE) - CAST(sy AS DOUBLE)
             |      * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |      / (CAST(sum(n) AS DOUBLE) - CAST(count(*) AS DOUBLE))
             |      AS mse
             |  FROM g)
             |SELECT a.seg AS sa, b.seg AS sb,
             |  round((CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE)
             |    - CAST(b.sy AS DOUBLE) / CAST(b.n AS DOUBLE)) / 100.0
             |    * 100.0) / 100.0 AS diff_dollars,
             |  round(abs(CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE)
             |    - CAST(b.sy AS DOUBLE) / CAST(b.n AS DOUBLE))
             |    / sqrt(mse / 2.0 * (1.0 / CAST(a.n AS DOUBLE)
             |      + 1.0 / CAST(b.n AS DOUBLE))) * 10000.0) / 10000.0
             |    AS q_stat,
             |  abs(CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE)
             |    - CAST(b.sy AS DOUBLE) / CAST(b.n AS DOUBLE))
             |    / sqrt(mse / 2.0 * (1.0 / CAST(a.n AS DOUBLE)
             |      + 1.0 / CAST(b.n AS DOUBLE))) > 3.86 AS significant
             |FROM g a JOIN g b ON a.seg < b.seg CROSS JOIN ms
             |ORDER BY sa, sb""".stripMargin)),

    // ---- Trade-partner concentration per customer nation: HHI of the
    // outgoing trade-weight distribution and the effective partner
    // count 1/HHI — the node-level "how diversified is this nation's
    // supply base" micro-metric under q325's market-level HHI. Exact
    // integer weights; per-node folds are partner-bounded.
    Q("q412_partner_concentration",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val nation = t(s, d, "nation")
        val edges = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation.select(col("n_nationkey").as("ck"),
            col("n_name").as("src"))), col("c_nationkey") === col("ck"))
          .join(broadcast(nation.select(col("n_nationkey").as("sk"),
            col("n_name").as("dst"))), col("s_nationkey") === col("sk"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val tot = edges.groupBy("src").agg(sum(col("w")).cast(dec).as("tw"),
          count(lit(1)).as("n_partners"))
        edges.join(broadcast(tot), "src")
          .groupBy("src").agg(max(col("n_partners")).cast("long")
              .as("n_partners"),
            sum(db(col("w").cast(dec) * col("w").cast(dec))
              / db(col("tw") * col("tw"))).as("hhi"))
          .select(col("src").as("nation"), col("n_partners"),
            (round(col("hhi") * 1000000.0) / 1000000.0).as("hhi"),
            (round(lit(1.0) / col("hhi") * 10000.0) / 10000.0)
              .as("effective_partners"))
          .orderBy("nation")
      },
      Some("""WITH ed AS (SELECT cn.n_name AS src, sn.n_name AS dst,
             |    count(*) AS w
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation cn ON c_nationkey = cn.n_nationkey
             |  JOIN nation sn ON s_nationkey = sn.n_nationkey
             |  GROUP BY 1, 2),
             |tt AS (SELECT src, CAST(sum(w) AS HUGEINT) AS tw,
             |    count(*) AS n_partners FROM ed GROUP BY src)
             |SELECT ed.src AS nation,
             |  CAST(max(n_partners) AS BIGINT) AS n_partners,
             |  round(sum(CAST(CAST(w AS HUGEINT) * CAST(w AS HUGEINT)
             |      AS DOUBLE) / CAST(tw * tw AS DOUBLE)) * 1000000.0)
             |    / 1000000.0 AS hhi,
             |  round(1.0 / sum(CAST(CAST(w AS HUGEINT)
             |      * CAST(w AS HUGEINT) AS DOUBLE)
             |      / CAST(tw * tw AS DOUBLE)) * 10000.0) / 10000.0
             |    AS effective_partners
             |FROM ed JOIN tt ON ed.src = tt.src
             |GROUP BY ed.src ORDER BY nation""".stripMargin)),

    // ---- Portable deterministic HyperLogLog: distinct parts per
    // supplier nation. The fully-oracled HLL complement to q33 (whose
    // engine sketch is implementation-defined → rows-only): 256 buckets
    // keyed by the low 8 bits of the portable 60-bit md5 hash, rho =
    // leading-zero rank of the remaining 52 bits via length(bin(x))
    // (identical string semantics both engines), register max per
    // (nation, bucket) in ONE map-side-combinable aggregation — the
    // register relation is bounded by nations×256 regardless of corpus
    // size. The harmonic fold stays EXACT: each register contributes
    // the integer 2^(53−M), summed in decimal(38,0) (≤ 256·2^53 < 2^62),
    // so the only floating steps are the final alpha·m²·2^53/Z division
    // and the 1e-8-quantized ln of the linear-counting branch (the q378
    // ln convention). Exact distinct is counted alongside as the audit
    // column — at 100 TB you drop it and keep the sketch relation.
    Q("q413_hll_portable",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier")
            .select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("l_partkey"),
            graft.expressions.PortableHash.md5Hash60(col("l_partkey"))
              .as("h"))
          .localCheckpoint()
        val reg = base
          .select(col("nation"), col("h").bitwiseAND(lit(255L)).as("bucket"),
            shiftright(col("h"), 8).as("rest"))
          .select(col("nation"), col("bucket"),
            when(col("rest") === 0, lit(53))
              .otherwise(lit(53) - length(bin(col("rest")))).as("rho"))
          .groupBy("nation", "bucket").agg(max(col("rho")).as("m"))
        val fold = reg.groupBy("nation").agg(
          (sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - m)").cast(dec))
            + (lit(256).cast(dec) - count(lit(1)).cast(dec))
              * lit(9007199254740992L).cast(dec)).as("z"),
          (lit(256) - count(lit(1))).cast("long").as("v"))
        val eRaw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
          lit(65536.0) * lit(9007199254740992.0) / col("z").cast("double")
        val lc = round(log(lit(256.0) / col("v").cast("double")) *
          1.0e8) / 1.0e8 * 256.0
        val est = fold.select(col("nation"),
          (round(when(col("v") > 0 && eRaw <= 640.0, lc).otherwise(eRaw)
            * 10000.0) / 10000.0).as("est"))
        val exact = base.groupBy("nation")
          .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
        est.join(broadcast(exact), "nation")
          .select(col("nation"), col("est"), col("exact_distinct"),
            (round(abs(col("est") - col("exact_distinct").cast("double"))
              / col("exact_distinct").cast("double") * 1000000.0)
              / 1000000.0).as("rel_err"))
          .orderBy("nation")
      },
      Some("""WITH base AS (SELECT n_name AS nation, l_partkey,
             |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
             |      AS BIGINT) AS h
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey),
             |reg AS (SELECT nation, h & 255 AS bucket,
             |    max(CASE WHEN (h >> 8) = 0 THEN 53
             |        ELSE 53 - length(bin(h >> 8)) END) AS m
             |  FROM base GROUP BY 1, 2),
             |fold AS (SELECT nation,
             |    CAST(sum(1::BIGINT << (53 - m)) AS HUGEINT)
             |      + (256 - CAST(count(*) AS HUGEINT))
             |        * CAST(9007199254740992 AS HUGEINT) AS z,
             |    256 - count(*) AS v
             |  FROM reg GROUP BY nation),
             |est AS (SELECT nation,
             |    round(CASE WHEN v > 0
             |        AND 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
             |          * 9007199254740992.0 / CAST(z AS DOUBLE) <= 640.0
             |      THEN round(ln(256.0 / CAST(v AS DOUBLE)) * 100000000.0)
             |        / 100000000.0 * 256.0
             |      ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
             |        * 9007199254740992.0 / CAST(z AS DOUBLE) END
             |      * 10000.0) / 10000.0 AS est
             |  FROM fold),
             |ex AS (SELECT nation, count(DISTINCT l_partkey) AS exact_distinct
             |  FROM base GROUP BY nation)
             |SELECT est.nation, est, exact_distinct,
             |  round(abs(est - CAST(exact_distinct AS DOUBLE))
             |    / CAST(exact_distinct AS DOUBLE) * 1000000.0) / 1000000.0
             |    AS rel_err
             |FROM est JOIN ex ON est.nation = ex.nation
             |ORDER BY 1""".stripMargin),
      bench = true),

    // ---- AMS second-frequency-moment (F2) sketch over the corpus term
    // distribution (Alon-Matias-Szegedy 1996): 16 ±1-sign estimators,
    // sign_e(w) = bit e of the portable 60-bit md5 hash, each X_e an
    // EXACT integer token-sum — all 16 land in ONE map-side-combined
    // global aggregation over the token scan (driver state: 16 longs),
    // so the sketch path never shuffles the corpus. Estimates X_e² are
    // squared in decimal(38,0) (token counts at 100 TB put X² past a
    // long); the mean and the order-statistic median (avg of ranks
    // 8/9 — no interpolation drift) are the only floating steps, each
    // a single division. True F2 = Σ cnt_w² runs alongside from the
    // vocab-sized term aggregate as the audit columns.
    Q("q414_ams_f2",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val tok = t(s, d, "documents")
          .select(explode(graft.operators.TextAnalysis.tokens(col("text")))
            .as("w"))
          .select(graft.expressions.PortableHash.md5Hash60(col("w")).as("h"))
        val xs = tok.agg(
          (0 until 16).map(e => sum(
            when(col("h").bitwiseAND(lit(1L << e)) =!= 0, 1L).otherwise(-1L))
            .as(s"x$e")).head,
          (0 until 16).map(e => sum(
            when(col("h").bitwiseAND(lit(1L << e)) =!= 0, 1L).otherwise(-1L))
            .as(s"x$e")).tail: _*)
        val f2 = t(s, d, "documents")
          .select(explode(graft.operators.TextAnalysis.tokens(col("text")))
            .as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
          .agg(sum(col("c").cast(dec) * col("c").cast(dec)).as("f2"))
        val sq = sort_array(array((0 until 16).map(e =>
          (col(s"x$e").cast(dec) * col(s"x$e").cast(dec))): _*))
        val mean = aggregate(col("sq"), lit(0).cast(dec), (a, x) => a + x)
          .cast("double") / 16.0
        val med = (element_at(col("sq"), 8).cast("double")
          + element_at(col("sq"), 9).cast("double")) / 2.0
        xs.join(broadcast(f2))
          .select(col("f2").cast("double").as("f2_exact"), sq.as("sq"))
          .select(col("f2_exact"), mean.as("ams_mean"), med.as("ams_median"))
          .select(col("f2_exact"),
            (round(col("ams_mean") * 10000.0) / 10000.0).as("ams_mean"),
            (round(col("ams_median") * 10000.0) / 10000.0).as("ams_median"),
            (round(abs(col("ams_mean") - col("f2_exact")) / col("f2_exact")
              * 1000000.0) / 1000000.0).as("err_mean"),
            (round(abs(col("ams_median") - col("f2_exact")) / col("f2_exact")
              * 1000000.0) / 1000000.0).as("err_median"))
      },
      Some {
        val signs = (0 until 16).map(e =>
          s"sum(CASE WHEN (h & (1::BIGINT << $e)) <> 0 THEN 1 ELSE -1 END) AS x$e")
          .mkString(", ")
        val sqList = (0 until 16).map(e =>
          s"CAST(x$e AS HUGEINT) * CAST(x$e AS HUGEINT)").mkString(", ")
        s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
           |  FROM documents),
           |hh AS (SELECT CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h
           |  FROM tok),
           |xs AS (SELECT $signs FROM hh),
           |f2 AS (SELECT CAST(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
           |    AS DOUBLE) AS f2_exact
           |  FROM (SELECT count(*) AS c FROM tok GROUP BY w)),
           |sq AS (SELECT list_sort([$sqList]) AS l FROM xs),
           |m AS (SELECT f2_exact,
           |    CAST(list_sum(l) AS DOUBLE) / 16.0 AS ams_mean,
           |    (CAST(l[8] AS DOUBLE) + CAST(l[9] AS DOUBLE)) / 2.0
           |      AS ams_median
           |  FROM sq CROSS JOIN f2)
           |SELECT f2_exact,
           |  round(ams_mean * 10000.0) / 10000.0 AS ams_mean,
           |  round(ams_median * 10000.0) / 10000.0 AS ams_median,
           |  round(abs(ams_mean - f2_exact) / f2_exact * 1000000.0)
           |    / 1000000.0 AS err_mean,
           |  round(abs(ams_median - f2_exact) / f2_exact * 1000000.0)
           |    / 1000000.0 AS err_median
           |FROM m""".stripMargin
      }),

    // ---- Item-item collaborative filtering (co-purchase cosine): per
    // part, the top-3 most-similar parts by basket-cooccurrence cosine
    // co(a,b)/√(n_a·n_b) with a min-support floor of 2 shared baskets.
    // Baskets are ORDERS — TPC-H order size is a CONSTANT (1–7 lines)
    // independent of scale factor, so the basket-keyed pair self-join
    // emits ≤ 21 pairs per order and total pair mass grows LINEARLY
    // with the corpus (the q274 bound; customer-level baskets would
    // grow quadratically and are the documented wrong choice). Counts
    // stay exact integers; cosine is one rounded division; the per-item
    // cut is a WindowGroupLimit-eligible rank ≤ 3.
    Q("q415_item_cf",
      (s, d) => {
        val bp = t(s, d, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
          .distinct()
        val cnt = bp.groupBy("p").agg(count(lit(1)).as("n"))
        val co = bp.select(col("ok"), col("p").as("a"))
          .join(bp.select(col("ok"), col("p").as("b")), "ok")
          .where(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("co"))
          .where(col("co") >= 2)
        val scored = co
          .join(cnt.select(col("p").as("a"), col("n").as("na")), "a")
          .join(cnt.select(col("p").as("b"), col("n").as("nb")), "b")
          .select(col("a"), col("b"),
            (round(col("co").cast("double")
              / sqrt(col("na").cast("double") * col("nb").cast("double"))
              * 1000000.0) / 1000000.0).as("cos"))
        val sym = scored.select(col("a").as("item"), col("b").as("other"),
            col("cos"))
          .unionAll(scored.select(col("b").as("item"), col("a").as("other"),
            col("cos")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("item").orderBy(col("cos").desc, col("other"))
        sym.withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 3)
          .select(col("item"), col("rnk"), col("other"), col("cos"))
          .orderBy("item", "rnk")
      },
      Some("""WITH bp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
             |  FROM lineitem),
             |cnt AS (SELECT p, count(*) AS n FROM bp GROUP BY p),
             |co AS (SELECT a.p AS a, b.p AS b, count(*) AS co
             |  FROM bp a JOIN bp b ON a.ok = b.ok AND a.p < b.p
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |sc AS (SELECT a, b,
             |    round(CAST(co AS DOUBLE)
             |      / sqrt(CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE))
             |      * 1000000.0) / 1000000.0 AS cos
             |  FROM co JOIN cnt ca ON ca.p = a JOIN cnt cb ON cb.p = b),
             |sym AS (SELECT a AS item, b AS other, cos FROM sc
             |  UNION ALL SELECT b, a, cos FROM sc),
             |rk AS (SELECT item, other, cos, row_number()
             |    OVER (PARTITION BY item ORDER BY cos DESC, other) AS rnk
             |  FROM sym)
             |SELECT item, CAST(rnk AS INT) AS rnk, other, cos FROM rk
             |WHERE rnk <= 3 ORDER BY item, rnk""".stripMargin),
      bench = true),

    // ---- Holt linear-trend exponential smoothing over the dense daily
    // event-count series, with a 7-day-ahead forecast: the trend-aware
    // upgrade of q259's EWMA and the model q331's seasonal-naive
    // baseline is judged against. α = β = 1/2 (dyadic), and BOTH state
    // variables quantize to 1e-6 at every step (the q240 convention),
    // so the inherently-sequential recurrence is bit-identical
    // cross-engine. The corpus work is one day-keyed count; the
    // recurrence folds over the DAY-DOMAIN series (calendar-bounded
    // model state, ~90 values) in a single aggregate() pass — at
    // 100 TB the fold length is still the number of days.
    Q("q416_holt_forecast",
      (s, d) => {
        val dense = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d))
        val row = dense
          .agg(sort_array(collect_list(struct(col("day"), col("c"))))
            .as("sd"))
          .select(transform(col("sd"), x => x.getField("c").cast("double"))
            .as("ys"))
        def q6(c: org.apache.spark.sql.Column) =
          round(c * 1000000.0) / 1000000.0
        val fin = row.select(aggregate(
          org.apache.spark.sql.functions.slice(
            col("ys"), lit(2), greatest(size(col("ys")) - 1, lit(0))),
          named_struct(lit("l"), element_at(col("ys"), 1),
            lit("b"), lit(0.0)),
          (acc, y) => {
            val nl = q6((y + acc.getField("l") + acc.getField("b")) / 2.0)
            named_struct(lit("l"), nl,
              lit("b"), q6((nl - acc.getField("l") + acc.getField("b"))
                / 2.0))
          }).as("st"))
        fin.select(explode(sequence(lit(1), lit(7))).as("h"),
            col("st.l").as("level"), col("st.b").as("trend"))
          .select(col("h"),
            q6(col("level") + col("h") * col("trend")).as("forecast"),
            col("level"), col("trend"))
          .orderBy("h")
      },
      Some("""WITH RECURSIVE c AS (SELECT epoch_us(ts) // 86400000000
             |    AS day, count(*) AS c FROM events GROUP BY 1),
             |bd AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
             |dn AS (SELECT row_number() OVER (ORDER BY gs.day) AS idx,
             |    coalesce(c.c, 0) AS c
             |  FROM (SELECT unnest(generate_series(mn, mx)) AS day
             |        FROM bd) gs
             |  LEFT JOIN c USING (day)),
             |rec AS (
             |  SELECT 1 AS t, CAST(c AS DOUBLE) AS l,
             |    CAST(0.0 AS DOUBLE) AS b
             |  FROM dn WHERE idx = 1
             |  UNION ALL
             |  SELECT r.t + 1,
             |    round((CAST(d.c AS DOUBLE) + r.l + r.b) / 2.0
             |      * 1000000.0) / 1000000.0,
             |    round(((round((CAST(d.c AS DOUBLE) + r.l + r.b) / 2.0
             |        * 1000000.0) / 1000000.0 - r.l) + r.b) / 2.0
             |      * 1000000.0) / 1000000.0
             |  FROM rec r JOIN dn d ON d.idx = r.t + 1),
             |fin AS (SELECT l, b FROM rec ORDER BY t DESC LIMIT 1)
             |SELECT h, round((l + h * b) * 1000000.0) / 1000000.0
             |    AS forecast, l AS level, b AS trend
             |FROM fin CROSS JOIN
             |  (SELECT unnest(generate_series(1, 7)) AS h)
             |ORDER BY h""".stripMargin)),

    // ---- Multinomial Naive Bayes language classifier (word-level,
    // Laplace-smoothed), the GENERATIVE complement to the trained
    // discriminators (q153 char-trigram LID, q158 logreg): fit on the
    // 80% md5-hash split, confusion matrix on the held-out 20%. The
    // q153 decomposition keeps everything sparse — score(doc, L) =
    // Σ_matched k·ln(cnt_Lw+1) − m_doc·ln(tot_L+V) + ln(prior_L), so
    // only (lang, word) model rows that OCCUR join the test term table
    // (vocab join, no hint) and OOV mass rides the per-doc token count.
    // Every ln quantizes to 1e-8 decimal units at the TERM level, so
    // the argmax is an EXACT integer compare (no floating tie hazard);
    // the (doc × lang) grid explodes a literal language array (bounded
    // driver collect, the q153 pattern — never a BNLJ). Model state is
    // vocab-sized; the corpus is tokenized once.
    Q("q417_naive_bayes_langid",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        def qln8(c: org.apache.spark.sql.Column) =
          round(log(c) * 100000000.0).cast(dec)
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("lang"),
            (pmod(graft.expressions.PortableHash.md5Hash60(
              concat(lit("nb#"), col("doc_id").cast("string"))),
              lit(5L)) === 0L).as("is_test"))
          .localCheckpoint()
        val tok = docs.select(col("doc_id"), col("lang"), col("is_test"),
            explode(graft.operators.TextAnalysis.tokens(col("text")))
              .as("w"))
          .where(col("w") =!= "")
        val cw = tok.where(!col("is_test"))
          .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val tl = cw.groupBy("lang").agg(sum(col("cnt")).cast("long")
          .as("tl"))
        val vv = cw.select("w").distinct()
          .agg(count(lit(1)).cast("long").as("v"))
        val pri = docs.where(!col("is_test")).groupBy("lang")
          .agg(count(lit(1)).cast("long").as("nl"))
        val nt = docs.where(!col("is_test"))
          .agg(count(lit(1)).cast("long").as("nt"))
        val lconst = pri.join(tl, "lang").join(broadcast(vv))
          .join(broadcast(nt))
          .select(col("lang"),
            qln8(col("nl").cast("double") / col("nt").cast("double"))
              .as("cl"),
            qln8((col("tl") + col("v")).cast("double")).as("pen"))
        val langs = pri.select("lang").orderBy("lang").collect()
          .map(_.getString(0))
        val tf = tok.where(col("is_test")).groupBy("doc_id", "w")
          .agg(count(lit(1)).as("k")).localCheckpoint()
        val m = tf.groupBy("doc_id").agg(sum(col("k")).cast("long")
          .as("m"))
        val a = tf.join(cw.select(col("lang"), col("w"),
            qln8(col("cnt") + 1).as("lp")), "w")
          .groupBy("doc_id", "lang")
          .agg(sum(col("k").cast(dec) * col("lp")).as("a"))
        val grid = m.select(col("doc_id"), col("m"),
          explode(array(langs.map(lit(_)): _*)).as("lang"))
        val sc = grid
          .join(a, Seq("doc_id", "lang"), "left")
          .join(broadcast(lconst), "lang")
          .select(col("doc_id"), col("lang"),
            (coalesce(col("a"), lit(0).cast(dec))
              - col("m").cast(dec) * col("pen") + col("cl")).as("score"))
        val w2 = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("score").desc, col("lang"))
        val pred = sc.withColumn("rn", row_number().over(w2))
          .where(col("rn") === 1)
          .select(col("doc_id"), col("lang").as("pred_lang"))
        pred.join(docs.select(col("doc_id"), col("lang").as("true_lang")),
            "doc_id")
          .groupBy("true_lang", "pred_lang")
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy("true_lang", "pred_lang")
      },
      Some("""WITH dc AS (SELECT doc_id, text, lang,
             |    CAST(('0x' || substr(md5('nb#' || CAST(doc_id AS VARCHAR)),
             |      1, 15)) AS BIGINT) % 5 = 0 AS is_test
             |  FROM documents),
             |tk AS (SELECT * FROM (SELECT doc_id, lang, is_test,
             |    unnest(string_split(text, ' ')) AS w FROM dc)
             |  WHERE w <> ''),
             |cw AS MATERIALIZED (SELECT lang, w, count(*) AS cnt FROM tk
             |  WHERE NOT is_test GROUP BY 1, 2),
             |tl AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS tl FROM cw
             |  GROUP BY lang),
             |vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM cw),
             |pri AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl FROM dc
             |  WHERE NOT is_test GROUP BY lang),
             |ntr AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM dc
             |  WHERE NOT is_test),
             |tf AS MATERIALIZED (SELECT doc_id, w, count(*) AS k FROM tk
             |  WHERE is_test GROUP BY 1, 2),
             |m AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS m FROM tf
             |  GROUP BY doc_id),
             |a AS (SELECT tf.doc_id, cw.lang,
             |    sum(CAST(tf.k AS HUGEINT)
             |      * CAST(round(ln(cw.cnt + 1) * 100000000.0) AS HUGEINT))
             |      AS a
             |  FROM tf JOIN cw ON tf.w = cw.w GROUP BY 1, 2),
             |lc AS (SELECT pri.lang,
             |    CAST(round(ln(CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE))
             |      * 100000000.0) AS HUGEINT) AS cl,
             |    CAST(round(ln(CAST(tl + v AS DOUBLE)) * 100000000.0)
             |      AS HUGEINT) AS pen
             |  FROM pri JOIN tl USING (lang) CROSS JOIN vv CROSS JOIN ntr),
             |sc AS (SELECT m.doc_id, lc.lang,
             |    coalesce(a.a, 0) - CAST(m.m AS HUGEINT) * pen + cl
             |      AS score
             |  FROM m CROSS JOIN lc
             |  LEFT JOIN a ON a.doc_id = m.doc_id AND a.lang = lc.lang),
             |pred AS (SELECT doc_id, lang AS pred_lang FROM (
             |    SELECT *, row_number() OVER (PARTITION BY doc_id
             |      ORDER BY score DESC, lang) AS rn FROM sc)
             |  WHERE rn = 1)
             |SELECT dc.lang AS true_lang, pred_lang,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM pred JOIN dc USING (doc_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      bench = true),

    // ---- DCT perceptual hash (pHash) over REAL decoded pixels: the
    // frequency-domain image fingerprint (q147 aHash's sibling — bits
    // encode low-frequency structure, so localized high-frequency edits
    // that can flip an aHash block bit barely move any kept
    // coefficient). The orthonormal DCT-II
    // basis is QUANTIZED to 1e-6 integer units with the normalization
    // folded in (Multimodal.dctTableQ6), and the SAME integer table is
    // embedded verbatim in this oracle as literal VALUES — so both
    // engines fold identical integers: coefficients are exact Longs
    // (≤ ~8.4e15), the threshold is the exact order-statistic median of
    // the 63 non-DC coefficients, every bit an integer compare. Decode +
    // DCT run in one mapPartitions pass, no shuffle; signatures feed
    // Dedup.hammingPairs downstream (q148 machinery).
    Q("q418_image_phash",
      (s, d) => graft.operators.Multimodal.imagePHash(
          s, graft.operators.Multimodal.pngAssets(
            s, t(s, d, "documents").where(col("doc_id") % 5 === 0)))
        .orderBy("doc_id"),
      Some {
        val tb = graft.operators.Multimodal.dctTableQ6(16)
        val vals = (for { u <- 0 until 8; x <- 0 until 16 }
          yield s"($u, $x, ${tb(u)(x)})").mkString(", ")
        s"""WITH t(u, x, c) AS (VALUES $vals),
           |px AS (SELECT doc_id, x, y,
           |    ((x + 1) * (doc_id % 7 + 3) * 7
           |      + (y + 1) * (doc_id % 7 + 5) * 11) % 256
           |      + CASE WHEN doc_id % 4 = 0 AND x = 0 AND y = 0
           |        THEN 8 ELSE 0 END AS v
           |  FROM documents, range(16) rx(x), range(16) ry(y)
           |  WHERE doc_id % 5 = 0),
           |co AS (SELECT px.doc_id, tu.u AS u, tv.u AS v,
           |    sum(CAST(px.v AS HUGEINT) * tu.c * tv.c) AS k
           |  FROM px JOIN t tu ON tu.x = px.x JOIN t tv ON tv.x = px.y
           |  GROUP BY 1, 2, 3),
           |med AS (SELECT doc_id, k AS mk FROM (
           |    SELECT doc_id, k, row_number() OVER (PARTITION BY doc_id
           |      ORDER BY k, u, v) AS rn
           |    FROM co WHERE NOT (u = 0 AND v = 0)) WHERE rn = 32),
           |bits AS (SELECT co.doc_id, co.u, co.v,
           |    CASE WHEN co.k > med.mk THEN '1' ELSE '0' END AS bit
           |  FROM co JOIN med USING (doc_id))
           |SELECT doc_id, string_agg(bit, '' ORDER BY u, v) AS phash
           |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // ---- Sharp regression discontinuity: local linear fit on each
    // side of a $150k order-value cutoff (bandwidth ±$100k), outcome =
    // urgent-priority share; effect = right-intercept − left-intercept
    // AT the cutoff (running variable centered, so the intercept IS the
    // boundary value). The causal-estimator family's boundary design,
    // next to DiD (q394), CUPED (q273), matching (q279) and IPS (q310).
    // Both side fits come from ONE global aggregation of conditional
    // exact sums (cents-quantized running variable, 0/1 outcome,
    // decimal(38,0) cross terms — no per-side pass, no shuffle beyond
    // the single-row agg); the OLS identities divide once in double.
    Q("q419_regression_discontinuity",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val cC = 15000000L; val hC = 10000000L
        val rows = t(s, d, "orders")
          .select((round(col("o_totalprice") * 100.0).cast("long") - cC)
            .as("x"),
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L).as("y"))
          .where(abs(col("x")) <= hC)
          .select(col("x"), col("y"), (col("x") < 0).as("lft"))
        def cs(side: Boolean, c: org.apache.spark.sql.Column) =
          sum(when(col("lft") === side, c).otherwise(lit(0L).cast(dec)))
        def sums(side: Boolean, sfx: String) = Seq(
          cs(side, lit(1L).cast(dec)).as(s"n$sfx"),
          cs(side, col("x").cast(dec)).as(s"sx$sfx"),
          cs(side, col("x").cast(dec) * col("x").cast(dec)).as(s"sxx$sfx"),
          cs(side, col("y").cast(dec)).as(s"sy$sfx"),
          cs(side, col("x").cast(dec) * col("y").cast(dec)).as(s"sxy$sfx"))
        val agg0 = sums(true, "l") ++ sums(false, "r")
        val m = rows.agg(agg0.head, agg0.tail: _*)
        def dd(c: String) = col(c).cast("double")
        def a(sfx: String) =
          (dd(s"sxx$sfx") * dd(s"sy$sfx") - dd(s"sx$sfx") * dd(s"sxy$sfx")) /
            (dd(s"n$sfx") * dd(s"sxx$sfx") - dd(s"sx$sfx") * dd(s"sx$sfx"))
        def q6(c: org.apache.spark.sql.Column) =
          round(c * 1000000.0) / 1000000.0
        m.select(col("nl").cast("long").as("n_left"),
          col("nr").cast("long").as("n_right"),
          q6(a("l")).as("a_left"), q6(a("r")).as("a_right"),
          q6(a("r") - a("l")).as("effect"))
      },
      Some("""WITH r0 AS (SELECT
             |    CAST(round(o_totalprice * 100.0) AS BIGINT) - 15000000
             |      AS x,
             |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |      THEN 1 ELSE 0 END AS y
             |  FROM orders),
             |rw AS (SELECT x, y, x < 0 AS lft FROM r0
             |  WHERE abs(x) <= 10000000),
             |m AS (SELECT
             |    sum(CASE WHEN lft THEN CAST(1 AS HUGEINT) ELSE 0 END) AS nl,
             |    sum(CASE WHEN lft THEN CAST(x AS HUGEINT) ELSE 0 END) AS sxl,
             |    sum(CASE WHEN lft THEN CAST(x AS HUGEINT) * CAST(x AS HUGEINT) ELSE 0 END) AS sxxl,
             |    sum(CASE WHEN lft THEN CAST(y AS HUGEINT) ELSE 0 END) AS syl,
             |    sum(CASE WHEN lft THEN CAST(x AS HUGEINT) * CAST(y AS HUGEINT) ELSE 0 END) AS sxyl,
             |    sum(CASE WHEN NOT lft THEN CAST(1 AS HUGEINT) ELSE 0 END) AS nr,
             |    sum(CASE WHEN NOT lft THEN CAST(x AS HUGEINT) ELSE 0 END) AS sxr,
             |    sum(CASE WHEN NOT lft THEN CAST(x AS HUGEINT) * CAST(x AS HUGEINT) ELSE 0 END) AS sxxr,
             |    sum(CASE WHEN NOT lft THEN CAST(y AS HUGEINT) ELSE 0 END) AS syr,
             |    sum(CASE WHEN NOT lft THEN CAST(x AS HUGEINT) * CAST(y AS HUGEINT) ELSE 0 END) AS sxyr
             |  FROM rw)
             |SELECT CAST(nl AS BIGINT) AS n_left,
             |  CAST(nr AS BIGINT) AS n_right,
             |  round((CAST(sxxl AS DOUBLE) * CAST(syl AS DOUBLE)
             |      - CAST(sxl AS DOUBLE) * CAST(sxyl AS DOUBLE))
             |    / (CAST(nl AS DOUBLE) * CAST(sxxl AS DOUBLE)
             |      - CAST(sxl AS DOUBLE) * CAST(sxl AS DOUBLE))
             |    * 1000000.0) / 1000000.0 AS a_left,
             |  round((CAST(sxxr AS DOUBLE) * CAST(syr AS DOUBLE)
             |      - CAST(sxr AS DOUBLE) * CAST(sxyr AS DOUBLE))
             |    / (CAST(nr AS DOUBLE) * CAST(sxxr AS DOUBLE)
             |      - CAST(sxr AS DOUBLE) * CAST(sxr AS DOUBLE))
             |    * 1000000.0) / 1000000.0 AS a_right,
             |  round(((CAST(sxxr AS DOUBLE) * CAST(syr AS DOUBLE)
             |      - CAST(sxr AS DOUBLE) * CAST(sxyr AS DOUBLE))
             |    / (CAST(nr AS DOUBLE) * CAST(sxxr AS DOUBLE)
             |      - CAST(sxr AS DOUBLE) * CAST(sxr AS DOUBLE))
             |    - (CAST(sxxl AS DOUBLE) * CAST(syl AS DOUBLE)
             |      - CAST(sxl AS DOUBLE) * CAST(sxyl AS DOUBLE))
             |    / (CAST(nl AS DOUBLE) * CAST(sxxl AS DOUBLE)
             |      - CAST(sxl AS DOUBLE) * CAST(sxl AS DOUBLE)))
             |    * 1000000.0) / 1000000.0 AS effect
             |FROM m""".stripMargin)),

    // ---- Markov next-event predictor, evaluated honestly: transition
    // counts fit on the 80% md5-hash USER split (q189's lag
    // convention), top-1 prediction per from-type ((n desc, to asc)
    // argmax — WindowGroupLimit cut on the |types|²-sized model), then
    // per-from accuracy on the held-out users' consecutive pairs. The
    // model is types²-bounded and broadcasts back; the corpus work is
    // one user-partitioned lag window shared by both splits.
    Q("q420_markov_predictor",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"),
            (pmod(graft.expressions.PortableHash.md5Hash60(
              concat(lit("mk#"), col("user_id").cast("string"))),
              lit(5L)) === 0L).as("is_test"))
        val byUser = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val pairs = ev
          .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
          .where(col("from_type").isNotNull)
          .select(col("is_test"), col("from_type"),
            col("event_type").as("to_type"))
          .localCheckpoint()
        val model = pairs.where(!col("is_test"))
          .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        val wR = org.apache.spark.sql.expressions.Window
          .partitionBy("from_type")
          .orderBy(col("n").desc, col("to_type"))
        val pred = model.withColumn("rn", row_number().over(wR))
          .where(col("rn") === 1)
          .select(col("from_type"), col("to_type").as("pred_type"))
        pairs.where(col("is_test"))
          .join(broadcast(pred), "from_type")
          .groupBy("from_type")
          .agg(max(col("pred_type")).as("pred_type"),
            count(lit(1)).cast("long").as("n_pairs"),
            sum(when(col("to_type") === col("pred_type"), 1L)
              .otherwise(0L)).cast("long").as("n_correct"))
          .select(col("from_type"), col("pred_type"), col("n_pairs"),
            col("n_correct"),
            (round(col("n_correct").cast("double")
              / col("n_pairs").cast("double") * 1000000.0) / 1000000.0)
              .as("accuracy"))
          .orderBy("from_type")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, ts, event_id,
             |    CAST(('0x' || substr(md5('mk#'
             |      || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 5
             |      = 0 AS is_test
             |  FROM events),
             |p AS (SELECT is_test, lag(event_type) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id)
             |      AS from_type,
             |    event_type AS to_type
             |  FROM ev),
             |pr AS (SELECT * FROM p WHERE from_type IS NOT NULL),
             |n AS (SELECT from_type, to_type, count(*) AS n FROM pr
             |  WHERE NOT is_test GROUP BY 1, 2),
             |pred AS (SELECT from_type, to_type AS pred_type FROM (
             |    SELECT *, row_number() OVER (PARTITION BY from_type
             |      ORDER BY n DESC, to_type) AS rn FROM n)
             |  WHERE rn = 1)
             |SELECT pr.from_type, max(pred_type) AS pred_type,
             |  CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST(sum(CASE WHEN to_type = pred_type THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_correct,
             |  round(CAST(sum(CASE WHEN to_type = pred_type THEN 1
             |      ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS accuracy
             |FROM pr JOIN pred USING (from_type)
             |WHERE pr.is_test
             |GROUP BY pr.from_type ORDER BY pr.from_type""".stripMargin)),

    // ---- Video near-duplicate pairs over REAL decode, end-to-end:
    // motif MJPEG assets → ISO-BMFF demux → per-frame pixel decode →
    // integer luma signatures → two-probe bucket-blocked pairing with
    // an exact framewise max-|Δ| verify (never all-pairs). FULLY
    // ORACLED since r14: the fixtures are FlatJpeg frames (flat blocks
    // under a DC-8 quant table decode exactly to the encoded level in
    // any conformant decoder) and the signature reads the raw raster,
    // so every luma is the closed-form function of doc_id below — the
    // oracle recomputes signatures AND the exact pair set, which the
    // two-probe blocking provably equals at tol=2 (|Δbucket| ≤ 1).
    // Blocked==brute-force is additionally spec-checked
    // (PipelineOpsSpec).
    Q("q421_video_neardup",
      (s, d) => {
        import graft.operators.Multimodal
        Multimodal.videoNearDupPairs(
          Multimodal.videoLumaSig(s, Multimodal.vidMotifAssets(
            s, t(s, d, "documents").where(col("doc_id") % 5 === 0))))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH v AS (SELECT doc_id, 2 + doc_id % 2 AS n
             |  FROM documents WHERE doc_id % 5 = 0),
             |f AS (SELECT doc_id, n, i,
             |    ((doc_id % 7) * 29 + i * 41) % 256
             |      + CASE WHEN doc_id % 4 = 0 AND i = 0 THEN 1 ELSE 0 END
             |      AS luma
             |  FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM v))
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(a.n AS INT) AS n_frames,
             |  CAST(max(abs(a.luma - b.luma)) AS BIGINT) AS max_dluma
             |FROM f a JOIN f b ON a.i = b.i AND a.n = b.n
             |  AND a.doc_id < b.doc_id
             |GROUP BY 1, 2, 3
             |HAVING max(abs(a.luma - b.luma)) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- Generation-artifact filter battery: the model-output noise
    // patterns the Gopher/CCNet batteries (q134/q131) don't target —
    // (1) degenerate repetition loops ("the the the …") as the longest
    // run of consecutive identical tokens, computed scan-speed by ONE
    // aggregate() fold carrying (prev, cur, best) — no window, no
    // shuffle; (2) mojibake/control-character density (U+FFFD +
    // C0-minus-whitespace) by regex length-difference; (3) exact-token
    // blocklist hits via a literal-array filter HOF. The keep verdict
    // conjoins all three. Oracle replays the run detection as the
    // classic lag/island SQL — a DIFFERENT algorithm agreeing with the
    // fold — and the other two columns formula-for-formula.
    Q("q422_artifact_filters",
      (s, d) => {
        val bad = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\uFFFD]"
        val block = Seq("free", "click", "subscribe", "winner")
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("text"),
            graft.operators.TextAnalysis.tokens(col("text")).as("w"))
        val run = aggregate(col("w"),
          named_struct(lit("prev"), lit(""), lit("cur"), lit(0L),
            lit("best"), lit(0L)),
          (acc, x) => {
            val cur = when(x === acc.getField("prev"),
              acc.getField("cur") + 1).otherwise(lit(1L))
            named_struct(lit("prev"), x, lit("cur"), cur,
              lit("best"), greatest(acc.getField("best"), cur))
          },
          acc => acc.getField("best"))
        docs.select(col("doc_id"), run.as("max_run"),
            (length(col("text")) -
              length(regexp_replace(col("text"), bad, "")))
              .cast("long").as("n_bad_chars"),
            size(filter(col("w"), x => x.isin(block: _*))).cast("long")
              .as("blocklist_hits"))
          .select(col("doc_id"), col("max_run"), col("n_bad_chars"),
            col("blocklist_hits"),
            (col("max_run") <= 4 && col("n_bad_chars") === 0 &&
              col("blocklist_hits") <= 2).as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, text,
             |    string_split(text, ' ') AS w FROM documents),
             |tk AS (SELECT doc_id,
             |    unnest([{'i': i, 't': w[i]}
             |      for i in range(1, len(w) + 1)], recursive := true)
             |  FROM w),
             |g AS (SELECT doc_id, i, t,
             |    CASE WHEN lag(t) OVER (PARTITION BY doc_id ORDER BY i)
             |      = t THEN 0 ELSE 1 END AS brk
             |  FROM tk),
             |gi AS (SELECT doc_id, i, t,
             |    sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS grp
             |  FROM g),
             |runs AS (SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_run
             |  FROM (SELECT doc_id, grp, count(*) AS cnt FROM gi
             |        GROUP BY 1, 2) GROUP BY doc_id),
             |dl AS (SELECT doc_id,
             |    CAST(length(text) - length(regexp_replace(text,
             |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x{FFFD}]', '', 'g'))
             |      AS BIGINT) AS n_bad_chars,
             |    CAST(len(list_filter(string_split(text, ' '), x ->
             |      x IN ('free', 'click', 'subscribe', 'winner')))
             |      AS BIGINT) AS blocklist_hits
             |  FROM documents)
             |SELECT runs.doc_id, max_run, n_bad_chars, blocklist_hits,
             |  max_run <= 4 AND n_bad_chars = 0 AND blocklist_hits <= 2
             |    AS keep
             |FROM runs JOIN dl ON runs.doc_id = dl.doc_id
             |ORDER BY 1""".stripMargin),
      bench = true),

    // ---- Expected steps to purchase (absorbing Markov chain): the
    // truncated-expectation recurrence x' = round₉(1 + P_transient·x)
    // iterated 30 rounds under the q240 quantize-per-round discipline —
    // every round an exact integer vector, bit-identical cross-engine;
    // the answer is "how many more events until this user type
    // converts, counting paths of length ≤ 30" (geometric convergence
    // from below). Model contract is q240's: |types|² counts collect to
    // the driver, output |types|−1 rows; the oracle unrolls all 30
    // rounds as materialized CTEs.
    Q("q423_absorbing_steps",
      (s, d) => graft.operators.EventOps
        .absorbingSteps(Tables.events(s, d)),
      Some {
        val roundCtes = (1 to 30).map { r =>
          s"""x$r AS MATERIALIZED (SELECT t.s,
             |    CAST(round((1.0 + coalesce(a.acc, 0.0)) * 1000000000.0)
             |      AS BIGINT) AS q
             |  FROM tr t LEFT JOIN (
             |    SELECT m.from_type AS s,
             |        sum((xp.q / 1000000000.0)
             |          * (CAST(m.n AS DOUBLE) / CAST(t2.tot AS DOUBLE)))
             |          AS acc
             |    FROM x${r - 1} xp JOIN n m ON m.to_type = xp.s
             |    JOIN tt t2 ON t2.from_type = m.from_type
             |    GROUP BY m.from_type) a ON a.s = t.s)""".stripMargin
        }.mkString(",\n")
        s"""WITH p AS (SELECT lag(event_type) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS from_type,
           |    event_type AS to_type FROM events),
           |n AS MATERIALIZED (SELECT from_type, to_type, count(*) AS n
           |  FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2),
           |tt AS (SELECT from_type, sum(n) AS tot FROM n GROUP BY 1),
           |st AS (SELECT DISTINCT from_type AS s FROM n
           |  UNION SELECT DISTINCT to_type FROM n),
           |tr AS (SELECT s FROM st WHERE s <> 'purchase'),
           |x0 AS (SELECT s, CAST(0 AS BIGINT) AS q FROM tr),
           |$roundCtes
           |SELECT t.s AS from_type,
           |  CASE WHEN t2.tot IS NOT NULL THEN x30.q END AS steps_q,
           |  CASE WHEN t2.tot IS NOT NULL THEN
           |    round(CAST(x30.q AS DOUBLE) / 1000.0) / 1000000.0
           |  END AS exp_steps,
           |  round(coalesce(CAST(pn.n AS DOUBLE)
           |      / CAST(t2.tot AS DOUBLE), 0.0) * 1000000.0)
           |    / 1000000.0 AS p_direct
           |FROM tr t JOIN x30 ON x30.s = t.s
           |LEFT JOIN n pn ON pn.from_type = t.s
           |  AND pn.to_type = 'purchase'
           |LEFT JOIN tt t2 ON t2.from_type = t.s
           |ORDER BY 1""".stripMargin
      }),

    // ---- External cluster validity — purity and NMI of the q129
    // k-means partition against the embeddings' ground-truth labels:
    // the supervised complement to the internal indices (silhouette
    // q248, Davies-Bouldin q339, Calinski-Harabasz q340). Everything
    // flows from the k×|labels| contingency (model-sized,
    // localCheckpoint'd): purity = Σ_c max_l / N, NMI =
    // I(C;L)/√(H(C)·H(L)) under the q314 ln conventions (≤ 16 term
    // sums; display-rounded 1e-6). The oracle replays the full Lloyd
    // chain, then the same contingency algebra.
    Q("q424_cluster_purity_nmi",
      (s, d) => {
        val asg = graft.operators.Clustering
          .kMeansAssign(t(s, d, "embeddings"), k = 4, iters = 3)
          .select(col("vec_id"), col("cluster"))
        val lab = t(s, d, "embeddings").select(col("vec_id"), col("label"))
        val cells = asg.join(lab, "vec_id").groupBy("cluster", "label")
          .agg(count(lit(1)).as("o")).localCheckpoint()
        val rm = cells.groupBy("cluster")
          .agg(sum("o").as("ri"), max("o").as("mx"))
        val cmt = cells.groupBy("label").agg(sum("o").as("cj"))
        val tot = cells.agg(sum("o").as("n"))
        val nD = col("n").cast("double")
        val term = (col("o").cast("double") / nD) *
          log((col("o").cast("double") * nD) /
            (col("ri").cast("double") * col("cj").cast("double")))
        val mi = cells.join(broadcast(rm), Seq("cluster"))
          .join(broadcast(cmt), Seq("label")).join(broadcast(tot))
          .agg(sum(term).as("mi"))
        val hx = rm.join(broadcast(tot))
          .agg(sum(-(col("ri").cast("double") / nD) *
            log(col("ri").cast("double") / nD)).as("hc"))
        val hy = cmt.join(broadcast(tot))
          .agg(sum(-(col("cj").cast("double") / nD) *
            log(col("cj").cast("double") / nD)).as("hl"))
        val pur = rm.agg(sum("mx").as("smx")).join(broadcast(tot))
          .select((col("smx").cast("double") / nD).as("purity"))
        mi.join(hx).join(hy).join(pur)
          .select((round(col("purity") * 1000000.0) / 1000000.0)
              .as("purity"),
            (round(col("mi") * 1000000.0) / 1000000.0).as("mi_nats"),
            (round(col("mi") / sqrt(col("hc") * col("hl")) * 1000000.0)
              / 1000000.0).as("nmi"))
      },
      Some(s"""WITH ${kmeansCtes(4, 3, 64)},
              |cl AS (SELECT s.vid, s.cid AS cluster, e2.label
              |  FROM sfin s JOIN embeddings e2 ON e2.vec_id = s.vid),
              |cells AS (SELECT cluster, label, count(*) AS o FROM cl
              |  GROUP BY 1, 2),
              |rm AS (SELECT cluster, sum(o) AS ri, max(o) AS mx
              |  FROM cells GROUP BY cluster),
              |cmt AS (SELECT label, sum(o) AS cj FROM cells
              |  GROUP BY label),
              |tt AS (SELECT sum(o) AS n FROM cells),
              |mi AS (SELECT sum((CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
              |    * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
              |      / (CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)))) AS mi
              |  FROM cells JOIN rm USING (cluster) JOIN cmt USING (label)
              |  CROSS JOIN tt),
              |hx AS (SELECT sum(-(CAST(ri AS DOUBLE) / CAST(n AS DOUBLE))
              |    * ln(CAST(ri AS DOUBLE) / CAST(n AS DOUBLE))) AS hc
              |  FROM rm CROSS JOIN tt),
              |hy AS (SELECT sum(-(CAST(cj AS DOUBLE) / CAST(n AS DOUBLE))
              |    * ln(CAST(cj AS DOUBLE) / CAST(n AS DOUBLE))) AS hl
              |  FROM cmt CROSS JOIN tt),
              |pu AS (SELECT CAST(sum(mx) AS DOUBLE) / CAST(n AS DOUBLE)
              |    AS purity FROM rm CROSS JOIN tt GROUP BY n)
              |SELECT round(purity * 1000000.0) / 1000000.0 AS purity,
              |  round(mi * 1000000.0) / 1000000.0 AS mi_nats,
              |  round(mi / sqrt(hc * hl) * 1000000.0) / 1000000.0 AS nmi
              |FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN pu""".stripMargin)),

    // ---- Active-learning uncertainty sampling: the 20 docs nearest
    // the q158 classifier's decision boundary (smallest |score − ½| on
    // the 1e-6-rounded score — a deterministic total order with the
    // doc_id tiebreak), the batch a labeling loop would query next.
    // The scoring scan is q159's literal-model codegen projection; the
    // cut is TakeOrderedAndProject (never a corpus-wide rank window).
    Q("q425_uncertainty_sampling",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.QualityClassifier.score(docs, logregModel(docs))
          .select(col("doc_id"), col("score"),
            abs(col("score") - 0.5).as("uncertainty"))
          .orderBy(col("uncertainty"), col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH ${logregCtes(3)}
              |SELECT doc_id, score, abs(score - 0.5) AS uncertainty
              |FROM (
              |  SELECT doc_id,
              |    round(1.0/(1.0 + exp(-(w1*(x1/1000000.0)
              |      + w2*(x2/1000000.0) + w3*(x3/1000000.0)
              |      + w4*(x4/1000000.0) + w5*(x5/1000000.0))))
              |      * 1000000.0)/1000000.0 AS score
              |  FROM fx CROSS JOIN wfin)
              |ORDER BY uncertainty, doc_id LIMIT 20""".stripMargin)),

    // ---- Facility-location greedy subset selection (submodular
    // coverage coreset) over the audit prefix: 8 greedy picks
    // maximizing the marginal coverage gain Σ_v max(0, s(v,j) −
    // cover(v)) with s the rounded-cosine contract shifted to
    // nonnegative integer micro-units — every gain an EXACT long, the
    // q260 discipline, so the (gain desc, id) argmax is drift-free.
    // The oracle unrolls all 8 greedy rounds as materialized CTEs
    // (gain relation → 1-row pick → coverage update).
    Q("q426_facility_location",
      (s, d) => graft.operators.Similarity
        .facilityLocationSelect(t(s, d, "embeddings"), k = 8,
          prefix = 100),
      Some {
        // Similarity replayed in the version-stable quantized-integer
        // contract (NOT list_cosine_similarity, whose internal fold can
        // drift a ulp across DuckDB builds and flip the 1e6 round):
        // integer dots are exact, then one IEEE op each for product /
        // sqrt / divide / scale. gain pinned to BIGINT — an unpinned
        // sum(BIGINT) is HUGEINT, whose pandas conversion is
        // stack-version-dependent.
        val rounds = (1 to 8).map { r =>
          val excl = if (r == 1) ""
          else "WHERE s.ib NOT IN (" +
            (1 until r).map(i => s"SELECT j FROM pk$i")
              .mkString(" UNION ALL ") + ")"
          s"""gr$r AS MATERIALIZED (SELECT s.ib AS j,
             |    CAST(sum(greatest(s.sq - c.cov, 0)) AS BIGINT) AS gain
             |  FROM s JOIN c${r - 1} c ON c.v = s.ia $excl
             |  GROUP BY s.ib),
             |pk$r AS MATERIALIZED (SELECT j, gain FROM gr$r
             |  ORDER BY gain DESC, j LIMIT 1),
             |c$r AS MATERIALIZED (SELECT c.v,
             |    greatest(c.cov, s.sq) AS cov
             |  FROM c${r - 1} c JOIN s ON s.ia = c.v
             |  JOIN pk$r ON s.ib = pk$r.j)""".stripMargin
        }.mkString(",\n")
        s"""WITH e0 AS MATERIALIZED (SELECT vec_id,
           |    [CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)
           |      for x in embedding] AS q
           |  FROM embeddings WHERE vec_id < 100),
           |e AS MATERIALIZED (SELECT vec_id, q,
           |    list_reduce([q[i+1]*q[i+1] for i in range(0,64)],
           |      (a,b) -> a+b) AS nn
           |  FROM e0),
           |s AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib,
           |    CAST(round(CAST(list_reduce(
           |        [a.q[i+1]*b.q[i+1] for i in range(0,64)],
           |        (x,y) -> x+y) AS DOUBLE)
           |      / sqrt(CAST(a.nn AS DOUBLE) * CAST(b.nn AS DOUBLE))
           |      * 1000000.0) AS BIGINT) + 1000000 AS sq
           |  FROM e a CROSS JOIN e b),
           |c0 AS (SELECT vec_id AS v, CAST(0 AS BIGINT) AS cov FROM e),
           |$rounds
           |SELECT rank, j AS vec_id, gain AS gain_q,
           |  round(CAST(gain AS DOUBLE) / 100.0) / 10000.0 AS gain
           |FROM (${(1 to 8).map(r =>
              s"SELECT $r AS rank, j, gain FROM pk$r")
              .mkString(" UNION ALL ")})
           |ORDER BY rank""".stripMargin
      }),

    // ---- Rolling 7-day distinct users via MERGEABLE HyperLogLog
    // registers — the property that makes sketches worth shipping:
    // q413's construction per (day, bucket), then each day's window
    // merge is a bucket-partitioned range-window MAX over the DENSE
    // day×256 register grid (model-sized — no corpus rescan per
    // window), the exact fold and LC branch as q413. The exact audit
    // column is the q234 explode-to-target-days shape. Completes the
    // merge set: Bloom OR-merge (q145), count-min cell-sum (q144),
    // KMV union (q146), HLL register-max (here).
    Q("q427_hll_rolling",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ev = Tables.events(s, d)
          .select(expr("ts div 86400000000000").as("day"), col("user_id"),
            graft.expressions.PortableHash.md5Hash60(col("user_id"))
              .as("h"))
          .localCheckpoint()
        val reg = ev
          .select(col("day"), col("h").bitwiseAND(lit(255L)).as("bucket"),
            shiftright(col("h"), 8).as("rest"))
          .select(col("day"), col("bucket"),
            when(col("rest") === 0, lit(53))
              .otherwise(lit(53) - length(bin(col("rest")))).as("rho"))
          .groupBy("day", "bucket").agg(max(col("rho")).as("m"))
        val days = ev.agg(min("day").as("mn"), max("day").as("mx"))
          .select(explode(sequence(col("mn"), col("mx"))).as("day"))
          .localCheckpoint()
        val grid = days
          .select(col("day"), explode(sequence(lit(0L), lit(255L)))
            .as("bucket"))
          .join(reg, Seq("day", "bucket"), "left")
          .select(col("day"), col("bucket"),
            coalesce(col("m"), lit(0)).as("m"))
        val wnd = org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy("day").rangeBetween(-6, 0)
        val merged = grid.withColumn("mm", max(col("m")).over(wnd))
        val fold = merged.groupBy("day").agg(
          sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - mm)").cast(dec))
            .as("z"),
          sum(when(col("mm") === 0, 1L).otherwise(0L)).cast("long")
            .as("v"))
        val eRaw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
          lit(65536.0) * lit(9007199254740992.0) / col("z").cast("double")
        val lc = round(log(lit(256.0) / col("v").cast("double")) *
          1.0e8) / 1.0e8 * 256.0
        val est = fold.select(col("day"),
          (round(when(col("v") > 0 && eRaw <= 640.0, lc).otherwise(eRaw)
            * 10000.0) / 10000.0).as("est"))
        val exact = ev.select(col("day"), col("user_id")).distinct()
          .join(broadcast(days.select(col("day").as("tday"))),
            col("day").between(col("tday") - 6, col("tday")))
          .groupBy("tday")
          .agg(countDistinct(col("user_id")).as("exact_distinct"))
          .select(col("tday").as("day"), col("exact_distinct"))
        est.join(exact, "day")
          .select(col("day"), col("est"), col("exact_distinct"),
            (round(abs(col("est") - col("exact_distinct").cast("double"))
              / col("exact_distinct").cast("double") * 1000000.0)
              / 1000000.0).as("rel_err"))
          .orderBy("day")
      },
      Some("""WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    user_id,
             |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
             |      AS BIGINT) AS h
             |  FROM events),
             |reg AS (SELECT day, h & 255 AS bucket,
             |    max(CASE WHEN (h >> 8) = 0 THEN 53
             |        ELSE 53 - length(bin(h >> 8)) END) AS m
             |  FROM ev GROUP BY 1, 2),
             |bd AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
             |days AS (SELECT unnest(generate_series(mn, mx)) AS day
             |  FROM bd),
             |grid AS (SELECT d.day, b.bucket, coalesce(reg.m, 0) AS m
             |  FROM days d CROSS JOIN (SELECT unnest(generate_series(0,
             |    255)) AS bucket) b
             |  LEFT JOIN reg ON reg.day = d.day
             |    AND reg.bucket = b.bucket),
             |merged AS (SELECT day, bucket, max(m) OVER (
             |    PARTITION BY bucket ORDER BY day
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS mm
             |  FROM grid),
             |fold AS (SELECT day,
             |    CAST(sum(1::BIGINT << (53 - mm)) AS HUGEINT) AS z,
             |    CAST(sum(CASE WHEN mm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS v
             |  FROM merged GROUP BY day),
             |est AS (SELECT day,
             |    round(CASE WHEN v > 0
             |        AND 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
             |          * 9007199254740992.0 / CAST(z AS DOUBLE) <= 640.0
             |      THEN round(ln(256.0 / CAST(v AS DOUBLE))
             |          * 100000000.0) / 100000000.0 * 256.0
             |      ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
             |        * 9007199254740992.0 / CAST(z AS DOUBLE) END
             |      * 10000.0) / 10000.0 AS est
             |  FROM fold),
             |ex AS (SELECT d.day,
             |    count(DISTINCT e.user_id) AS exact_distinct
             |  FROM days d JOIN (SELECT DISTINCT day, user_id FROM ev) e
             |    ON e.day BETWEEN d.day - 6 AND d.day
             |  GROUP BY d.day)
             |SELECT est.day, est, exact_distinct,
             |  round(abs(est - CAST(exact_distinct AS DOUBLE))
             |    / CAST(exact_distinct AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS rel_err
             |FROM est JOIN ex ON est.day = ex.day
             |ORDER BY 1""".stripMargin),
      bench = true),

    // ---- Strongly connected components of the DIRECTED thresholded
    // trade graph — the directed structure the undirected CC / k-core /
    // eccentricity family can't express ("which nation groups trade
    // mutually, not just heavily"): reachability closure by 5 DOUBLING
    // self-joins (paths ≤ 2³² ≫ diameter), scc(v) = min mutual-reach
    // label via one semi-join of the closure against its transpose —
    // exact set algebra, no floats anywhere. The oracle computes the
    // same closure as ONE recursive CTE (unbounded — equal because the
    // doubling rounds exceed the diameter).
    Q("q428_scc",
      (s, d) => graft.operators.GraphOps
        .scc(tradeEdges(s, d), rounds = 5).orderBy("node"),
      Some("""WITH RECURSIVE
             |raw AS (SELECT cn.n_name AS src, sn.n_name AS dst,
             |    count(*) AS w
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation cn ON c_nationkey = cn.n_nationkey
             |  JOIN nation sn ON s_nationkey = sn.n_nationkey
             |  GROUP BY 1, 2),
             |aw AS (SELECT avg(w) AS aw FROM raw),
             |ed AS (SELECT DISTINCT src AS s, dst AS d FROM raw, aw
             |  WHERE w > aw AND src <> dst),
             |nodes AS (SELECT s AS n FROM ed UNION SELECT d FROM ed),
             |reach AS (SELECT n AS s, n AS d FROM nodes
             |  UNION SELECT r.s, e.d FROM reach r JOIN ed e
             |    ON e.s = r.d),
             |mut AS (SELECT a.s, a.d FROM reach a JOIN reach b
             |  ON b.s = a.d AND b.d = a.s),
             |lab AS (SELECT s AS node, min(d) AS scc FROM mut
             |  GROUP BY s),
             |sz AS (SELECT scc, count(*) AS scc_size FROM lab
             |  GROUP BY scc)
             |SELECT node, lab.scc, CAST(sz.scc_size AS BIGINT)
             |    AS scc_size
             |FROM lab JOIN sz USING (scc) ORDER BY node""".stripMargin)),

    // ---- Entropy-regularized optimal transport (Sinkhorn) between the
    // en / non-en document-length distributions: the geometry-aware
    // drift metric between KS (q201, sup-norm), PSI (q297, binwise) and
    // exact W₁ (q332) — smoothed transport cost in 20 scaling rounds.
    // The Gibbs kernel is the only transcendental, quantized cell-wise
    // (q378 exp convention); u/v quantize 1e-9 per round (q240
    // discipline). Corpus work is ONE binned count; iteration is
    // driver-side on the bin-sized model; oracle unrolls all 20 rounds.
    Q("q429_sinkhorn_ot",
      (s, d) => graft.operators.Profiling.sinkhornDistance(
        t(s, d, "documents"), "n_chars", col("lang") === "en"),
      Some {
        val roundCtes = (1 to 20).map { r =>
          s"""u$r AS MATERIALIZED (SELECT kk.i AS i,
             |    round(max(a) / sum(k * v.v) * 1000000000.0)
             |      / 1000000000.0 AS u
             |  FROM kk JOIN v${r - 1} v ON v.j = kk.j GROUP BY kk.i),
             |v$r AS MATERIALIZED (SELECT kk.j AS j,
             |    round(max(b) / sum(k * u.u) * 1000000000.0)
             |      / 1000000000.0 AS v
             |  FROM kk JOIN u$r u ON u.i = kk.i GROUP BY kk.j)""".stripMargin
        }.mkString(",\n")
        s"""WITH h AS (SELECT n_chars // 25 AS bin, lang = 'en' AS g,
           |    count(*) AS c FROM documents GROUP BY 1, 2),
           |ta AS (SELECT CAST(sum(c) AS DOUBLE) AS na FROM h WHERE g),
           |tb AS (SELECT CAST(sum(c) AS DOUBLE) AS nb FROM h
           |  WHERE NOT g),
           |av AS (SELECT bin, CAST(c AS DOUBLE) / na AS a FROM h
           |  CROSS JOIN ta WHERE g),
           |bv AS (SELECT bin, CAST(c AS DOUBLE) / nb AS b FROM h
           |  CROSS JOIN tb WHERE NOT g),
           |kk AS MATERIALIZED (SELECT av.bin AS i, bv.bin AS j, a, b,
           |    round(exp(-abs(av.bin - bv.bin) / 5.0) * 1000000.0)
           |      / 1000000.0 AS k
           |  FROM av CROSS JOIN bv),
           |v0 AS (SELECT bin AS j, CAST(1.0 AS DOUBLE) AS v FROM bv),
           |$roundCtes
           |SELECT (SELECT CAST(count(*) AS BIGINT) FROM av) AS n_bins_a,
           |  (SELECT CAST(count(*) AS BIGINT) FROM bv) AS n_bins_b,
           |  round(sum(u.u * k * v.v * abs(kk.i - kk.j)) * 10000.0)
           |    / 10000.0 AS sinkhorn_cost
           |FROM kk JOIN u20 u ON u.i = kk.i
           |JOIN v20 v ON v.j = kk.j""".stripMargin
      }),

    // ---- Count-based word embeddings (Levy & Goldberg 2014): PPMI of
    // the ±2 skip-gram window over the top-30 terms, top-2 spectral
    // coordinates by quantized power iteration with deflation — the
    // SGNS-equivalent embedding with NO stochastic training. The
    // window is the q278 scan-speed offset construction (pair mass
    // ≤ 4·tokens, no self-join); PPMI cells quantize 1e-6 after the
    // single ln; iteration vectors quantize 1e-9 per round (q240), so
    // the full chain replays exactly whether or not the spectrum
    // converged. Oracle unrolls vocab, pairs, the PPMI matrix, all 8
    // rounds of BOTH components (deflation against the final first
    // component) and the Rayleigh quotients.
    Q("q430_ppmi_embeddings",
      (s, d) => graft.operators.TrainingPrep
        .ppmiSpectralEmbeddings(t(s, d, "documents")),
      Some(s"""WITH ${ppmiChainCtes("", "TRUE")}
              |SELECT vc.idx, vc.w AS term,
              |  round(x1_8.x * 1000000.0) / 1000000.0 AS e1,
              |  round(x2_8.x * 1000000.0) / 1000000.0 AS e2,
              |  l1.l AS lambda1, l2.l AS lambda2
              |FROM vc JOIN x1_8 ON x1_8.i = vc.idx
              |JOIN x2_8 ON x2_8.i = vc.idx
              |CROSS JOIN l1 CROSS JOIN l2
              |ORDER BY vc.idx""".stripMargin)),

    // ---- Funnel drop-off A/B significance: the q117 stage chain per
    // md5-hash arm, then a two-proportion pooled z-test (the q188
    // composition — one fixed IEEE chain, one sqrt, null z on
    // degenerate pooled rates) PER TRANSITION (view→click,
    // click→purchase) — "did the variant change where users fall out",
    // the reading a funnel dashboard actually needs. One funnel pass
    // feeds both arms; the single-row conditional-sum aggregate
    // explodes to the two transition rows.
    Q("q431_funnel_ab",
      (s, d) => {
        val fs = graft.operators.EventOps.funnelStages(Tables.events(s, d),
          Seq("view", "click", "purchase"),
          windowNs = 2L * 86400 * 1000000000L)
        val armed = fs.select(col("stage"),
          (pmod(graft.expressions.PortableHash.md5Hash60(
            concat(lit("fz#"), col("user_id").cast("string"))),
            lit(2L)) === 0L).as("aa"))
        def cnt(arm: Boolean, k: Int) =
          sum(when(col("aa") === arm && col("stage") >= k, 1L)
            .otherwise(0L))
        val agg = armed.agg(cnt(true, 1).as("a1"), cnt(true, 2).as("a2"),
          cnt(true, 3).as("a3"), cnt(false, 1).as("b1"),
          cnt(false, 2).as("b2"), cnt(false, 3).as("b3"))
        val rows = agg.select(explode(array(
          struct(lit("view_to_click").as("transition"),
            col("a1").as("na_prev"), col("a2").as("na_next"),
            col("b1").as("nb_prev"), col("b2").as("nb_next")),
          struct(lit("click_to_purchase").as("transition"),
            col("a2").as("na_prev"), col("a3").as("na_next"),
            col("b2").as("nb_prev"), col("b3").as("nb_next"))))
          .as("t")).select(col("t.*"))
        def dd(c: String) = col(c).cast("double")
        val pa = dd("na_next") / dd("na_prev")
        val pb = dd("nb_next") / dd("nb_prev")
        val pp = (dd("na_next") + dd("nb_next")) /
          (dd("na_prev") + dd("nb_prev"))
        val z = (pa - pb) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / dd("na_prev") + lit(1.0) / dd("nb_prev")))
        rows.select(col("transition"), col("na_prev"), col("na_next"),
            col("nb_prev"), col("nb_next"),
            (round(pa * 1000000.0) / 1000000.0).as("rate_a"),
            (round(pb * 1000000.0) / 1000000.0).as("rate_b"),
            when(pp > 0 && pp < 1,
              round(z * 10000.0) / 10000.0).as("z"),
            when(pp > 0 && pp < 1, abs(z) > 1.96).as("significant"))
          .orderBy("transition")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_type
             |  FROM events),
             |v AS (SELECT user_id, min(tns) AS t0 FROM e
             |  WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(tns) AS t1 FROM e JOIN v
             |    USING (user_id)
             |  WHERE event_type = 'click' AND tns >= t0
             |    AND tns <= t0 + 172800000000000 GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(tns) AS t2 FROM e JOIN c
             |    USING (user_id)
             |  WHERE event_type = 'purchase' AND tns >= t1
             |    AND tns <= t1 + 172800000000000 GROUP BY e.user_id),
             |st AS (SELECT v.user_id,
             |    1 + CASE WHEN c.t1 IS NULL THEN 0 ELSE 1 END
             |      + CASE WHEN p.t2 IS NULL THEN 0 ELSE 1 END AS stage,
             |    CAST(('0x' || substr(md5('fz#'
             |      || CAST(v.user_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |      % 2 = 0 AS aa
             |  FROM v LEFT JOIN c USING (user_id)
             |  LEFT JOIN p USING (user_id)),
             |ag AS (SELECT
             |    sum(CASE WHEN aa AND stage >= 1 THEN 1 ELSE 0 END) AS a1,
             |    sum(CASE WHEN aa AND stage >= 2 THEN 1 ELSE 0 END) AS a2,
             |    sum(CASE WHEN aa AND stage >= 3 THEN 1 ELSE 0 END) AS a3,
             |    sum(CASE WHEN NOT aa AND stage >= 1 THEN 1 ELSE 0 END)
             |      AS b1,
             |    sum(CASE WHEN NOT aa AND stage >= 2 THEN 1 ELSE 0 END)
             |      AS b2,
             |    sum(CASE WHEN NOT aa AND stage >= 3 THEN 1 ELSE 0 END)
             |      AS b3
             |  FROM st),
             |tr AS (SELECT 'view_to_click' AS transition,
             |    a1 AS na_prev, a2 AS na_next, b1 AS nb_prev,
             |    b2 AS nb_next FROM ag
             |  UNION ALL
             |  SELECT 'click_to_purchase', a2, a3, b2, b3 FROM ag)
             |SELECT transition, CAST(na_prev AS BIGINT) AS na_prev,
             |  CAST(na_next AS BIGINT) AS na_next,
             |  CAST(nb_prev AS BIGINT) AS nb_prev,
             |  CAST(nb_next AS BIGINT) AS nb_next,
             |  round(CAST(na_next AS DOUBLE) / CAST(na_prev AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS rate_a,
             |  round(CAST(nb_next AS DOUBLE) / CAST(nb_prev AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS rate_b,
             |  CASE WHEN (CAST(na_next AS DOUBLE) + CAST(nb_next
             |      AS DOUBLE)) / (CAST(na_prev AS DOUBLE)
             |      + CAST(nb_prev AS DOUBLE)) > 0
             |    AND (CAST(na_next AS DOUBLE) + CAST(nb_next AS DOUBLE))
             |      / (CAST(na_prev AS DOUBLE) + CAST(nb_prev AS DOUBLE))
             |      < 1
             |    THEN round((CAST(na_next AS DOUBLE) / CAST(na_prev
             |        AS DOUBLE) - CAST(nb_next AS DOUBLE)
             |        / CAST(nb_prev AS DOUBLE))
             |      / sqrt((CAST(na_next AS DOUBLE) + CAST(nb_next
             |          AS DOUBLE)) / (CAST(na_prev AS DOUBLE)
             |          + CAST(nb_prev AS DOUBLE))
             |        * (1.0 - (CAST(na_next AS DOUBLE) + CAST(nb_next
             |            AS DOUBLE)) / (CAST(na_prev AS DOUBLE)
             |            + CAST(nb_prev AS DOUBLE)))
             |        * (1.0 / CAST(na_prev AS DOUBLE)
             |          + 1.0 / CAST(nb_prev AS DOUBLE)))
             |      * 10000.0) / 10000.0 END AS z,
             |  CASE WHEN (CAST(na_next AS DOUBLE) + CAST(nb_next
             |      AS DOUBLE)) / (CAST(na_prev AS DOUBLE)
             |      + CAST(nb_prev AS DOUBLE)) > 0
             |    AND (CAST(na_next AS DOUBLE) + CAST(nb_next AS DOUBLE))
             |      / (CAST(na_prev AS DOUBLE) + CAST(nb_prev AS DOUBLE))
             |      < 1
             |    THEN abs((CAST(na_next AS DOUBLE) / CAST(na_prev
             |        AS DOUBLE) - CAST(nb_next AS DOUBLE)
             |        / CAST(nb_prev AS DOUBLE))
             |      / sqrt((CAST(na_next AS DOUBLE) + CAST(nb_next
             |          AS DOUBLE)) / (CAST(na_prev AS DOUBLE)
             |          + CAST(nb_prev AS DOUBLE))
             |        * (1.0 - (CAST(na_next AS DOUBLE) + CAST(nb_next
             |            AS DOUBLE)) / (CAST(na_prev AS DOUBLE)
             |            + CAST(nb_prev AS DOUBLE)))
             |        * (1.0 / CAST(na_prev AS DOUBLE)
             |          + 1.0 / CAST(nb_prev AS DOUBLE)))) > 1.96
             |  END AS significant
             |FROM tr ORDER BY transition""".stripMargin)),

    // ---- Maximum spanning backbone of the nation trade graph:
    // Borůvka rounds (per-component struct-min best edge under the
    // STRICT total order (w desc, a, b), component merge by the q71
    // pointer-jumping CC on the shrinking component graph). The total
    // order makes the maximum spanning forest UNIQUE, so the oracle
    // runs a DIFFERENT algorithm — Kruskal, iterating the same order
    // as a recursive CTE carrying the union-find labels as a list —
    // and must produce the identical edge set (the q127 two-algorithm
    // pattern).
    Q("q432_max_spanning_backbone",
      (s, d) => {
        val raw = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .where(col("c_nationkey") =!= col("s_nationkey"))
          .select(least(col("c_nationkey"), col("s_nationkey")).as("a"),
            greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
        val mst = graft.operators.GraphOps.maxSpanningForest(raw,
          rounds = 5)
        val nat = t(s, d, "nation")
        mst
          .join(broadcast(nat.select(col("n_nationkey").as("a"),
            col("n_name").as("nation_a"))), "a")
          .join(broadcast(nat.select(col("n_nationkey").as("b"),
            col("n_name").as("nation_b"))), "b")
          .select(col("a").cast("long").as("a"),
            col("b").cast("long").as("b"),
            col("nation_a"), col("nation_b"), col("w"))
          .orderBy(col("w").desc, col("a"), col("b"))
      },
      Some("""WITH RECURSIVE raw AS (
             |  SELECT least(c_nationkey, s_nationkey) AS a,
             |    greatest(c_nationkey, s_nationkey) AS b, count(*) AS w
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE c_nationkey <> s_nationkey
             |  GROUP BY 1, 2),
             |el AS MATERIALIZED (SELECT a, b, w, row_number()
             |    OVER (ORDER BY w DESC, a, b) AS rn FROM raw),
             |nd AS (SELECT DISTINCT a AS n FROM el
             |  UNION SELECT DISTINCT b FROM el),
             |init AS (SELECT list({'n': n, 'c': n} ORDER BY n) AS m
             |  FROM nd),
             |rec AS (
             |  SELECT 0 AS step, m, CAST(NULL AS INT) AS ea,
             |    CAST(NULL AS INT) AS eb, CAST(NULL AS BIGINT) AS ew,
             |    false AS added
             |  FROM init
             |  UNION ALL
             |  SELECT q.step + 1,
             |    CASE WHEN q.ca <> q.cb THEN list_transform(q.m, x ->
             |      {'n': x.n, 'c': CASE WHEN x.c = q.ca OR x.c = q.cb
             |        THEN least(q.ca, q.cb) ELSE x.c END})
             |      ELSE q.m END,
             |    q.a, q.b, q.w, q.ca <> q.cb
             |  FROM (
             |    SELECT r.step, r.m, e.a, e.b, e.w,
             |      [x.c for x in r.m if x.n = e.a][1] AS ca,
             |      [x.c for x in r.m if x.n = e.b][1] AS cb
             |    FROM rec r JOIN el e ON e.rn = r.step + 1) q
             |)
             |SELECT CAST(ea AS BIGINT) AS a, CAST(eb AS BIGINT) AS b,
             |  na.n_name AS nation_a, nb.n_name AS nation_b,
             |  CAST(ew AS BIGINT) AS w
             |FROM rec
             |JOIN nation na ON na.n_nationkey = ea
             |JOIN nation nb ON nb.n_nationkey = eb
             |WHERE added ORDER BY w DESC, a, b""".stripMargin)),

    // ---- IVF index balance audit: per-list sizes of the k-means
    // coarse quantizer plus the imbalance diagnostics an ANN index
    // build must watch (cv of list sizes, max/mean factor) — the q364
    // shard-skew reading applied to the q49/q129 IVF lists. Exact
    // integer sufficient stats (Σs, Σs²), one sqrt; oracle replays the
    // Lloyd chain + the same algebra.
    Q("q433_ivf_balance",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val sizes = graft.operators.Clustering
          .kMeansAssign(t(s, d, "embeddings"), k = 4, iters = 3)
          .groupBy("cluster").agg(count(lit(1)).as("size"))
          .localCheckpoint()
        val tot = sizes.agg(sum(col("size")).cast(dec).as("n"),
          count(lit(1)).cast(dec).as("k"),
          sum(col("size").cast(dec) * col("size").cast(dec)).as("s2"),
          max(col("size")).cast(dec).as("mx"))
        def db(c: String) = col(c).cast("double")
        val mean = db("n") / db("k")
        val varr = db("s2") / db("k") - mean * mean
        sizes.join(broadcast(tot))
          .select(col("cluster"), col("size"),
            (round(col("size").cast("double") / db("n") * 1000000.0)
              / 1000000.0).as("frac"),
            (round(sqrt(varr) / mean * 1000000.0) / 1000000.0).as("cv"),
            (round(db("mx") / mean * 10000.0) / 10000.0).as("imbalance"))
          .orderBy("cluster")
      },
      Some(s"""WITH ${kmeansCtes(4, 3, 64)},
              |sz AS (SELECT cid AS cluster, count(*) AS size FROM sfin
              |  GROUP BY cid),
              |tt AS (SELECT CAST(sum(size) AS DOUBLE) AS n,
              |    CAST(count(*) AS DOUBLE) AS k,
              |    CAST(sum(CAST(size AS HUGEINT) * CAST(size AS HUGEINT))
              |      AS DOUBLE) AS s2,
              |    CAST(max(size) AS DOUBLE) AS mx
              |  FROM sz)
              |SELECT cluster, CAST(size AS BIGINT) AS size,
              |  round(CAST(size AS DOUBLE) / n * 1000000.0) / 1000000.0
              |    AS frac,
              |  round(sqrt(s2 / k - (n / k) * (n / k)) / (n / k)
              |    * 1000000.0) / 1000000.0 AS cv,
              |  round(mx / (n / k) * 10000.0) / 10000.0 AS imbalance
              |FROM sz CROSS JOIN tt ORDER BY cluster""".stripMargin)),

    // ---- Recommender offline eval: leave-one-out hit-rate@3 of the
    // q415 item-item CF on HELD-OUT baskets (20% md5 order split),
    // against the popularity-top-3 baseline every recommender must
    // beat. Probes are ordered within-basket pairs (basket-bounded);
    // the trained top-3 table is model-sized and broadcasts into the
    // probe scan; all counts exact integers.
    Q("q434_cf_hitrate",
      (s, d) => {
        val bp0 = t(s, d, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
          .distinct()
          .select(col("ok"), col("p"),
            (pmod(graft.expressions.PortableHash.md5Hash60(
              concat(lit("cf#"), col("ok").cast("string"))),
              lit(5L)) === 0L).as("is_test"))
          .localCheckpoint()
        val train = bp0.where(!col("is_test"))
        val cnt = train.groupBy("p").agg(count(lit(1)).as("n"))
        val co = train.select(col("ok"), col("p").as("a"))
          .join(train.select(col("ok"), col("p").as("b")), "ok")
          .where(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("co"))
          .where(col("co") >= 2)
        val scored = co
          .join(cnt.select(col("p").as("a"), col("n").as("na")), "a")
          .join(cnt.select(col("p").as("b"), col("n").as("nb")), "b")
          .select(col("a"), col("b"),
            (round(col("co").cast("double")
              / sqrt(col("na").cast("double") * col("nb").cast("double"))
              * 1000000.0) / 1000000.0).as("cos"))
        val sym = scored.select(col("a").as("item"), col("b").as("other"),
            col("cos"))
          .unionAll(scored.select(col("b").as("item"),
            col("a").as("other"), col("cos")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("item").orderBy(col("cos").desc, col("other"))
        val top3 = sym.withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 3).select(col("item"), col("other"))
          .localCheckpoint()
        val pop = train.groupBy("p").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("p")).limit(3)
          .collect().map(_.getLong(0))
        val test = bp0.where(col("is_test"))
        val probes = test.select(col("ok"), col("p").as("i"))
          .join(test.select(col("ok"), col("p").as("j")), "ok")
          .where(col("i") =!= col("j"))
        val marked = probes
          .join(broadcast(top3.select(col("item").as("i"),
            col("other").as("j"), lit(1L).as("hit"))),
            Seq("i", "j"), "left")
          .select(coalesce(col("hit"), lit(0L)).as("hit"),
            when(col("j").isin(pop.map(Long.box): _*), 1L).otherwise(0L)
              .as("hit_pop"))
        marked.agg(count(lit(1)).cast("long").as("n_probes"),
            sum(col("hit")).cast("long").as("n_hits"),
            sum(col("hit_pop")).cast("long").as("n_hits_pop"))
          .select(col("n_probes"), col("n_hits"),
            (round(col("n_hits").cast("double")
              / col("n_probes").cast("double") * 1000000.0) / 1000000.0)
              .as("hit_rate"),
            col("n_hits_pop"),
            (round(col("n_hits_pop").cast("double")
              / col("n_probes").cast("double") * 1000000.0) / 1000000.0)
              .as("hit_rate_pop"))
      },
      Some("""WITH bp AS (SELECT DISTINCT l_orderkey AS ok,
             |    l_partkey AS p FROM lineitem),
             |sp AS (SELECT ok, p,
             |    CAST(('0x' || substr(md5('cf#' || CAST(ok AS VARCHAR)),
             |      1, 15)) AS BIGINT) % 5 = 0 AS is_test
             |  FROM bp),
             |tr AS (SELECT ok, p FROM sp WHERE NOT is_test),
             |cnt AS (SELECT p, count(*) AS n FROM tr GROUP BY p),
             |co AS (SELECT a.p AS a, b.p AS b, count(*) AS co
             |  FROM tr a JOIN tr b ON a.ok = b.ok AND a.p < b.p
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |sc AS (SELECT a, b,
             |    round(CAST(co AS DOUBLE)
             |      / sqrt(CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE))
             |      * 1000000.0) / 1000000.0 AS cos
             |  FROM co JOIN cnt ca ON ca.p = a JOIN cnt cb ON cb.p = b),
             |sym AS (SELECT a AS item, b AS other, cos FROM sc
             |  UNION ALL SELECT b, a, cos FROM sc),
             |t3 AS (SELECT item, other FROM (
             |    SELECT item, other, row_number() OVER (
             |      PARTITION BY item ORDER BY cos DESC, other) AS rnk
             |    FROM sym) WHERE rnk <= 3),
             |pop AS (SELECT p FROM cnt ORDER BY n DESC, p LIMIT 3),
             |ts AS (SELECT ok, p FROM sp WHERE is_test),
             |pr AS (SELECT a.p AS i, b.p AS j FROM ts a JOIN ts b
             |  ON a.ok = b.ok AND a.p <> b.p),
             |mk AS (SELECT
             |    CASE WHEN t3.item IS NOT NULL THEN 1 ELSE 0 END AS hit,
             |    CASE WHEN pr.j IN (SELECT p FROM pop) THEN 1 ELSE 0 END
             |      AS hit_pop
             |  FROM pr LEFT JOIN t3 ON t3.item = pr.i
             |    AND t3.other = pr.j)
             |SELECT CAST(count(*) AS BIGINT) AS n_probes,
             |  CAST(sum(hit) AS BIGINT) AS n_hits,
             |  round(CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS hit_rate,
             |  CAST(sum(hit_pop) AS BIGINT) AS n_hits_pop,
             |  round(CAST(sum(hit_pop) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) * 1000000.0) / 1000000.0
             |    AS hit_rate_pop
             |FROM mk""".stripMargin)),

    // ---- Leave-one-source-out data valuation: each source's
    // contribution to LM quality as the held-out cross-entropy DELTA
    // when that source is removed — with the LOO models derived
    // ALGEBRAICALLY from two count relations (global minus per-source),
    // never refit per source: the whole sweep costs one corpus
    // tokenize + one sparse join, so it scales to any number of
    // sources. Laplace smoothing over the FIXED train vocab
    // (documented simplification); per-term ln quantizes to 1e-8
    // decimal units (q378), so the per-source sums are exact integers.
    // Positive delta = the source was helping (removing it hurts).
    Q("q435_loo_source_value",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        def qln8(c: org.apache.spark.sql.Column) =
          round(log(c) * 100000000.0).cast(dec)
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"),
            (pmod(graft.expressions.PortableHash.md5Hash60(
              concat(lit("loo#"), col("doc_id").cast("string"))),
              lit(5L)) === 0L).as("is_test"))
        val tok = docs.select(col("source"), col("is_test"),
            explode(graft.operators.TextAnalysis.tokens(col("text")))
              .as("w"))
          .where(col("w") =!= "").localCheckpoint()
        val cw = tok.where(!col("is_test")).groupBy("w")
          .agg(count(lit(1)).as("c")).localCheckpoint()
        val cs = tok.where(!col("is_test")).groupBy("source", "w")
          .agg(count(lit(1)).as("csw"))
        val tot = cw.agg(sum(col("c")).cast("long").as("tt"),
          count(lit(1)).cast("long").as("v"))
        val ts = cs.groupBy("source").agg(sum(col("csw")).cast("long")
          .as("ts"))
        val sources = ts.select("source").orderBy("source").collect()
          .map(_.getString(0))
        val tf = tok.where(col("is_test")).groupBy("w")
          .agg(count(lit(1)).as("k")).localCheckpoint()
        val m = tf.agg(sum(col("k")).cast("long").as("m"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        // full-model entropy: one vocab-sized pass
        val hFull = tf.join(cw, Seq("w"), "left").join(broadcast(tot))
          .agg(sum(col("k").cast(dec) *
            qln8((dd(coalesce(col("c"), lit(0L))) + 1.0) /
              (dd(col("tt")) + dd(col("v"))))).as("sl"))
        // LOO grid: holdout vocab × sources, sparse per-source counts
        val grid = tf.select(col("w"), col("k"),
            explode(array(sources.map(lit(_)): _*)).as("source"))
          .join(cw, Seq("w"), "left")
          .join(cs, Seq("source", "w"), "left")
          .join(broadcast(ts), "source")
          .join(broadcast(tot))
        val hLoo = grid.groupBy("source").agg(
          sum(col("k").cast(dec) *
            qln8((dd(coalesce(col("c"), lit(0L))) -
              dd(coalesce(col("csw"), lit(0L))) + 1.0) /
              (dd(col("tt")) - dd(col("ts")) + dd(col("v")))))
            .as("sls"))
        hLoo.join(broadcast(hFull)).join(broadcast(m))
          .join(broadcast(ts), "source")
          .select(col("source"), col("ts").as("source_tokens"),
            (round(-dd(col("sl")) / 100000000.0 / dd(col("m"))
              * 10000.0) / 10000.0).as("h_full"),
            (round(-dd(col("sls")) / 100000000.0 / dd(col("m"))
              * 10000.0) / 10000.0).as("h_loo"),
            (round((-dd(col("sls")) / 100000000.0 / dd(col("m")) -
              -dd(col("sl")) / 100000000.0 / dd(col("m")))
              * 1000000.0) / 1000000.0).as("delta"))
          .orderBy("source")
      },
      Some("""WITH dc AS (SELECT doc_id, text, source,
             |    CAST(('0x' || substr(md5('loo#'
             |      || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 5
             |      = 0 AS is_test
             |  FROM documents),
             |tk AS (SELECT * FROM (SELECT source, is_test,
             |    unnest(string_split(text, ' ')) AS w FROM dc)
             |  WHERE w <> ''),
             |cw AS MATERIALIZED (SELECT w, count(*) AS c FROM tk
             |  WHERE NOT is_test GROUP BY w),
             |cs AS MATERIALIZED (SELECT source, w, count(*) AS csw
             |  FROM tk WHERE NOT is_test GROUP BY 1, 2),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt,
             |    CAST(count(*) AS BIGINT) AS v FROM cw),
             |tsx AS (SELECT source, CAST(sum(csw) AS BIGINT) AS ts
             |  FROM cs GROUP BY source),
             |tf AS MATERIALIZED (SELECT w, count(*) AS k FROM tk
             |  WHERE is_test GROUP BY w),
             |mm AS (SELECT CAST(sum(k) AS BIGINT) AS m FROM tf),
             |hf AS (SELECT sum(CAST(tf.k AS HUGEINT)
             |    * CAST(round(ln((CAST(coalesce(cw.c, 0) AS DOUBLE)
             |        + 1.0) / (CAST(tt AS DOUBLE) + CAST(v AS DOUBLE)))
             |      * 100000000.0) AS HUGEINT)) AS sl
             |  FROM tf LEFT JOIN cw USING (w) CROSS JOIN tot),
             |gr AS (SELECT s.source, tf.w, tf.k, cw.c, cs.csw,
             |    s.ts, tot.tt, tot.v
             |  FROM tf CROSS JOIN tsx s
             |  LEFT JOIN cw ON cw.w = tf.w
             |  LEFT JOIN cs ON cs.source = s.source AND cs.w = tf.w
             |  CROSS JOIN tot),
             |hl AS (SELECT source, sum(CAST(k AS HUGEINT)
             |    * CAST(round(ln((CAST(coalesce(c, 0) AS DOUBLE)
             |        - CAST(coalesce(csw, 0) AS DOUBLE) + 1.0)
             |      / (CAST(tt AS DOUBLE) - CAST(ts AS DOUBLE)
             |        + CAST(v AS DOUBLE))) * 100000000.0) AS HUGEINT))
             |      AS sls
             |  FROM gr GROUP BY source)
             |SELECT hl.source, tsx.ts AS source_tokens,
             |  round(-CAST(sl AS DOUBLE) / 100000000.0
             |    / CAST(m AS DOUBLE) * 10000.0) / 10000.0 AS h_full,
             |  round(-CAST(sls AS DOUBLE) / 100000000.0
             |    / CAST(m AS DOUBLE) * 10000.0) / 10000.0 AS h_loo,
             |  round((-CAST(sls AS DOUBLE) / 100000000.0
             |      / CAST(m AS DOUBLE)
             |    - -CAST(sl AS DOUBLE) / 100000000.0
             |      / CAST(m AS DOUBLE)) * 1000000.0) / 1000000.0
             |    AS delta
             |FROM hl JOIN tsx ON tsx.source = hl.source
             |CROSS JOIN hf CROSS JOIN mm
             |ORDER BY 1""".stripMargin)),

    // ---- Embedding-space alignment (orthogonal Procrustes, 2-D
    // closed form): fit the q430 PPMI spectral embeddings on the two
    // doc-parity halves of the corpus, then the rotation aligning the
    // shared-vocabulary coordinates — TRIG-FREE: cos θ = (m00+m11)/r,
    // sin θ = (m10−m01)/r with r = √(a²+b²) from the exact 2×2
    // cross-covariance of the 1e-6-rounded coordinates, so the whole
    // alignment is +,×,/,√ only. The drift reading every embedding
    // refresh needs ("did the space rotate, and how far apart are the
    // halves after aligning"). Oracle instantiates the suffixed PPMI
    // chain TWICE and replays the closed form.
    Q("q436_procrustes_alignment",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val docs = t(s, d, "documents")
        def emb(pred: org.apache.spark.sql.Column) =
          graft.operators.TrainingPrep
            .ppmiSpectralEmbeddings(docs.where(pred))
            .select("term", "e1", "e2").collect()
            .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
            .toSeq
        val ea = emb(col("doc_id") % 2 === 0)
        val bm = emb(col("doc_id") % 2 === 1)
          .map(t3 => t3._1 -> (t3._2, t3._3)).toMap
        val shared = ea.filter(t3 => bm.contains(t3._1)).sortBy(_._1)
        var (m00, m01, m10, m11) = (0.0, 0.0, 0.0, 0.0)
        shared.foreach { case (w, a1, a2) =>
          val (b1, b2) = bm(w)
          m00 += a1 * b1; m01 += a1 * b2
          m10 += a2 * b1; m11 += a2 * b2
        }
        // objective Σ bᵀ(Ra) = c·(m00+m11) + s·(m01−m10) under the
        // column convention Ra = (c·a1 − s·a2, s·a1 + c·a2)
        val aa = m00 + m11
        val bb = m01 - m10
        val r = math.sqrt(aa * aa + bb * bb)
        val c = aa / r
        val sn = bb / r
        var pre = 0.0; var post = 0.0
        shared.foreach { case (w, a1, a2) =>
          val (b1, b2) = bm(w)
          pre += (a1 - b1) * (a1 - b1) + (a2 - b2) * (a2 - b2)
          val ra1 = a1 * c - a2 * sn
          val ra2 = a1 * sn + a2 * c
          post += (ra1 - b1) * (ra1 - b1) + (ra2 - b2) * (ra2 - b2)
        }
        val n = shared.size
        def r6(x: Double) = math.round(x * 1e6) / 1e6.toDouble
        Seq((n.toLong, r6(c), r6(sn), r6(pre / n), r6(post / n)))
          .toDF("n_shared", "cos_t", "sin_t", "err_before", "err_after")
      },
      Some(s"""WITH ${ppmiChainCtes("pa", "doc_id % 2 = 0")},
              |${ppmiChainCtes("pb", "doc_id % 2 = 1")},
              |ea AS (SELECT vcpa.w AS term,
              |    round(x.x * 1000000.0) / 1000000.0 AS a1,
              |    round(y.x * 1000000.0) / 1000000.0 AS a2
              |  FROM vcpa JOIN x1_8pa x ON x.i = vcpa.idx
              |  JOIN x2_8pa y ON y.i = vcpa.idx),
              |eb AS (SELECT vcpb.w AS term,
              |    round(x.x * 1000000.0) / 1000000.0 AS b1,
              |    round(y.x * 1000000.0) / 1000000.0 AS b2
              |  FROM vcpb JOIN x1_8pb x ON x.i = vcpb.idx
              |  JOIN x2_8pb y ON y.i = vcpb.idx),
              |sh AS (SELECT ea.term, a1, a2, b1, b2 FROM ea
              |  JOIN eb USING (term)),
              |cm AS (SELECT sum(a1 * b1) AS m00, sum(a1 * b2) AS m01,
              |    sum(a2 * b1) AS m10, sum(a2 * b2) AS m11,
              |    CAST(count(*) AS BIGINT) AS n FROM sh),
              |rt AS (SELECT n,
              |    (m00 + m11) / sqrt((m00 + m11) * (m00 + m11)
              |      + (m01 - m10) * (m01 - m10)) AS c,
              |    (m01 - m10) / sqrt((m00 + m11) * (m00 + m11)
              |      + (m01 - m10) * (m01 - m10)) AS s
              |  FROM cm),
              |er AS (SELECT
              |    sum((a1 - b1) * (a1 - b1) + (a2 - b2) * (a2 - b2))
              |      AS pre,
              |    sum((a1 * c - a2 * s - b1) * (a1 * c - a2 * s - b1)
              |      + (a1 * s + a2 * c - b2) * (a1 * s + a2 * c - b2))
              |      AS post
              |  FROM sh CROSS JOIN rt)
              |SELECT rt.n AS n_shared,
              |  round(c * 1000000.0) / 1000000.0 AS cos_t,
              |  round(s * 1000000.0) / 1000000.0 AS sin_t,
              |  round(pre / n * 1000000.0) / 1000000.0 AS err_before,
              |  round(post / n * 1000000.0) / 1000000.0 AS err_after
              |FROM rt CROSS JOIN er""".stripMargin)),

    // ---- STREAMING cardinality: per-day distinct users estimated by
    // the q413 portable HLL as a Structured Streaming aggregation —
    // the state the stream carries is (day, bucket)→max(rho), 256 rows
    // per day REGARDLESS of user volume (an exact streaming distinct
    // holds every id); COMPLETE-mode AvailableNow drive (q303
    // contract), exact integer fold batch-side over the sunk
    // registers; exact per-day distinct joined as the audit column.
    Q("q437_hll_streaming",
      (s, d) => {
        val est = graft.streaming.EventsStream.streamingDailyDistinct(s, d)
        val exact = Tables.events(s, d)
          .select(expr("ts div 86400000000000").as("day"), col("user_id"))
          .groupBy("day")
          .agg(countDistinct(col("user_id")).as("exact_distinct"))
        est.join(exact, "day")
          .select(col("day"), col("est"), col("exact_distinct"),
            (round(abs(col("est") - col("exact_distinct").cast("double"))
              / col("exact_distinct").cast("double") * 1000000.0)
              / 1000000.0).as("rel_err"))
          .orderBy("day")
      },
      Some("""WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |    user_id,
             |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
             |      AS BIGINT) AS h
             |  FROM events),
             |reg AS (SELECT day, h & 255 AS bucket,
             |    max(CASE WHEN (h >> 8) = 0 THEN 53
             |        ELSE 53 - length(bin(h >> 8)) END) AS m
             |  FROM ev GROUP BY 1, 2),
             |fold AS (SELECT day,
             |    CAST(sum(1::BIGINT << (53 - m)) AS HUGEINT)
             |      + (256 - CAST(count(*) AS HUGEINT))
             |        * CAST(9007199254740992 AS HUGEINT) AS z,
             |    256 - count(*) AS v
             |  FROM reg GROUP BY day),
             |est AS (SELECT day,
             |    round(CASE WHEN v > 0
             |        AND 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
             |          * 9007199254740992.0 / CAST(z AS DOUBLE) <= 640.0
             |      THEN round(ln(256.0 / CAST(v AS DOUBLE))
             |          * 100000000.0) / 100000000.0 * 256.0
             |      ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
             |        * 9007199254740992.0 / CAST(z AS DOUBLE) END
             |      * 10000.0) / 10000.0 AS est
             |  FROM fold),
             |ex AS (SELECT day, count(DISTINCT user_id)
             |    AS exact_distinct FROM ev GROUP BY day)
             |SELECT est.day, est, exact_distinct,
             |  round(abs(est - CAST(exact_distinct AS DOUBLE))
             |    / CAST(exact_distinct AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS rel_err
             |FROM est JOIN ex ON est.day = ex.day
             |ORDER BY 1""".stripMargin)),

    // ---- Group-fairness audit of the q158 quality classifier across
    // SOURCES: per-source keep rate vs the corpus rate (demographic-
    // parity gap) and per-source TPR/FPR against the distillation
    // label (the equalized-odds reading) — the curation-bias check a
    // production filter needs ("does the gate silently drop one
    // source's good docs"). One scoring scan + one model-sized
    // grouped aggregate; exact integer cells, null rates on empty
    // denominators (q183 convention).
    Q("q438_fairness_audit",
      (s, d) => {
        val docs = t(s, d, "documents")
        val sc = graft.operators.QualityClassifier
          .score(docs, logregModel(docs))
          .select(col("doc_id"), col("keep"))
        val lab = docs.select(col("doc_id"), col("source"),
          (graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.9)
            .as("y"))
        val j = sc.join(lab, "doc_id").localCheckpoint()
        val per = j.groupBy("source").agg(
          count(lit(1)).cast("long").as("n"),
          sum(when(col("keep"), 1L).otherwise(0L)).cast("long")
            .as("n_keep"),
          sum(when(col("keep") && col("y"), 1L).otherwise(0L))
            .cast("long").as("tp"),
          sum(when(col("keep") && !col("y"), 1L).otherwise(0L))
            .cast("long").as("fp"),
          sum(when(col("y"), 1L).otherwise(0L)).cast("long").as("pos"))
        val ov = j.agg((sum(when(col("keep"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("keep_all"))
        def dd(c: String) = col(c).cast("double")
        per.join(broadcast(ov))
          .select(col("source"), col("n"),
            (round(dd("n_keep") / dd("n") * 1000000.0) / 1000000.0)
              .as("keep_rate"),
            (round((dd("n_keep") / dd("n") - col("keep_all"))
              * 1000000.0) / 1000000.0).as("parity_gap"),
            when(col("pos") > 0,
              round(dd("tp") / dd("pos") * 1000000.0) / 1000000.0)
              .as("tpr"),
            when(col("n") - col("pos") > 0,
              round(dd("fp") / (dd("n") - dd("pos")) * 1000000.0)
                / 1000000.0).as("fpr"))
          .orderBy("source")
      },
      Some(s"""WITH ${logregCtes(3)},
              |scp AS (SELECT doc_id,
              |    round(1.0/(1.0 + exp(-(w1*(x1/1000000.0)
              |      + w2*(x2/1000000.0) + w3*(x3/1000000.0)
              |      + w4*(x4/1000000.0) + w5*(x5/1000000.0))))
              |      * 1000000.0)/1000000.0 >= 0.5 AS keep
              |  FROM fx CROSS JOIN wfin),
              |j AS (SELECT d.source, scp.keep, fx.y = 1 AS y
              |  FROM scp JOIN fx USING (doc_id)
              |  JOIN documents d USING (doc_id)),
              |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n_keep,
              |    CAST(sum(CASE WHEN keep AND y THEN 1 ELSE 0 END)
              |      AS BIGINT) AS tp,
              |    CAST(sum(CASE WHEN keep AND NOT y THEN 1 ELSE 0 END)
              |      AS BIGINT) AS fp,
              |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
              |      AS pos
              |  FROM j GROUP BY source),
              |ov AS (SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END)
              |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS keep_all
              |  FROM j)
              |SELECT source, n,
              |  round(CAST(n_keep AS DOUBLE) / CAST(n AS DOUBLE)
              |    * 1000000.0) / 1000000.0 AS keep_rate,
              |  round((CAST(n_keep AS DOUBLE) / CAST(n AS DOUBLE)
              |    - keep_all) * 1000000.0) / 1000000.0 AS parity_gap,
              |  CASE WHEN pos > 0 THEN round(CAST(tp AS DOUBLE)
              |    / CAST(pos AS DOUBLE) * 1000000.0) / 1000000.0 END
              |    AS tpr,
              |  CASE WHEN n - pos > 0 THEN round(CAST(fp AS DOUBLE)
              |    / (CAST(n AS DOUBLE) - CAST(pos AS DOUBLE))
              |    * 1000000.0) / 1000000.0 END AS fpr
              |FROM per CROSS JOIN ov ORDER BY source""".stripMargin)),

    // ---- Differentially-private count release (Laplace mechanism,
    // ε = 0.1): per-nation customer counts plus inverse-CDF Laplace
    // noise drawn from the portable md5 uniform — the q266
    // deterministic-draw convention (a reproducible stand-in for the
    // sampler; the MECHANISM arithmetic is the operator under test).
    // The single ln is 1e-8-quantized; released value and calibration
    // error are the audit columns every DP release publishes
    // internally.
    Q("q439_dp_counts",
      (s, d) => {
        val b = 10.0
        val per = t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(count(lit(1)).cast("long").as("n_true"))
        val u = graft.expressions.PortableHash.md5Hash60(
          concat(lit("dp#"), col("nation"))).cast("double") /
          1152921504606846976.0
        def qln8(c: org.apache.spark.sql.Column) =
          round(log(c) * 100000000.0) / 100000000.0
        val noise = when(u < 0.5, lit(b) * qln8(lit(2.0) * u))
          .otherwise(lit(-b) * qln8(lit(2.0) * (lit(1.0) - u)))
        per.select(col("nation"), col("n_true"),
            (round(noise * 10000.0) / 10000.0).as("noise"))
          .select(col("nation"), col("n_true"), col("noise"),
            (round((col("n_true") + col("noise")) * 10000.0) / 10000.0)
              .as("n_released"))
          .orderBy("nation")
      },
      Some("""WITH per AS (SELECT n_name AS nation,
             |    CAST(count(*) AS BIGINT) AS n_true
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY 1),
             |nz AS (SELECT nation, n_true,
             |    CAST(CAST('0x' || substr(md5('dp#' || nation), 1, 15)
             |      AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
             |  FROM per),
             |dr AS (SELECT nation, n_true,
             |    round((CASE WHEN u < 0.5
             |      THEN 10.0 * (round(ln(2.0 * u) * 100000000.0)
             |        / 100000000.0)
             |      ELSE -10.0 * (round(ln(2.0 * (1.0 - u))
             |        * 100000000.0) / 100000000.0) END) * 10000.0)
             |      / 10000.0 AS noise
             |  FROM nz)
             |SELECT nation, n_true, noise,
             |  round((n_true + noise) * 10000.0) / 10000.0 AS n_released
             |FROM dr ORDER BY nation""".stripMargin)),

    // ---- Multimodal dedup capstone: image near-dup clusters by
    // CONSENSUS of the two perceptual hashes — a pair must sit within
    // hamming ≤ 2 under BOTH the spatial aHash (q147) and the
    // frequency-domain pHash (q418), the standard precision move
    // (either hash alone admits its own false-positive family); the
    // agreeing pairs close under the q71 pointer-jumping components
    // and each cluster keeps its min id. Both hash paths are real
    // decode; candidates stay Manku-bounded (q148) — never all-pairs.
    // The oracle rebuilds BOTH hashes from the pixel formula (aHash
    // blocks; pHash via the shared literal DCT basis), intersects the
    // pair sets, and closes them with a recursive CTE.
    Q("q440_image_dedup_consensus",
      (s, d) => {
        import graft.operators.{Dedup, Multimodal}
        val sub = t(s, d, "documents").where(col("doc_id") % 5 === 0)
        val assets = Multimodal.pngAssets(s, sub)
        def sigOf(df: org.apache.spark.sql.DataFrame, c: String) =
          df.select(col("doc_id"),
            (0 until 64).map(b =>
              when(substring(col(c), b + 1, 1) === "1", lit(1L << b))
                .otherwise(lit(0L)))
              .reduce(_.bitwiseOR(_)).as("sig"))
        val pa = Dedup.hammingPairs(
          sigOf(Multimodal.imageAHash(s, assets), "ahash"),
          maxDist = 2, sigCol = "sig").select("id_a", "id_b")
        val pb = Dedup.hammingPairs(
          sigOf(Multimodal.imagePHash(s, assets), "phash"),
          maxDist = 2, sigCol = "sig").select("id_a", "id_b")
        val consensus = pa.intersect(pb)
        val cc = Dedup.duplicateClusters(consensus)
        cc.groupBy("cluster").agg(count(lit(1)).cast("long")
            .as("n_members"))
          .select(col("cluster").as("keeper"), col("n_members"))
          .orderBy("keeper")
      },
      Some {
        val tb = graft.operators.Multimodal.dctTableQ6(16)
        val vals = (for { u <- 0 until 8; x <- 0 until 16 }
          yield s"($u, $x, ${tb(u)(x)})").mkString(", ")
        s"""WITH RECURSIVE t(u, x, c) AS (VALUES $vals),
           |px AS MATERIALIZED (SELECT doc_id, x, y,
           |    ((x + 1) * (doc_id % 7 + 3) * 7
           |      + (y + 1) * (doc_id % 7 + 5) * 11) % 256
           |      + CASE WHEN doc_id % 4 = 0 AND x = 0 AND y = 0
           |        THEN 8 ELSE 0 END AS v
           |  FROM documents, range(16) rx(x), range(16) ry(y)
           |  WHERE doc_id % 5 = 0),
           |bl AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS b,
           |    sum(v) AS bs FROM px GROUP BY 1, 2),
           |tot AS (SELECT doc_id, sum(v) AS ts FROM px GROUP BY 1),
           |abits AS (SELECT doc_id, b,
           |    CASE WHEN bs * 64 > ts THEN '1' ELSE '0' END AS bit
           |  FROM bl JOIN tot USING (doc_id)),
           |ah AS MATERIALIZED (SELECT doc_id,
           |    string_agg(bit, '' ORDER BY b) AS h
           |  FROM abits GROUP BY doc_id),
           |co AS (SELECT px.doc_id, tu.u AS u, tv.u AS v,
           |    sum(CAST(px.v AS HUGEINT) * tu.c * tv.c) AS k
           |  FROM px JOIN t tu ON tu.x = px.x JOIN t tv ON tv.x = px.y
           |  GROUP BY 1, 2, 3),
           |med AS (SELECT doc_id, k AS mk FROM (
           |    SELECT doc_id, k, row_number() OVER (PARTITION BY doc_id
           |      ORDER BY k, u, v) AS rn
           |    FROM co WHERE NOT (u = 0 AND v = 0)) WHERE rn = 32),
           |pbits AS (SELECT co.doc_id, co.u, co.v,
           |    CASE WHEN co.k > med.mk THEN '1' ELSE '0' END AS bit
           |  FROM co JOIN med USING (doc_id)),
           |ph AS MATERIALIZED (SELECT doc_id,
           |    string_agg(bit, '' ORDER BY u, v) AS h
           |  FROM pbits GROUP BY doc_id),
           |pa AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM ah a JOIN ah b ON a.doc_id < b.doc_id
           |  WHERE len([i for i in range(1, 65)
           |    IF a.h[i] <> b.h[i]]) <= 2),
           |pb AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
           |  WHERE len([i for i in range(1, 65)
           |    IF a.h[i] <> b.h[i]]) <= 2),
           |cons AS (SELECT pa.id_a, pa.id_b FROM pa JOIN pb
           |  ON pa.id_a = pb.id_a AND pa.id_b = pb.id_b),
           |edges AS (SELECT id_a AS u, id_b AS v FROM cons
           |  UNION SELECT id_b, id_a FROM cons),
           |reach AS (SELECT u AS src, u AS dst FROM edges
           |  UNION
           |  SELECT r.src, e2.v FROM reach r JOIN edges e2
           |    ON r.dst = e2.u),
           |lab AS (SELECT src AS id, min(dst) AS cluster FROM reach
           |  GROUP BY src)
           |SELECT cluster AS keeper, CAST(count(*) AS BIGINT)
           |    AS n_members
           |FROM lab GROUP BY cluster ORDER BY keeper""".stripMargin
      }),

    // ---- Event-time lateness audit — the numbers that SIZE a
    // watermark before anyone picks one: per user, arrival order is
    // the event_id sequence; lateness of an event = how far the
    // running event-time high-water mark is ahead of it. Reports the
    // out-of-order fraction and the max / nearest-rank-P99 lateness in
    // seconds (exact integer ns throughout; the P99 is rank SELECTION,
    // q180's contract — a corpus value, not an interpolation). One
    // user-partitioned running-max window + one global aggregate + one
    // rank cut.
    Q("q441_lateness_audit",
      (s, d) => {
        val byArrival = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"))
          .withColumn("hwm", max(col("ts")).over(byArrival))
          .select(greatest(coalesce(col("hwm") - col("ts"), lit(0L)),
            lit(0L)).as("late_ns"))
          .localCheckpoint()
        val p99 = ev.where(col("late_ns") > 0)
        val stats = ev.agg(count(lit(1)).cast("long").as("n_events"),
          sum(when(col("late_ns") > 0, 1L).otherwise(0L)).cast("long")
            .as("n_late"),
          max(col("late_ns")).as("max_ns"))
        val rankW = org.apache.spark.sql.expressions.Window
          .orderBy(col("late_ns"))
        val lateRanked = p99
          .withColumn("rn", row_number().over(rankW))
          .join(broadcast(p99.agg(count(lit(1)).cast("long").as("nl"))))
          .where(col("rn") === ceil(col("nl").cast("double") * 0.99)
            .cast("long"))
          .select(col("late_ns").as("p99_ns"))
        // LEFT join on a constant key: an in-order corpus has an EMPTY
        // lateness subset and the audit row must still emit (with null
        // P99) — "no watermark needed" is the valuable answer
        stats.withColumn("k", lit(1))
          .join(broadcast(lateRanked.withColumn("k", lit(1))),
            Seq("k"), "left").drop("k")
          .select(col("n_events"), col("n_late"),
            (round(col("n_late").cast("double")
              / col("n_events").cast("double") * 1000000.0) / 1000000.0)
              .as("late_rate"),
            (col("max_ns") / lit(1000000000L)).cast("long")
              .as("max_lateness_s"),
            (col("p99_ns") / lit(1000000000L)).cast("long")
              .as("p99_lateness_s"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_ns(ts) AS tns
             |  FROM events),
             |hw AS (SELECT user_id, event_id, tns,
             |    max(tns) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS hwm
             |  FROM ev),
             |lt AS (SELECT greatest(coalesce(hwm - tns, 0), 0)
             |    AS late_ns FROM hw),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CASE WHEN late_ns > 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_late,
             |    max(late_ns) AS max_ns
             |  FROM lt),
             |lr AS (SELECT late_ns, row_number() OVER (ORDER BY late_ns)
             |    AS rn FROM lt WHERE late_ns > 0),
             |nl AS (SELECT CAST(count(*) AS BIGINT) AS nl FROM lr),
             |p9 AS (SELECT late_ns AS p99_ns FROM lr CROSS JOIN nl
             |  WHERE rn = CAST(ceil(CAST(nl AS DOUBLE) * 0.99)
             |    AS BIGINT))
             |SELECT n_events, n_late,
             |  round(CAST(n_late AS DOUBLE) / CAST(n_events AS DOUBLE)
             |    * 1000000.0) / 1000000.0 AS late_rate,
             |  CAST(max_ns // 1000000000 AS BIGINT) AS max_lateness_s,
             |  CAST(p99_ns // 1000000000 AS BIGINT) AS p99_lateness_s
             |FROM st LEFT JOIN p9 ON true""".stripMargin)),

    // ---- k-anonymity audit over the (nation, market-segment)
    // quasi-identifier: group sizes, the k the table actually attains
    // (min group size), and how many groups / customers sit below
    // k = 5 — the re-identification exposure reading that pairs with
    // the q439 DP release. Exact integer cells at quasi-identifier-
    // combination size.
    Q("q442_k_anonymity",
      (s, d) => {
        val g = t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).cast("long").as("n"))
          .localCheckpoint()
        val sum0 = g.agg(count(lit(1)).cast("long").as("n_groups"),
          min(col("n")).as("k_attained"),
          sum(when(col("n") < 5, 1L).otherwise(0L)).cast("long")
            .as("groups_below_5"),
          sum(when(col("n") < 5, col("n")).otherwise(0L)).cast("long")
            .as("customers_below_5"))
        sum0.select(col("n_groups"), col("k_attained"),
          col("groups_below_5"), col("customers_below_5"))
      },
      Some("""WITH g AS (SELECT n_name AS nation, c_mktsegment
             |    AS segment, CAST(count(*) AS BIGINT) AS n
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY 1, 2)
             |SELECT CAST(count(*) AS BIGINT) AS n_groups,
             |  min(n) AS k_attained,
             |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS groups_below_5,
             |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             |    AS customers_below_5
             |FROM g""".stripMargin)),

    // ---- V-optimal histogram (Jagadish et al. 1998): the 4-bucket
    // partition of the dense daily count series minimizing total
    // within-bucket SSE, by exact dynamic programming over prefix sums
    // — the histogram construction a query optimizer's statistics
    // module actually runs (equi-width/equi-depth are the cheap
    // approximations of THIS). SSE terms compose from exact integer
    // prefix sums with one division each; the DP argmin ties break on
    // the smallest split point. Corpus work is one day-keyed count;
    // the DP runs driver-side on the calendar-bounded series; the
    // oracle unrolls the DP as one CTE layer per bucket count and
    // backtracks through the argmin columns.
    Q("q443_voptimal_histogram",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val series = graft.operators.EventOps
          .dailyCountsDense(Tables.events(s, d))
          .orderBy("day").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val n = series.length
        val sPre = new Array[Long](n + 1)
        val qPre = new Array[Long](n + 1)
        for (i <- 1 to n) {
          sPre(i) = sPre(i - 1) + series(i - 1)._2
          qPre(i) = qPre(i - 1) + series(i - 1)._2 * series(i - 1)._2
        }
        def sse(a: Int, b: Int): Double = {
          val sd = (sPre(b) - sPre(a - 1)).toDouble
          (qPre(b) - qPre(a - 1)).toDouble - sd * sd / (b - a + 1)
        }
        val kB = 4
        // e(k)(i) = min SSE of days 1..i in k buckets; bk = argmin j
        val e = Array.ofDim[Double](kB + 1, n + 1)
        val bk = Array.ofDim[Int](kB + 1, n + 1)
        for (i <- 1 to n) e(1)(i) = sse(1, i)
        for (k <- 2 to kB; i <- k to n) {
          var best = Double.MaxValue; var bj = -1
          for (j <- k - 1 to i - 1) {
            val v = e(k - 1)(j) + sse(j + 1, i)
            if (v < best) { best = v; bj = j }
          }
          e(k)(i) = best; bk(k)(i) = bj
        }
        val j3 = bk(4)(n); val j2 = bk(3)(j3); val j1 = bk(2)(j2)
        val cuts = Seq((1, j1), (j1 + 1, j2), (j2 + 1, j3), (j3 + 1, n))
        def q4(x: Double) = math.round(x * 1e4) / 1e4.toDouble
        cuts.zipWithIndex.map { case ((a, b), i) =>
          (i + 1, series(a - 1)._1, series(b - 1)._1, (b - a + 1).toLong,
            q4(sse(a, b)))
        }.toDF("bucket", "start_day", "end_day", "n_days", "sse")
          .select(col("bucket").cast("int").as("bucket"),
            col("start_day"), col("end_day"), col("n_days"), col("sse"))
          .orderBy("bucket")
      },
      Some {
        def layer(k: Int) =
          s"""e$k AS MATERIALIZED (SELECT i, v, b FROM (
             |    SELECT cur.i, prev.v + ss.v AS v, prev.i AS b,
             |      row_number() OVER (PARTITION BY cur.i
             |        ORDER BY prev.v + ss.v, prev.i) AS rn
             |    FROM ix cur
             |    JOIN e${k - 1} prev ON prev.i BETWEEN ${k - 1}
             |      AND cur.i - 1
             |    JOIN ss ON ss.a = prev.i + 1 AND ss.b = cur.i
             |    WHERE cur.i >= $k) WHERE rn = 1)""".stripMargin
        s"""WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
           |    count(*) AS c FROM events GROUP BY 1),
           |bd AS (SELECT min(day) AS mn, max(day) AS mx FROM c),
           |dn AS (SELECT row_number() OVER (ORDER BY gs.day) AS i,
           |    gs.day, coalesce(c.c, 0) AS c
           |  FROM (SELECT unnest(generate_series(mn, mx)) AS day
           |        FROM bd) gs
           |  LEFT JOIN c USING (day)),
           |ix AS (SELECT i FROM dn),
           |pf AS (SELECT i, day,
           |    sum(c) OVER (ORDER BY i) AS s,
           |    sum(c * c) OVER (ORDER BY i) AS q
           |  FROM dn),
           |p0 AS (SELECT 0 AS i, CAST(0 AS HUGEINT) AS s,
           |    CAST(0 AS HUGEINT) AS q
           |  UNION ALL SELECT i, CAST(s AS HUGEINT), CAST(q AS HUGEINT)
           |  FROM pf),
           |ss AS MATERIALIZED (SELECT lo.i + 1 AS a, hi.i AS b,
           |    CAST(hi.q - lo.q AS DOUBLE)
           |      - CAST(hi.s - lo.s AS DOUBLE)
           |        * CAST(hi.s - lo.s AS DOUBLE)
           |        / CAST(hi.i - lo.i AS DOUBLE) AS v
           |  FROM p0 lo JOIN p0 hi ON hi.i > lo.i),
           |e1 AS (SELECT b AS i, v, 0 AS b FROM (
           |    SELECT ss.b, ss.v FROM ss WHERE ss.a = 1)),
           |${layer(2)},
           |${layer(3)},
           |${layer(4)},
           |n0 AS (SELECT max(i) AS n FROM ix),
           |p4 AS (SELECT e4.b AS j3 FROM e4 JOIN n0 ON e4.i = n0.n),
           |p3 AS (SELECT e3.b AS j2 FROM e3 JOIN p4 ON e3.i = p4.j3),
           |p2 AS (SELECT e2.b AS j1 FROM e2 JOIN p3 ON e2.i = p3.j2),
           |cuts AS (
           |  SELECT 1 AS bucket, 1 AS a, j1 AS b FROM p2
           |  UNION ALL SELECT 2, j1 + 1, j2 FROM p2 CROSS JOIN p3
           |  UNION ALL SELECT 3, j2 + 1, j3 FROM p3 CROSS JOIN p4
           |  UNION ALL SELECT 4, j3 + 1, n FROM p4 CROSS JOIN n0)
           |SELECT CAST(cuts.bucket AS INT) AS bucket,
           |  da.day AS start_day, db.day AS end_day,
           |  CAST(cuts.b - cuts.a + 1 AS BIGINT) AS n_days,
           |  round(ss.v * 10000.0) / 10000.0 AS sse
           |FROM cuts JOIN ss ON ss.a = cuts.a AND ss.b = cuts.b
           |JOIN dn da ON da.i = cuts.a
           |JOIN dn db ON db.i = cuts.b
           |ORDER BY bucket""".stripMargin
      }),

    // ---- Sorted-neighborhood entity resolution (Hernández-Stolfo
    // 1995): sort the name dictionary, pair each name with its next 4
    // sort neighbors, verify levenshtein ≤ 3 — the blocking strategy
    // ORTHOGONAL to q118's first-token blocks (prefix typos break
    // token blocking but not sort adjacency, and vice versa; the
    // found_by_token_block column shows exactly which pairs each
    // strategy contributes). Candidate mass is strictly W·n. The sort
    // window runs on the q177/q180 spillable-sort contract; the
    // production 100 TB form range-partitions the sort key with a
    // W-row boundary overlap (same results, noted here).
    Q("q444_sorted_neighborhood_er",
      (s, d) => {
        val names = t(s, d, "part").groupBy("p_name")
          .agg(min("p_partkey").as("id"))
          .select(col("id"), col("p_name").as("name"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("name")
        val nbrCols = (1 to 4).map(k =>
          struct(lead(col("id"), k).over(w).as("id"),
            lead(col("name"), k).over(w).as("name")).as(s"n$k"))
        val withNext = names.select(
          Seq(col("id"), col("name")) ++ nbrCols: _*)
        val cand = withNext.select(col("id"), col("name"),
            explode(array((1 to 4).map(k => col(s"n$k")): _*)).as("nb"))
          .where(col("nb.id").isNotNull)
        cand.where(levenshtein(col("name"), col("nb.name")) <= 3)
          .select(least(col("id"), col("nb.id")).as("id_a"),
            greatest(col("id"), col("nb.id")).as("id_b"),
            levenshtein(col("name"), col("nb.name")).cast("long")
              .as("dist"),
            (element_at(split(col("name"), " "), 1) ===
              element_at(split(col("nb.name"), " "), 1))
              .as("found_by_token_block"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH names AS (SELECT min(p_partkey) AS id, p_name AS name
             |  FROM part GROUP BY p_name),
             |sn AS (SELECT id, name, row_number() OVER (ORDER BY name)
             |    AS rn FROM names),
             |cand AS (SELECT a.id AS ia, a.name AS na, b.id AS ib,
             |    b.name AS nb
             |  FROM sn a JOIN sn b ON b.rn BETWEEN a.rn + 1
             |    AND a.rn + 4)
             |SELECT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b,
             |  CAST(levenshtein(na, nb) AS BIGINT) AS dist,
             |  string_split(na, ' ')[1] = string_split(nb, ' ')[1]
             |    AS found_by_token_block
             |FROM cand WHERE levenshtein(na, nb) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- Incremental PCA maintenance: the covariance REBUILT from
    // MERGED moment tables of two disjoint corpus slices (history +
    // new ingest batch) — the moment lanes are exact decimal integer
    // sums, so merge(moments(A), moments(B)) == moments(A∪B)
    // bit-for-bit and the merged-path covariance must hash-match the
    // full recompute. The oracle IS q160's full-corpus covariance
    // chain, which is exactly the point: absorbing a batch without
    // rescanning history changes nothing. (The q72/q145
    // mergeable-state contract applied to the model pipeline.)
    Q("q445_pca_incremental",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val merged = graft.operators.Pca.mergeMoments(
          graft.operators.Pca.moments(
            emb.where(col("vec_id") % 4 =!= 0), 64),
          graft.operators.Pca.moments(
            emb.where(col("vec_id") % 4 === 0), 64))
        graft.operators.Pca.covarianceFromMoments(merged)
          .select(col("i").cast("long").as("i"),
            col("j").cast("long").as("j"),
            (round(col("cov") * 100000000.0) / 100000000.0).as("cov"))
          .orderBy("i", "j")
      },
      Some(s"""WITH ${pcaCtes(64, 0, 0)}
              |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
              |  round(c*100000000.0)/100000000.0 AS cov
              |FROM cov ORDER BY i, j""".stripMargin)),

    // ---- Dataset cartography (Swayamdipta et al. 2020): per-doc mean
    // CONFIDENCE and VARIABILITY across the classifier's training
    // checkpoints — easy-to-learn (high mean, low std), hard-to-learn
    // (low mean, low std) and ambiguous (high std) bands, the map that
    // decides which training examples to keep, relabel or inspect. The
    // three GD checkpoints come from trainRounds (same arithmetic as
    // q158, every round's weights captured); all three scores land in
    // ONE scan-speed projection with the models as literals; bands cut
    // on the ROUNDED statistics for a deterministic boundary (the
    // paper's ABSOLUTE thresholds — a 3-round distilled model
    // concentrates near ½, q178's young-model band note, so this
    // corpus maps to 'middle' and the conf columns carry the map;
    // longer training spreads the bands). Oracle:
    // the logregCtes rounds expose every checkpoint (w1_/w2_/w3_) —
    // the same three sigmoids, statistics and cuts replayed.
    Q("q446_dataset_cartography",
      (s, d) => {
        val docs = t(s, d, "documents")
        val ws = graft.operators.QualityClassifier.trainRounds(
          docs.where(col("doc_id") % 3 === 0).withColumn("y",
            (graft.operators.TextAnalysis.qualityScore(col("text"))
              >= 0.9).cast("long")),
          iters = 3, lr = 0.25)
        val sc = graft.operators.QualityClassifier
          .scoreTrajectory(docs, ws)
        val mraw = (col("s1") + col("s2") + col("s3")) / 3.0
        val vraw = ((col("s1") - mraw) * (col("s1") - mraw) +
          (col("s2") - mraw) * (col("s2") - mraw) +
          (col("s3") - mraw) * (col("s3") - mraw)) / 3.0
        sc.select(col("doc_id"), col("s1"), col("s2"), col("s3"),
            (round(mraw * 1000000.0) / 1000000.0).as("conf_mean"),
            (round(sqrt(vraw) * 1000000.0) / 1000000.0).as("conf_std"))
          .select(col("doc_id"), col("s1"), col("s2"), col("s3"),
            col("conf_mean"), col("conf_std"),
            when(col("conf_std") >= 0.1, "ambiguous")
              .when(col("conf_mean") >= 0.7, "easy")
              .when(col("conf_mean") <= 0.3, "hard")
              .otherwise("middle").as("band"))
          .orderBy("doc_id")
      },
      Some {
        def sig(r: Int) =
          s"""round(1.0/(1.0 + exp(-(r$r.w1*(x1/1000000.0)
             |      + r$r.w2*(x2/1000000.0) + r$r.w3*(x3/1000000.0)
             |      + r$r.w4*(x4/1000000.0) + r$r.w5*(x5/1000000.0))))
             |      * 1000000.0)/1000000.0""".stripMargin
        s"""WITH ${logregCtes(3)},
           |sc AS (SELECT doc_id,
           |    ${sig(1)} AS s1,
           |    ${sig(2)} AS s2,
           |    ${sig(3)} AS s3
           |  FROM fx CROSS JOIN w1_ r1 CROSS JOIN w2_ r2
           |  CROSS JOIN w3_ r3),
           |st AS (SELECT doc_id, s1, s2, s3,
           |    round((s1 + s2 + s3) / 3.0 * 1000000.0) / 1000000.0
           |      AS conf_mean,
           |    round(sqrt(((s1 - (s1 + s2 + s3) / 3.0)
           |        * (s1 - (s1 + s2 + s3) / 3.0)
           |      + (s2 - (s1 + s2 + s3) / 3.0)
           |        * (s2 - (s1 + s2 + s3) / 3.0)
           |      + (s3 - (s1 + s2 + s3) / 3.0)
           |        * (s3 - (s1 + s2 + s3) / 3.0)) / 3.0)
           |      * 1000000.0) / 1000000.0 AS conf_std
           |  FROM sc)
           |SELECT doc_id, s1, s2, s3, conf_mean, conf_std,
           |  CASE WHEN conf_std >= 0.1 THEN 'ambiguous'
           |    WHEN conf_mean >= 0.7 THEN 'easy'
           |    WHEN conf_mean <= 0.3 THEN 'hard'
           |    ELSE 'middle' END AS band
           |FROM st ORDER BY doc_id""".stripMargin
      }),

    // ---- Temperature scaling (Guo et al. 2017): the one-parameter
    // post-hoc calibration tune — rescale the trained classifier's
    // logits by T ∈ {0.5, 1, 2} and pick the T minimizing held-out
    // NLL. Complements the calibration MEASUREMENTS (reliability q178,
    // ECE q370, isotonic q272) with the standard FIX. Logits round
    // 1e-6 (one literal-model scan), the sigmoid quantizes 1e-6 and
    // clamps before the 1e-8-quantized ln, so the per-T sums are exact
    // integers; argmin ties on the smaller T.
    Q("q447_temperature_scaling",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val docs = t(s, d, "documents")
        val zs = graft.operators.QualityClassifier
          .logits(docs.where(col("doc_id") % 3 =!= 0),
            logregModel(docs))
        val y = docs.select(col("doc_id"),
          (graft.operators.TextAnalysis.qualityScore(col("text"))
            >= 0.9).cast("long").as("y"))
        val g = zs.join(y, "doc_id")
          .select(col("z"), col("y"),
            explode(array(lit(0.5), lit(1.0), lit(2.0))).as("tt"))
        val sigq = {
          val s0 = round(lit(1.0) / (lit(1.0)
            + exp(-(col("z") / col("tt")))) * 1000000.0) / 1000000.0
          greatest(least(s0, lit(0.999999)), lit(0.000001))
        }
        def qln8(c: org.apache.spark.sql.Column) =
          round(log(c) * 100000000.0).cast(dec)
        val nll = g.select(col("tt"),
            (col("y").cast(dec) * qln8(sigq) +
              (lit(1L) - col("y")).cast(dec) *
                qln8(lit(1.0) - sigq)).as("term"))
          .groupBy("tt").agg((-sum(col("term"))).as("s"),
            count(lit(1)).cast("long").as("n"))
          .select(col("tt").as("temperature"),
            (round(col("s").cast("double") / 100000000.0
              / col("n").cast("double") * 1000000.0) / 1000000.0)
              .as("nll"))
          .localCheckpoint()
        val best = nll.orderBy(col("nll"), col("temperature")).limit(1)
          .select(col("temperature").as("bt"))
        nll.join(broadcast(best))
          .select(col("temperature"), col("nll"),
            (col("temperature") === col("bt")).as("chosen"))
          .orderBy("temperature")
      },
      Some(s"""WITH ${logregCtes(3)},
              |zz AS (SELECT doc_id,
              |    round((w1*(x1/1000000.0) + w2*(x2/1000000.0)
              |      + w3*(x3/1000000.0) + w4*(x4/1000000.0)
              |      + w5*(x5/1000000.0)) * 1000000.0) / 1000000.0 AS z,
              |    y
              |  FROM fx CROSS JOIN wfin WHERE doc_id % 3 <> 0),
              |g AS (SELECT z, y, unnest([0.5, 1.0, 2.0]) AS tt FROM zz),
              |sg AS (SELECT tt, y,
              |    greatest(least(round(1.0/(1.0 + exp(-(z / tt)))
              |      * 1000000.0) / 1000000.0, 0.999999), 0.000001) AS sq
              |  FROM g),
              |nl AS (SELECT tt,
              |    -sum(CAST(y AS HUGEINT)
              |        * CAST(round(ln(sq) * 100000000.0) AS HUGEINT)
              |      + CAST(1 - y AS HUGEINT)
              |        * CAST(round(ln(1.0 - sq) * 100000000.0)
              |          AS HUGEINT)) AS s,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM sg GROUP BY tt),
              |res AS (SELECT tt AS temperature,
              |    round(CAST(s AS DOUBLE) / 100000000.0
              |      / CAST(n AS DOUBLE) * 1000000.0) / 1000000.0 AS nll
              |  FROM nl),
              |bt AS (SELECT temperature AS bt FROM res
              |  ORDER BY nll, temperature LIMIT 1)
              |SELECT temperature, nll, temperature = bt AS chosen
              |FROM res CROSS JOIN bt ORDER BY temperature""".stripMargin)),

    // ---- Rank-biased overlap (Webber et al. 2010, p = 0.9, truncated
    // at depth 20) between the engine's two retrieval models — BM25
    // (q98) and query-likelihood Dirichlet (q216) on the same query:
    // the top-weighted list-agreement metric that, unlike Kendall/
    // Spearman (q308/q309), weights rank 1 disagreements most and
    // handles non-conjoint lists. The p-power weights are ONE literal
    // table computed driver-side and embedded verbatim in the oracle
    // (the q418 DCT-table pattern), so both engines fold identical
    // doubles. Lists are model-sized (top-20 collects); the retrieval
    // chains are the proven q98/q216 plans.
    Q("q449_rbo_rankings",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val docs = t(s, d, "documents")
        val qt = Seq("spark", "window", "vector")
        val la = graft.operators.TrainingPrep.bm25(docs, qt, topK = 20)
          .select("doc_id").collect().map(_.getLong(0))
        val lb = graft.operators.TrainingPrep
          .qlDirichlet(docs, qt, topK = 20)
          .select("doc_id").collect().map(_.getLong(0))
        val rb = lb.zipWithIndex.toMap
        val p = 0.9
        val pw = Array.iterate(1.0, 20)(_ * p)
        var rbo = 0.0
        for (dep <- 1 to 20) {
          val ov = la.take(dep).count(x => rb.getOrElse(x, 99) < dep)
          rbo += (1 - p) * pw(dep - 1) * ov.toDouble / dep
        }
        val inter = la.count(rb.contains)
        def r6(x: Double) = math.round(x * 1e6) / 1e6.toDouble
        Seq((20L, inter.toLong,
            r6(inter.toDouble / (40 - inter).toDouble), r6(rbo)))
          .toDF("depth", "overlap_at_k", "jaccard_at_k", "rbo")
      },
      Some {
        val p = 0.9
        val pw = Array.iterate(1.0, 20)(_ * p)
        val vals = (1 to 20).map(dep => s"($dep, ${pw(dep - 1)})")
          .mkString(", ")
        s"""WITH px(d, w) AS (VALUES $vals),
           |da AS (SELECT doc_id, string_split(text, ' ') AS w
           |  FROM documents),
           |sa AS (SELECT avg(len(w)) AS avgdl,
           |    CAST(count(*) AS DOUBLE) AS n FROM da),
           |tfa AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
           |    any_value(dl) AS dl
           |  FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS term
           |        FROM da)
           |  WHERE term IN ('spark', 'window', 'vector')
           |  GROUP BY doc_id, term),
           |dfa AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tfa
           |  GROUP BY term),
           |la0 AS (SELECT doc_id,
           |    round(sum(ln((n - df + 0.5) / (df + 0.5) + 1) * tf * 2.2
           |      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4)
           |      AS score
           |  FROM tfa JOIN dfa USING (term), sa
           |  GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20),
           |la AS (SELECT doc_id, row_number()
           |    OVER (ORDER BY score DESC, doc_id) AS r FROM la0),
           |dlb AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM da),
           |totb AS (SELECT CAST(sum(len(w)) AS DOUBLE) AS total FROM da),
           |tmb AS (SELECT doc_id, term FROM
           |    (SELECT doc_id, unnest(w) AS term FROM da)
           |  WHERE term IN ('spark', 'window', 'vector')),
           |cfb AS (SELECT term, CAST(count(*) AS DOUBLE) AS cf FROM tmb
           |  GROUP BY term),
           |tfb AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
           |  FROM tmb GROUP BY 1, 2),
           |p1b AS (SELECT doc_id,
           |    sum(ln(1.0 + tf / (2000.0 * (cf / total)))) AS s
           |  FROM tfb JOIN cfb USING (term), totb GROUP BY doc_id),
           |lb0 AS (SELECT dlb.doc_id,
           |    round(coalesce(s, 0.0)
           |      + 3.0 * ln(2000.0 / (dl + 2000.0)), 4) AS score
           |  FROM dlb LEFT JOIN p1b USING (doc_id)
           |  ORDER BY score DESC, dlb.doc_id LIMIT 20),
           |lb AS (SELECT doc_id, row_number()
           |    OVER (ORDER BY score DESC, doc_id) AS r FROM lb0),
           |mm0 AS (SELECT la.r AS ra, lb.r AS rb FROM la JOIN lb
           |  USING (doc_id)),
           |ov AS (SELECT px.d, px.w, count(mm0.ra) AS o FROM px
           |  LEFT JOIN mm0 ON mm0.ra <= px.d AND mm0.rb <= px.d
           |  GROUP BY px.d, px.w),
           |res AS (SELECT round(sum((1.0 - 0.9) * w
           |    * CAST(o AS DOUBLE) / CAST(d AS DOUBLE)) * 1000000.0)
           |    / 1000000.0 AS rbo FROM ov),
           |io AS (SELECT CAST(count(*) AS BIGINT) AS inter FROM mm0)
           |SELECT CAST(20 AS BIGINT) AS depth, inter AS overlap_at_k,
           |  round(CAST(inter AS DOUBLE)
           |    / CAST(40 - inter AS DOUBLE) * 1000000.0) / 1000000.0
           |    AS jaccard_at_k,
           |  res.rbo
           |FROM io CROSS JOIN res""".stripMargin
      }),

    // ---- Class-balanced reweighting (Cui et al. 2019): per-language
    // sampling weights from the EFFECTIVE number of samples
    // E_c = (1−β^{n_c})/(1−β), β = 0.999 — the re-balancing between
    // naive inverse-frequency (over-corrects) and none at all, the
    // training-mix input next to temperature mixing (q111). β^n
    // composes as exp(n·ln β) with the ln 1e-8-quantized and the
    // power re-quantized 1e-8, identical both engines; weights
    // normalize to sum to the class count. Model-sized end to end
    // after one class-count aggregation.
    Q("q448_class_balanced_weights",
      (s, d) => {
        val cnts = t(s, d, "documents").groupBy("lang")
          .agg(count(lit(1)).cast("long").as("n_docs"))
          .localCheckpoint()
        val lnB = round(log(lit(0.999)) * 100000000.0) / 100000000.0
        val bpow = round(exp(col("n_docs").cast("double") * lnB)
          * 100000000.0) / 100000000.0
        val raw = (lit(1.0) - lit(0.999)) / (lit(1.0) - bpow)
        val withRaw = cnts.select(col("lang"), col("n_docs"),
          bpow.as("beta_pow"), raw.as("raw"))
        val tot = withRaw.agg(sum(col("raw")).as("sraw"),
          count(lit(1)).cast("long").as("k"))
        withRaw.join(broadcast(tot))
          .select(col("lang"), col("n_docs"),
            (round(col("beta_pow") * 1000000.0) / 1000000.0)
              .as("beta_pow"),
            (round(col("raw") * col("k").cast("double") / col("sraw")
              * 1000000.0) / 1000000.0).as("weight"))
          .orderBy("lang")
      },
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT)
             |    AS n_docs FROM documents GROUP BY lang),
             |w0 AS (SELECT lang, n_docs,
             |    round(exp(CAST(n_docs AS DOUBLE)
             |      * (round(ln(0.999) * 100000000.0) / 100000000.0))
             |      * 100000000.0) / 100000000.0 AS beta_pow
             |  FROM c),
             |w1 AS (SELECT lang, n_docs, beta_pow,
             |    (1.0 - 0.999) / (1.0 - beta_pow) AS raw FROM w0),
             |tt AS (SELECT sum(raw) AS sraw,
             |    CAST(count(*) AS BIGINT) AS k FROM w1)
             |SELECT lang, n_docs,
             |  round(beta_pow * 1000000.0) / 1000000.0 AS beta_pow,
             |  round(raw * CAST(k AS DOUBLE) / sraw * 1000000.0)
             |    / 1000000.0 AS weight
             |FROM w1 CROSS JOIN tt ORDER BY lang""".stripMargin)),

    // ---- Curation pipeline v7 (this wave's gates composed): artifact
    // battery (q422 keep) → quality classifier (q158 keep) → exact
    // dedup keeper (q20) → class-balanced target mix (q448 weights FIT
    // ON THE SURVIVORS, the v3 refit discipline) with the expected
    // post-sampling count per language. Per-language stage counts from
    // ONE conditional-sum aggregation; every stage in its proven form;
    // oracle composes the island-SQL artifact chain, the logreg
    // rounds, min-id dedup and the weight formula end-to-end.
    Q("q450_pipeline_v7",
      (s, d) => {
        val bad = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\uFFFD]"
        val block = Seq("free", "click", "subscribe", "winner")
        val docs = t(s, d, "documents")
        val run = aggregate(col("w"),
          named_struct(lit("prev"), lit(""), lit("cur"), lit(0L),
            lit("best"), lit(0L)),
          (acc, x) => {
            val cur = when(x === acc.getField("prev"),
              acc.getField("cur") + 1).otherwise(lit(1L))
            named_struct(lit("prev"), x, lit("cur"), cur,
              lit("best"), greatest(acc.getField("best"), cur))
          },
          acc => acc.getField("best"))
        val art = docs
          .select(col("doc_id"), col("lang"), col("text"),
            graft.operators.TextAnalysis.tokens(col("text")).as("w"))
          .select(col("doc_id"), col("lang"), col("text"),
            (run <= 4 &&
              (length(col("text")) - length(regexp_replace(col("text"),
                bad, ""))) === 0 &&
              size(filter(col("w"), x => x.isin(block: _*))) <= 2)
              .as("a_keep"))
        // ABOVE-MEAN keep (the q300 rule): the young model's scores sit
        // just under ½, so the absolute 0.5 gate would empty the corpus
        val sc0 = graft.operators.QualityClassifier
          .score(docs, logregModel(docs))
          .select(col("doc_id"), col("score"))
        val mrow = sc0.agg((round(avg(col("score")) * 1000000.0)
          / 1000000.0).as("ms"))
        val sc = sc0.join(broadcast(mrow))
          .select(col("doc_id"), (col("score") > col("ms")).as("q_keep"))
        val staged = art.join(sc, "doc_id")
          .withColumn("aq", col("a_keep") && col("q_keep"))
          .localCheckpoint()
        val keepers = staged.where(col("aq"))
          .groupBy("text").agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), lit(true).as("d_keep"))
        val fin = staged.join(keepers, Seq("doc_id"), "left")
          .select(col("lang"), col("a_keep"), col("aq"),
            coalesce(col("d_keep"), lit(false)).as("dk"))
        val per = fin.groupBy("lang").agg(
          count(lit(1)).cast("long").as("n_raw"),
          sum(when(col("a_keep"), 1L).otherwise(0L)).cast("long")
            .as("n_artifact"),
          sum(when(col("aq"), 1L).otherwise(0L)).cast("long")
            .as("n_quality"),
          sum(when(col("dk"), 1L).otherwise(0L)).cast("long")
            .as("n_dedup"))
          .localCheckpoint()
        val lnB = round(log(lit(0.999)) * 100000000.0) / 100000000.0
        val bpow = round(exp(col("n_dedup").cast("double") * lnB)
          * 100000000.0) / 100000000.0
        // an empty class would make β^0 = 1 → 0-division: weightless
        val raw = when(col("n_dedup") > 0,
          (lit(1.0) - lit(0.999)) / (lit(1.0) - bpow)).otherwise(lit(0.0))
        val withRaw = per.withColumn("raw", raw)
        val tot = withRaw.agg(sum(col("raw")).as("sraw"),
          count(lit(1)).cast("long").as("k"))
        withRaw.join(broadcast(tot))
          .select(col("lang"), col("n_raw"), col("n_artifact"),
            col("n_quality"), col("n_dedup"),
            when(col("sraw") > 0,
              round(col("raw") * col("k").cast("double") / col("sraw")
                * 1000000.0) / 1000000.0).as("cb_weight"),
            when(col("sraw") > 0,
              round(col("raw") * col("k").cast("double") / col("sraw")
                * col("n_dedup").cast("double")).cast("long"))
              .as("target_n"))
          .orderBy("lang")
      },
      Some(s"""WITH ${logregCtes(3)},
              |wtok AS (SELECT doc_id, string_split(text, ' ') AS w
              |  FROM documents),
              |tk2 AS (SELECT doc_id,
              |    unnest([{'i': i, 't': w[i]}
              |      for i in range(1, len(w) + 1)], recursive := true)
              |  FROM wtok),
              |g2 AS (SELECT doc_id, i, t,
              |    CASE WHEN lag(t) OVER (PARTITION BY doc_id ORDER BY i)
              |      = t THEN 0 ELSE 1 END AS brk
              |  FROM tk2),
              |gi2 AS (SELECT doc_id, i, t,
              |    sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS grp
              |  FROM g2),
              |runs AS (SELECT doc_id, max(cnt) AS max_run
              |  FROM (SELECT doc_id, grp, count(*) AS cnt FROM gi2
              |        GROUP BY 1, 2) GROUP BY doc_id),
              |akeep AS (SELECT d.doc_id, d.lang, d.text,
              |    runs.max_run <= 4
              |      AND length(d.text) - length(regexp_replace(d.text,
              |        '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x{FFFD}]', '',
              |        'g')) = 0
              |      AND len(list_filter(string_split(d.text, ' '), x ->
              |        x IN ('free', 'click', 'subscribe', 'winner')))
              |        <= 2 AS a_keep
              |  FROM documents d JOIN runs ON runs.doc_id = d.doc_id),
              |sc0 AS (SELECT doc_id,
              |    round(1.0/(1.0 + exp(-(w1*(x1/1000000.0)
              |      + w2*(x2/1000000.0) + w3*(x3/1000000.0)
              |      + w4*(x4/1000000.0) + w5*(x5/1000000.0))))
              |      * 1000000.0)/1000000.0 AS score
              |  FROM fx CROSS JOIN wfin),
              |ms AS (SELECT round(avg(score) * 1000000.0) / 1000000.0
              |    AS ms FROM sc0),
              |qk AS (SELECT doc_id, score > ms AS q_keep
              |  FROM sc0 CROSS JOIN ms),
              |st AS (SELECT a.doc_id, a.lang, a.text, a.a_keep,
              |    a.a_keep AND qk.q_keep AS aq
              |  FROM akeep a JOIN qk ON qk.doc_id = a.doc_id),
              |kp AS (SELECT min(doc_id) AS doc_id FROM st WHERE aq
              |  GROUP BY text),
              |fin AS (SELECT st.lang, st.a_keep, st.aq,
              |    kp.doc_id IS NOT NULL AS dk
              |  FROM st LEFT JOIN kp ON kp.doc_id = st.doc_id),
              |per AS (SELECT lang,
              |    CAST(count(*) AS BIGINT) AS n_raw,
              |    CAST(sum(CASE WHEN a_keep THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n_artifact,
              |    CAST(sum(CASE WHEN aq THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n_quality,
              |    CAST(sum(CASE WHEN dk THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n_dedup
              |  FROM fin GROUP BY lang),
              |w0 AS (SELECT per.*,
              |    CASE WHEN n_dedup > 0 THEN (1.0 - 0.999) / (1.0
              |      - round(exp(CAST(n_dedup AS DOUBLE)
              |        * (round(ln(0.999) * 100000000.0) / 100000000.0))
              |        * 100000000.0) / 100000000.0) ELSE 0.0 END AS raw
              |  FROM per),
              |tt AS (SELECT sum(raw) AS sraw,
              |    CAST(count(*) AS BIGINT) AS k FROM w0)
              |SELECT lang, n_raw, n_artifact, n_quality, n_dedup,
              |  CASE WHEN sraw > 0 THEN round(raw * CAST(k AS DOUBLE)
              |    / sraw * 1000000.0) / 1000000.0 END AS cb_weight,
              |  CASE WHEN sraw > 0 THEN CAST(round(raw
              |    * CAST(k AS DOUBLE) / sraw
              |    * CAST(n_dedup AS DOUBLE)) AS BIGINT) END AS target_n
              |FROM w0 CROSS JOIN tt ORDER BY lang""".stripMargin),
      bench = true),

    // ---- Disk-maintained HLL register sidecar (q182's durable-sketch
    // flow applied to cardinality): each run LOADS the versioned
    // (bucket, M) parquet sidecar, MAX-merges the batch's registers
    // (associative, exactly like the bloom OR), persists the next
    // version — batch-proportional forever, durable across JVMs. The
    // oracle computes the whole-corpus q413 HLL directly and must
    // match, because register max-merge == rebuild by construction.
    // Exact distinct joined as the audit column.
    Q("q451_hll_sidecar",
      (s, d) => {
        import graft.operators.Incremental
        val spark = s
        import spark.implicits._
        val root = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), "graft-hllside"),
          java.lang.Integer.toHexString(d.stripSuffix("/").hashCode))
          .toString
        val ev = Tables.events(s, d).select(col("user_id"))
        def regsOf(batch: org.apache.spark.sql.DataFrame): Array[Long] = {
          val h = graft.expressions.PortableHash.md5Hash60(col("user_id"))
          val rows = batch
            .select(h.as("h"))
            .select(col("h").bitwiseAND(lit(255L)).as("bucket"),
              shiftright(col("h"), 8).as("rest"))
            .select(col("bucket"),
              when(col("rest") === 0, lit(53L))
                .otherwise(lit(53L) - length(bin(col("rest")))
                  .cast("long")).as("rho"))
            .groupBy("bucket").agg(max("rho").as("m"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          Array.tabulate(256)(b => rows.getOrElse(b.toLong, 0L))
        }
        // v1: first batch (even users); v2: loaded v1 max-merged with
        // the odd-user batch — history never rescanned
        Incremental.saveRegisters(s, root, 1,
          regsOf(ev.where(col("user_id") % 2 === 0)))
        val v1 = Incremental.loadRegisters(s, root, 1)
        val b2 = regsOf(ev.where(col("user_id") % 2 =!= 0))
        Incremental.saveRegisters(s, root, 2,
          Array.tabulate(256)(i => math.max(v1(i), b2(i))))
        val m = Incremental.loadRegisters(s, root, 2)
        val z = m.map(mi => 1L << (53 - mi)).sum
        val v = m.count(_ == 0L)
        val eRaw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
          9007199254740992.0 / z.toDouble
        val lc = math.round(math.log(256.0 / v.toDouble) * 1e8) / 1e8 *
          256.0
        val est = math.round((if (v > 0 && eRaw <= 640.0) lc else eRaw)
          * 1e4) / 1e4.toDouble
        val exact = ev.agg(countDistinct(col("user_id")).as("x"))
          .collect().head.getLong(0)
        Seq((est, exact,
            math.round(math.abs(est - exact.toDouble) / exact.toDouble
              * 1e6) / 1e6.toDouble))
          .toDF("est", "exact_distinct", "rel_err")
      },
      Some("""WITH ev AS (SELECT user_id,
             |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
             |      AS BIGINT) AS h
             |  FROM events),
             |reg AS (SELECT h & 255 AS bucket,
             |    max(CASE WHEN (h >> 8) = 0 THEN 53
             |        ELSE 53 - length(bin(h >> 8)) END) AS m
             |  FROM ev GROUP BY 1),
             |fold AS (SELECT
             |    CAST(sum(1::BIGINT << (53 - m)) AS HUGEINT)
             |      + (256 - CAST(count(*) AS HUGEINT))
             |        * CAST(9007199254740992 AS HUGEINT) AS z,
             |    256 - count(*) AS v
             |  FROM reg),
             |est AS (SELECT
             |    round(CASE WHEN v > 0
             |        AND 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
             |          * 9007199254740992.0 / CAST(z AS DOUBLE) <= 640.0
             |      THEN round(ln(256.0 / CAST(v AS DOUBLE))
             |          * 100000000.0) / 100000000.0 * 256.0
             |      ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
             |        * 9007199254740992.0 / CAST(z AS DOUBLE) END
             |      * 10000.0) / 10000.0 AS est
             |  FROM fold),
             |ex AS (SELECT count(DISTINCT user_id) AS exact_distinct
             |  FROM events)
             |SELECT est, exact_distinct,
             |  round(abs(est - CAST(exact_distinct AS DOUBLE))
             |    / CAST(exact_distinct AS DOUBLE) * 1000000.0)
             |    / 1000000.0 AS rel_err
             |FROM est CROSS JOIN ex""".stripMargin)),

    // ---- ANN tuning curve: recall@10 vs nprobe for the IVF index —
    // the operating-point table an index deployment publishes (probe 1
    // cell cheaply at some recall, or 4 at near-exact). Cells from the
    // q129 Lloyd fit (k = 8, 2 rounds); probe ranking uses the
    // POSTERIOR cell means of the final assignment (exact integer
    // sums / counts — self-contained, both engines derive it from the
    // same relation) with query→cell distances folded in the
    // kmeansCtes sequential order; candidate and brute top-10s use the
    // register's rounded-cosine contract with the vid tiebreak.
    // 3 query vectors × nprobe ∈ {1,2,4}; model-sized collects only.
    Q("q452_ann_tuning",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val emb = t(s, d, "embeddings")
        val asg = graft.operators.Clustering
          .kMeansAssign(emb, k = 8, iters = 2)
          .select(col("vec_id"), col("cluster")).localCheckpoint()
        val qcol = expr("transform(embedding, x -> " +
          "CAST(round(CAST(x AS DOUBLE) * 10000.0) AS LONG))")
        val quant = emb.select(col("vec_id"), qcol.as("q"))
        // posterior cell means: exact integer per-dim sums / count
        val cents = quant.join(asg, "vec_id")
          .select(col("cluster"), posexplode(col("q")).as(Seq("dim", "v")))
          .select(col("cluster").cast("long").as("cluster"),
            col("dim").cast("long").as("dim"), col("v"))
          .groupBy("cluster", "dim")
          .agg(sum(col("v")).cast("decimal(38,0)").as("sv"),
            count(lit(1)).as("n"))
          .select(col("cluster"), col("dim"),
            (col("sv").cast("double") / col("n").cast("double"))
              .as("c"))
          .collect().groupBy(_.getLong(0))
          .map { case (c, rows) =>
            c -> rows.sortBy(_.getLong(1)).map(_.getDouble(2))
          }
        val qvs = quant.where(col("vec_id") < 3)
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
          .sortBy(_._1)
        val dv = emb.select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .localCheckpoint()
        // cosine ranking uses the RAW double query vector (the oracle's
        // embedding::DOUBLE[]); the quantized form serves only the cell
        // distances (the e-CTE contract)
        val qraw = dv.where(col("vec_id") < 3)
          .collect().map(r => r.getLong(0) ->
            r.getSeq[Double](1).toArray).toMap
        def top10(df: org.apache.spark.sql.DataFrame,
            qd: Array[Double]): Set[Long] = {
          val qlit = array(qd.map(lit(_)): _*)
          df.select(col("vec_id"),
              (round(graft.operators.Similarity.cosine(qlit, col("v"))
                * 1000000.0) / 1000000.0).as("cos"))
            .orderBy(col("cos").desc, col("vec_id")).limit(10)
            .collect().map(_.getLong(0)).toSet
        }
        val out = for {
          (qvid, qv) <- qvs.toSeq
          brute = top10(dv, qraw(qvid))
          // cells ranked by the kmeansCtes sequential distance fold
          ranked = cents.toSeq.map { case (c, cv) =>
            var s0 = 0.0
            var i = 0
            while (i < cv.length) {
              val dd = qv(i).toDouble - cv(i); s0 += dd * dd; i += 1
            }
            (c, s0)
          }.sortBy { case (c, dist) => (dist, c) }.map(_._1)
          np <- Seq(1, 2, 4)
        } yield {
          val cells = ranked.take(np).toSet
          val cand = dv.join(asg, "vec_id")
            .where(col("cluster").isin(cells.toSeq.map(Long.box): _*))
          val nCand = cand.count()
          val got = top10(cand, qraw(qvid))
          (qvid, np, nCand,
            math.round(got.intersect(brute).size.toDouble / 10.0 * 1e4)
              / 1e4.toDouble)
        }
        out.toDF("query_vid", "nprobe", "n_candidates", "recall_at_10")
          .select(col("query_vid"), col("nprobe").cast("int")
            .as("nprobe"), col("n_candidates"), col("recall_at_10"))
          .orderBy("query_vid", "nprobe")
      },
      Some {
        val probes = (for { q <- 0 to 2; np <- Seq(1, 2, 4) }
          yield s"SELECT $q AS qv, $np AS np").mkString(" UNION ALL ")
        s"""WITH ${kmeansCtes(8, 2, 64)},
           |ufin AS (SELECT cid,
           |    list_reduce(list(q ORDER BY vid),
           |      (a, b) -> [a[i+1] + b[i+1] for i in range(0, 64)])
           |      AS sl,
           |    count(*) AS c
           |  FROM sfin JOIN e USING (vid) GROUP BY cid),
           |cf AS (SELECT cid,
           |    [CAST(x AS DOUBLE) / CAST(c AS DOUBLE) for x in sl]
           |      AS cl FROM ufin),
           |pq AS ($probes),
           |qd AS (SELECT pq.qv, pq.np, cf.cid,
           |    list_reduce(list_transform(
           |      [CAST(e.q[i+1] AS DOUBLE) - cf.cl[i+1]
           |        for i in range(0, 64)], v -> v * v),
           |      (x, y) -> x + y) AS dist
           |  FROM pq JOIN e ON e.vid = pq.qv CROSS JOIN cf),
           |rk AS (SELECT qv, np, cid, row_number() OVER (
           |    PARTITION BY qv, np ORDER BY dist, cid) AS rn FROM qd),
           |cells AS (SELECT qv, np, cid FROM rk WHERE rn <= np),
           |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v
           |  FROM embeddings),
           |qe AS (SELECT pq.qv, pq.np, ev.v AS qvec FROM pq
           |  JOIN ev ON ev.vec_id = pq.qv),
           |cand AS (SELECT qe.qv, qe.np, ev.vec_id,
           |    round(list_cosine_similarity(qe.qvec, ev.v)
           |      * 1000000.0) / 1000000.0 AS cos
           |  FROM qe JOIN cells cl ON cl.qv = qe.qv AND cl.np = qe.np
           |  JOIN sfin s2 ON s2.cid = cl.cid
           |  JOIN ev ON ev.vec_id = s2.vid),
           |ct AS (SELECT qv, np, vec_id, row_number() OVER (
           |    PARTITION BY qv, np ORDER BY cos DESC, vec_id) AS rn
           |  FROM (SELECT DISTINCT qv, np, vec_id, cos FROM cand)),
           |nc AS (SELECT qv, np,
           |    CAST(count(DISTINCT vec_id) AS BIGINT) AS n_candidates
           |  FROM cand GROUP BY 1, 2),
           |br AS (SELECT pq2.qv, ev.vec_id, row_number() OVER (
           |    PARTITION BY pq2.qv ORDER BY
           |      round(list_cosine_similarity(q2.v, ev.v) * 1000000.0)
           |        / 1000000.0 DESC, ev.vec_id) AS rn
           |  FROM (SELECT DISTINCT qv FROM pq) pq2
           |  JOIN ev q2 ON q2.vec_id = pq2.qv CROSS JOIN ev),
           |hits AS (SELECT ct.qv, ct.np,
           |    CAST(count(*) AS BIGINT) AS h
           |  FROM ct JOIN br ON br.qv = ct.qv
           |    AND br.vec_id = ct.vec_id AND br.rn <= 10
           |  WHERE ct.rn <= 10 GROUP BY 1, 2)
           |SELECT CAST(nc.qv AS BIGINT) AS query_vid,
           |  CAST(nc.np AS INT) AS nprobe, nc.n_candidates,
           |  round(CAST(coalesce(hits.h, 0) AS DOUBLE) / 10.0
           |    * 10000.0) / 10000.0 AS recall_at_10
           |FROM nc LEFT JOIN hits ON hits.qv = nc.qv
           |  AND hits.np = nc.np
           |ORDER BY query_vid, nprobe""".stripMargin
      }))

  /** Thresholded nation-trade graph shared by q255/q256 (the q196/q197
    * edge recipe): trade-count edges between customer and supplier
    * nations, kept when strictly heavier than the mean edge weight.
    * Dims broadcast; the fact join is the only shuffle. */
  private def tradeEdges(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val nation = t(s, d, "nation")
    val raw = t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("ck"),
        col("n_name").as("src"))), col("c_nationkey") === col("ck"))
      .join(broadcast(nation.select(col("n_nationkey").as("sk"),
        col("n_name").as("dst"))), col("s_nationkey") === col("sk"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val avgW = raw.agg(avg(col("w")).as("aw"))
    raw.join(broadcast(avgW))
      .where(col("w").cast("double") > col("aw"))
      .select("src", "dst")
  }

  /** The q240 stationary-distribution WITH-prefix (transition counts +
    * 30 quantized power-iteration rounds, ending in `pi30`), shared by
    * q240 and the q269 entropy-rate composition. Every pi CTE
    * MATERIALIZED: without it DuckDB inlines the 30-layer chain and the
    * planner blows up (observed: minutes). def, not val: interpolated
    * from `all`'s initializer, which runs first. */
  private def stationaryCtePrefix: String = {
    val roundCtes = (1 to 30).map { r =>
      s"""pi$r AS MATERIALIZED (SELECT s.s,
         |    CAST(round(coalesce(x.acc, 0.0) * 1000000000.0) AS BIGINT) AS q
         |  FROM st s LEFT JOIN (
         |    SELECT m.to_type AS s,
         |        sum((pp.q / 1000000000.0)
         |            * (CAST(m.n AS DOUBLE) / CAST(t.tot AS DOUBLE))) AS acc
         |    FROM pi${r - 1} pp JOIN n m ON m.from_type = pp.s
         |    JOIN tt t ON t.from_type = pp.s
         |    GROUP BY m.to_type) x ON x.s = s.s)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (SELECT lag(event_type) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
       |    event_type AS to_type FROM events),
       |n AS MATERIALIZED (SELECT from_type, to_type, count(*) AS n FROM p
       |      WHERE from_type IS NOT NULL GROUP BY 1, 2),
       |tt AS MATERIALIZED (SELECT from_type, sum(n) AS tot FROM n GROUP BY 1),
       |st AS MATERIALIZED (SELECT DISTINCT s FROM (
       |  SELECT from_type AS s FROM n UNION SELECT to_type FROM n)),
       |ns AS (SELECT count(*) AS k FROM st),
       |pi0 AS MATERIALIZED (SELECT s, CAST(round(1000000000.0 / k) AS BIGINT) AS q
       |        FROM st, ns),
       |$roundCtes""".stripMargin
  }

  /** The matching DuckDB CTE prefix for [[tradeEdges]], ending in `ed`
    * (deduped undirected above-average pairs). def, not val: interpolated
    * from `all`'s initializer, which runs first. */
  private def tradeEdgeCtes: String =
    """raw AS (SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  GROUP BY 1, 2),
      |aw AS (SELECT avg(w) AS aw FROM raw),
      |th AS (SELECT src, dst FROM raw, aw WHERE w > aw),
      |ed AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |       FROM th WHERE src <> dst)""".stripMargin

  /** DuckDB replica of [[graft.operators.QualityClassifier.train]]: the
    * feature extraction (quantized 1e-6 longs, ln composed identically),
    * the heuristic-quality distillation label (q29's unrounded-double
    * composition, compared exactly like the gopher rule booleans), and
    * `iters` unrolled GD rounds. Each round quantizes the sigmoid to
    * 1e-6 BEFORE the gradient so every per-doc term (sq − y·10⁶)·xq_j is
    * an exact integer (HUGEINT sum == the engine's decimal(38,0) sum);
    * the weight update divides the same exact integers by the same
    * exact doubles in the same order, so w stays bit-identical with the
    * engine across all rounds. Ends with CTE `wfin` (w1..w5) and keeps
    * `fx` (doc_id, y, x1..x5) in scope for scoring. */
  /** The `fx` feature CTE shared by the logreg trainer replica and the
    * decision-stump oracle: (doc_id, y, x1..x5) — the distillation
    * label (q29's unrounded-double quality composition ≥ 0.9) and
    * [[graft.operators.QualityClassifier.featuresQ]]'s five quantized
    * 1e-6 features, all exact BIGINTs. */
  /** SQL xlogx: c·ln c with the 0·ln 0 = 0 convention (Dunning G²). */
  private def xlxSql(e: String): String =
    s"CASE WHEN $e > 0 THEN CAST($e AS DOUBLE) * ln(CAST($e AS DOUBLE)) ELSE 0.0 END"

  // def, not val: interpolated from `all`'s initializer, which runs first
  private def featureCtes: String =
    s"""fx AS MATERIALIZED (SELECT doc_id,
       |  CAST(least(len(string_split(text,' '))::DOUBLE / 50.0, 1.0) * 0.4
       |     + greatest(1.0 - (length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / length(text)) * 5.0, 0.0) * 0.4
       |     + least(len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to','is')))::DOUBLE
       |           / len(string_split(text,' ')) * 10.0, 1.0) * 0.2 >= 0.9 AS BIGINT) AS y,
       |  CAST(1000000 AS BIGINT) AS x1,
       |  CAST(round(ln(1 + len(string_split(text,' '))) * 1000000) AS BIGINT) AS x2,
       |  CAST(round(CASE WHEN length(text) > 0
       |       THEN length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / length(text)
       |       ELSE 0.0 END * 1000000) AS BIGINT) AS x3,
       |  CAST(round(len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to','is')))::DOUBLE
       |       / len(string_split(text,' ')) * 1000000) AS BIGINT) AS x4,
       |  CAST(round((length(text) - len(string_split(text,' ')) + 1)::DOUBLE
       |       / len(string_split(text,' ')) * 1000000) AS BIGINT) AS x5
       |  FROM documents)""".stripMargin

  /** The GD-round CTEs of the logreg replica, assuming `fx` is already
    * in scope: training slice (`trainPred` over fx), per-round gradient
    * + weight updates, ending in `wfin$sfx` (w1..w5). `sfx` suffixes
    * every CTE name so several independently-trained models (the q213
    * cross-validation folds) coexist in ONE WITH clause. */
  private def logregRounds(iters: Int, lr: String = "0.25",
      trainPred: String = "doc_id % 3 = 0", sfx: String = ""): String = {
    val x = (1 to 5).map(j => s"x$j")
    def z(w: Int => String) =
      x.zipWithIndex.map { case (xj, j) => s"${w(j + 1)}*($xj/1000000.0)" }
        .mkString(" + ")
    val rounds = (1 to iters).map { r =>
      val wPrev: Int => String =
        if (r == 1) _ => "0.0" else j => s"w$j"
      val from = if (r == 1) s"tr$sfx" else s"tr$sfx CROSS JOIN w${r - 1}_$sfx"
      val gs = x.zipWithIndex.map { case (xj, j) =>
        s"sum((sq - y*1000000) * $xj) AS g${j + 1}" }.mkString(", ")
      val ws = (1 to 5).map { j =>
        s"${wPrev(j)} - $lr*((CAST(g$j AS DOUBLE)/1000000000000.0)/n) AS w$j"
      }.mkString(",\n       ")
      s"""it$r$sfx AS (SELECT $gs FROM (
         |    SELECT y, ${x.mkString(", ")},
         |      CAST(round(1.0/(1.0 + exp(-(${z(wPrev)}))) * 1000000) AS BIGINT) AS sq
         |    FROM $from)),
         |w${r}_$sfx AS (SELECT
         |       $ws
         |     FROM it$r$sfx CROSS JOIN nn$sfx${if (r == 1) "" else s" CROSS JOIN w${r - 1}_$sfx"})""".stripMargin
    }.mkString(",\n")
    s"""tr$sfx AS MATERIALIZED (SELECT * FROM fx WHERE $trainPred),
       |nn$sfx AS (SELECT count(*) AS n FROM tr$sfx),
       |$rounds,
       |wfin$sfx AS (SELECT w1, w2, w3, w4, w5 FROM w${iters}_$sfx)""".stripMargin
  }

  /** The q430 PPMI-spectral-embedding chain as suffixable CTE text
    * (every CTE name gets `sfx` appended; `pred` filters documents), so
    * several independent chains coexist in one WITH clause — the q163
    * suffix pattern. Emits ...vc$sfx (term→idx), x1_8$sfx / x2_8$sfx
    * (final components), l1$sfx / l2$sfx (Rayleigh quotients). Replays
    * [[graft.operators.TrainingPrep.ppmiSpectralEmbeddings]] exactly. */
  private def ppmiChainCtes(sfx: String, pred: String): String = {
    def matvec(src: String, out: String) =
      s"""$out AS (SELECT v0.i, coalesce(s.y, 0.0) AS y
         |  FROM $src v0 LEFT JOIN (
         |    SELECT mm$sfx.i, sum(mm$sfx.pm * x.x) AS y FROM mm$sfx
         |    JOIN $src x ON x.i = mm$sfx.j GROUP BY mm$sfx.i) s
         |    ON s.i = v0.i)""".stripMargin
    val r1 = (1 to 8).map { r =>
      s"""${matvec(s"x1_${r - 1}$sfx", s"y1_$r$sfx")},
         |n1_$r$sfx AS (SELECT sqrt(sum(y * y)) AS nrm FROM y1_$r$sfx),
         |x1_$r$sfx AS MATERIALIZED (SELECT i,
         |    round(y / nrm * 1000000000.0) / 1000000000.0 AS x
         |  FROM y1_$r$sfx CROSS JOIN n1_$r$sfx)""".stripMargin
    }.mkString(",\n")
    val r2 = (1 to 8).map { r =>
      s"""${matvec(s"x2_${r - 1}$sfx", s"y2_$r$sfx")},
         |p2_$r$sfx AS (SELECT sum(v1.x * y.y) AS p FROM y2_$r$sfx y
         |  JOIN x1_8$sfx v1 ON v1.i = y.i),
         |d2_$r$sfx AS (SELECT y.i, y.y - p * v1.x AS y FROM y2_$r$sfx y
         |  JOIN x1_8$sfx v1 ON v1.i = y.i CROSS JOIN p2_$r$sfx),
         |n2_$r$sfx AS (SELECT sqrt(sum(y * y)) AS nrm FROM d2_$r$sfx),
         |x2_$r$sfx AS MATERIALIZED (SELECT i,
         |    round(y / nrm * 1000000000.0) / 1000000000.0 AS x
         |  FROM d2_$r$sfx CROSS JOIN n2_$r$sfx)""".stripMargin
    }.mkString(",\n")
    s"""tk$sfx AS (SELECT doc_id, string_split(text, ' ') AS t
       |  FROM documents WHERE $pred),
       |px$sfx AS MATERIALIZED (SELECT doc_id, t, e.p AS pos, e.w AS w
       |  FROM (SELECT doc_id, t, unnest([{'p': i - 1, 'w': t[i]}
       |    for i in range(1, len(t) + 1)]) AS e FROM tk$sfx)),
       |vc$sfx AS MATERIALIZED (SELECT w,
       |    row_number() OVER (ORDER BY cnt DESC, w) - 1 AS idx
       |  FROM (SELECT w, count(*) AS cnt FROM px$sfx GROUP BY w
       |        ORDER BY cnt DESC, w LIMIT 30)),
       |pp$sfx AS (SELECT px$sfx.w, px$sfx.t[px$sfx.pos + o.off + 1] AS c
       |  FROM px$sfx CROSS JOIN (SELECT unnest([-2, -1, 1, 2]) AS off) o
       |  WHERE px$sfx.pos + o.off >= 0
       |    AND px$sfx.pos + o.off < len(px$sfx.t)),
       |pr$sfx AS MATERIALIZED (SELECT a.idx AS i, b.idx AS j,
       |    count(*) AS n
       |  FROM pp$sfx JOIN vc$sfx a ON a.w = pp$sfx.w
       |  JOIN vc$sfx b ON b.w = pp$sfx.c
       |  GROUP BY 1, 2),
       |nt$sfx AS (SELECT CAST(sum(n) AS DOUBLE) AS nt FROM pr$sfx),
       |rs$sfx AS (SELECT i, CAST(sum(n) AS DOUBLE) AS r FROM pr$sfx
       |  GROUP BY i),
       |mm$sfx AS MATERIALIZED (SELECT pr$sfx.i, pr$sfx.j,
       |    CASE WHEN round(ln(CAST(n AS DOUBLE) * nt
       |        / (ri.r * rj.r)) * 1000000.0) / 1000000.0 > 0
       |      THEN round(ln(CAST(n AS DOUBLE) * nt
       |        / (ri.r * rj.r)) * 1000000.0) / 1000000.0
       |      ELSE 0.0 END AS pm
       |  FROM pr$sfx JOIN rs$sfx ri ON ri.i = pr$sfx.i
       |  JOIN rs$sfx rj ON rj.i = pr$sfx.j CROSS JOIN nt$sfx),
       |vv$sfx AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vc$sfx),
       |x1_0$sfx AS (SELECT idx AS i,
       |    round(1.0 / sqrt(v) * 1000000000.0) / 1000000000.0 AS x
       |  FROM vc$sfx CROSS JOIN vv$sfx),
       |x2_0$sfx AS (SELECT idx AS i,
       |    round((CASE WHEN idx % 2 = 0 THEN 1.0 ELSE -1.0 END)
       |      / sqrt(v) * 1000000000.0) / 1000000000.0 AS x
       |  FROM vc$sfx CROSS JOIN vv$sfx),
       |$r1,
       |$r2,
       |${matvec(s"x1_8$sfx", s"my1$sfx")},
       |l1$sfx AS (SELECT round(sum(v.x * y.y) / sum(v.x * v.x)
       |    * 1000000.0) / 1000000.0 AS l
       |  FROM x1_8$sfx v JOIN my1$sfx y ON y.i = v.i),
       |${matvec(s"x2_8$sfx", s"my2$sfx")},
       |l2$sfx AS (SELECT round(sum(v.x * y.y) / sum(v.x * v.x)
       |    * 1000000.0) / 1000000.0 AS l
       |  FROM x2_8$sfx v JOIN my2$sfx y ON y.i = v.i)""".stripMargin
  }

  private def logregCtes(iters: Int, lr: String = "0.25"): String =
    s"""$featureCtes,
       |${logregRounds(iters, lr)}""".stripMargin

  /** DuckDB replica of [[graft.operators.Pca]]: quantized upper-triangle
    * moment sums (HUGEINT — exact, matching the engine's decimal(38,0)),
    * the covariance composed with the same divisions in the same order,
    * then `k` power-iteration chains (recursive CTE per component, `iters`
    * matvec + modified-Gram-Schmidt + normalize rounds from the
    * (1,2,…,d) start, orthogonalizing against the already-materialized
    * v1..v{r-1} inside every round) with the Rayleigh quotient λ = v'Cv
    * on the original covariance — all IEEE +,×,/,sqrt in the engine's
    * fold order, so every quantity is bit-identical. Leaves in scope:
    * `cov` (i, j, c upper triangle), `mu` (means list), `qid` (vec_id,
    * quantized vector), and per component r: `v$r` (vector), `l$r` (λ).
    * `k = 0` emits only the moment/cov/mu CTEs — the covariance-only
    * q160 oracle, with no dead power-iteration SQL. */
  private def pcaCtes(d: Int = 64, k: Int = 4, iters: Int = 40): String = {
    val rng = s"range(0, $d)"
    val comps = (1 to k).map { r =>
      // previous directions come in via CROSS JOINed aliases w1..w{r-1};
      // each modified-GS step is two layered derived tables (the dot,
      // then the subtraction) so the dot is computed on the ALREADY
      // partially-orthogonalized vector, exactly like the engine loop
      val wjoins = (1 until r)
        .map(l => s"CROSS JOIN (SELECT v AS w$l FROM v$l) a$l").mkString(" ")
      val wcols = (1 until r).map(l => s", w$l").mkString
      var inner =
        s"""SELECT it,
           |      [list_reduce([m[i+1][j+1] * v[j+1] for j in $rng], (a,b) -> a + b) for i in $rng] AS g0$wcols
           |    FROM e$r CROSS JOIN cm1 $wjoins WHERE it < $iters""".stripMargin
      for (l <- 1 until r) {
        val carry = (l + 1 until r).map(x => s", w$x").mkString
        inner =
          s"""SELECT it, [g${l - 1}[i+1] - d$l * w$l[i+1] for i in $rng] AS g$l$carry
             |    FROM (SELECT it, g${l - 1}, w$l$carry,
             |      list_reduce([g${l - 1}[i+1] * w$l[i+1] for i in $rng], (a,b) -> a + b) AS d$l
             |    FROM ($inner))""".stripMargin
      }
      s"""e$r AS (
         |  SELECT 0 AS it, [CAST(i + 1 AS DOUBLE) for i in $rng] AS v
         |  UNION ALL
         |  SELECT it + 1,
         |    [u / sqrt(list_reduce(list_transform(g${r - 1}, t -> t*t), (a,b) -> a + b)) for u in g${r - 1}]
         |  FROM ($inner)
         |),
         |v$r AS MATERIALIZED (SELECT v FROM e$r WHERE it = $iters),
         |l$r AS MATERIALIZED (SELECT list_reduce(flatten(
         |    [[v[i+1] * m[i+1][j+1] * v[j+1] for j in $rng] for i in $rng]), (a,b) -> a + b) AS l
         |  FROM v$r CROSS JOIN cm1)""".stripMargin
    }.mkString(",\n")
    s"""qid AS MATERIALIZED (SELECT vec_id,
       |    [CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT) for x in embedding] AS q
       |  FROM embeddings),
       |mom AS MATERIALIZED (SELECT i, j, sum(pp) AS spp, sum(x) AS sx, count(*) AS n FROM (
       |    SELECT unnest(flatten([[{'i': i, 'j': j, 'pp': q[i+1] * q[j+1],
       |        'x': CASE WHEN i = j THEN q[i+1] ELSE CAST(0 AS BIGINT) END}
       |      for j in range(i, $d)] for i in range(0, $d)]), recursive := true) FROM qid)
       |  GROUP BY i, j),
       |cov AS MATERIALIZED (SELECT m.i, m.j,
       |    (CAST(m.spp AS DOUBLE)/100000000.0)/m.n
       |      - ((CAST(di.sx AS DOUBLE)/10000.0)/m.n)*((CAST(dj.sx AS DOUBLE)/10000.0)/m.n) AS c
       |  FROM mom m JOIN (SELECT i, sx FROM mom WHERE i = j) di ON di.i = m.i
       |             JOIN (SELECT i, sx FROM mom WHERE i = j) dj ON dj.i = m.j)${
      if (k == 0) "" else s""",
       |covf AS (SELECT i, j, c FROM cov
       |  UNION ALL SELECT j AS i, i AS j, c FROM cov WHERE i <> j),
       |cm1 AS MATERIALIZED (SELECT list(l ORDER BY i) AS m FROM (
       |  SELECT i, list(c ORDER BY j) AS l FROM covf GROUP BY i)),
       |mu AS MATERIALIZED (SELECT list((CAST(sx AS DOUBLE)/10000.0)/n ORDER BY i) AS mu
       |  FROM mom WHERE i = j),
       |$comps"""}""".stripMargin
  }

  /** DuckDB replica of [[graft.operators.Clustering
    * .kMeansParallelCandidates]]: the quantized view, `rounds` unrolled
    * D²-sampling rounds (min-distance fold in the kernel's order, φ as
    * an exact HUGEINT sum matching the engine's decimal(38,0), the
    * md5₆₀ mod 2²⁰ draw with the identical double composition of the
    * keep predicate), candidate ordering (round, vid), exact integer
    * weights under the same (d, ord) argmin tie, and the k greedy
    * weighted-farthest-point picks unrolled with the same
    * (w·minD² desc, vid) order. */
  private def kmeansParallelOracle(k: Int, ell: Int, rounds: Int,
      dims: Int): String = {
    val thresh = s"${(ell.toLong * 1048576L)}.0"
    def fold(a: String, b: String) =
      s"""list_reduce(list_transform(
         |      [CAST($a.q[i+1] AS DOUBLE) - CAST($b.q[i+1] AS DOUBLE) for i in range(0,$dims)],
         |      v -> v*v), (x,y) -> x+y)""".stripMargin
    val perRound = (1 to rounds).map { r =>
      s"""dr$r AS (SELECT vid, min(dd) AS d FROM (
         |    SELECT e.vid, ${fold("e", "c")} AS dd
         |    FROM e CROSS JOIN call${r - 1} c) GROUP BY vid),
         |ph$r AS (SELECT sum(CAST(d AS HUGEINT)) AS phi FROM dr$r),
         |sm$r AS (SELECT vid FROM dr$r CROSS JOIN ph$r
         |  WHERE CAST(CAST(('0x' || substr(md5('kmp:$r:' || CAST(vid AS VARCHAR)), 1, 15)) AS BIGINT) % 1048576 AS DOUBLE)
         |        * CAST(phi AS DOUBLE) < $thresh * d),
         |call$r AS (SELECT * FROM call${r - 1} UNION ALL
         |  SELECT $r AS rnd, e.vid, e.q FROM e JOIN sm$r USING (vid))""".stripMargin
    }.mkString(",\n")
    val picks = (1 until k).map { i =>
      s"""g$i AS (SELECT ord, vid, q, w FROM (
         |    SELECT c.ord, c.vid, c.q, c.w, min(${fold("c", "g")}) AS md
         |    FROM wt c CROSS JOIN ga${i - 1} g
         |    WHERE c.ord NOT IN (SELECT ord FROM ga${i - 1})
         |    GROUP BY c.ord, c.vid, c.q, c.w)
         |  ORDER BY CAST(w AS DOUBLE) * md DESC, vid LIMIT 1),
         |ga$i AS (SELECT * FROM ga${i - 1} UNION ALL
         |  SELECT $i AS seed_rank, ord, vid, q, w FROM g$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id AS vid,
       |    [CAST(round(CAST(x AS DOUBLE)*10000.0) AS BIGINT) for x in embedding] AS q
       |  FROM embeddings),
       |call0 AS (SELECT 0 AS rnd, vid, q FROM (SELECT vid, q FROM e ORDER BY vid LIMIT 1)),
       |$perRound,
       |cw AS MATERIALIZED (SELECT row_number() OVER (ORDER BY rnd, vid) - 1 AS ord, rnd, vid, q
       |  FROM call$rounds),
       |asg AS (SELECT vid, ord FROM (
       |    SELECT t.vid, t.ord, row_number() OVER (PARTITION BY t.vid ORDER BY t.dd, t.ord) AS rn
       |    FROM (SELECT e.vid AS vid, c.ord AS ord, ${fold("e", "c")} AS dd
       |          FROM e CROSS JOIN cw c) t)
       |  WHERE rn = 1),
       |wt AS MATERIALIZED (SELECT c.ord, c.rnd, c.vid, c.q, coalesce(a.w, 0) AS w
       |  FROM cw c LEFT JOIN (SELECT ord, count(*) AS w FROM asg GROUP BY ord) a USING (ord)),
       |g0 AS (SELECT ord, vid, q, w FROM wt ORDER BY w DESC, vid LIMIT 1),
       |ga0 AS (SELECT 0 AS seed_rank, ord, vid, q, w FROM g0),
       |$picks
       |SELECT w.vid AS vec_id, CAST(w.rnd AS BIGINT) AS round,
       |  CAST(w.w AS BIGINT) AS weight,
       |  CAST(coalesce(g.seed_rank, -1) AS BIGINT) AS seed_rank
       |FROM wt w LEFT JOIN ga${k - 1} g ON g.ord = w.ord
       |ORDER BY vec_id""".stripMargin
  }

  /** The engine-side twin of [[logregCtes]]'s label + training slice. */
  private def logregModel(docs: org.apache.spark.sql.DataFrame,
      iters: Int = 3): Array[Double] =
    graft.operators.QualityClassifier.train(
      docs.where(col("doc_id") % 3 === 0).withColumn("y",
        (graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.9)
          .cast("long")),
      iters = iters, lr = 0.25)

  /** The k-means CTE chain up to `sfin` (vid, cid, d) — shared by q129
    * (which presents the assignment), q132 (which dedups within the
    * assigned clusters) and q133 (which runs it on a gated survivor
    * subset via `src`). */
  private def kmeansCtes(k: Int, iters: Int, dims: Int,
      src: String = "embeddings", seedCtes: Option[String] = None,
      sfx: String = ""): String = {
    // sfx suffixes every CTE name (e$sfx, sfin$sfx, cent$n$sfx, ...) so
    // several independent chains — the PQ oracle's m subspace fits plus
    // its coarse quantizer — coexist in ONE WITH clause. Caller-supplied
    // seed CTEs embed unsuffixed names, so the combination is rejected.
    require(sfx.isEmpty || seedCtes.isEmpty,
      "sfx and custom seedCtes cannot combine")
    def assign(n: String, cent: String) =
      s"""a$n$sfx AS (SELECT e$sfx.vid, c.cid,
         |    list_reduce(list_transform(
         |      [CAST(e$sfx.q[i+1] AS DOUBLE) - c.cl[i+1] for i in range(0,$dims)], v -> v*v),
         |      (x,y) -> x+y) AS d
         |  FROM e$sfx CROSS JOIN $cent c),
         |s$n$sfx AS (SELECT vid, cid, d FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY d, cid) AS rn FROM a$n$sfx)
         |  WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { n =>
      s"""${assign(n.toString, s"cent${n - 1}$sfx")},
         |u$n$sfx AS (SELECT cid,
         |    list_reduce(list(q ORDER BY vid), (a,b) -> [a[i+1]+b[i+1] for i in range(0,$dims)]) AS sl,
         |    count(*) AS c
         |  FROM s$n$sfx JOIN e$sfx USING (vid) GROUP BY cid),
         |cent$n$sfx AS (SELECT cid, [CAST(x AS DOUBLE)/CAST(c AS DOUBLE) for x in sl] AS cl FROM u$n$sfx
         |  UNION ALL
         |  SELECT p.cid, p.cl FROM cent${n - 1}$sfx p
         |  WHERE p.cid NOT IN (SELECT cid FROM u$n$sfx))""".stripMargin
    }.mkString(",\n")
    val seeds = seedCtes.getOrElse(
      s"""c0$sfx AS (SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS cid, q
         |       FROM (SELECT vid, q FROM e$sfx ORDER BY vid LIMIT $k)),
         |cent0$sfx AS (SELECT cid, [CAST(x AS DOUBLE) for x in q] AS cl FROM c0$sfx)""".stripMargin)
    s"""e$sfx AS MATERIALIZED (SELECT vec_id AS vid,
       |    [CAST(round(CAST(x AS DOUBLE)*10000.0) AS BIGINT) for x in embedding] AS q
       |  FROM $src),
       |$seeds,
       |$rounds,
       |${assign("fin", s"cent$iters$sfx")}""".stripMargin
  }

  /** Greedy farthest-point seeding as CTEs ending in `cent0` — one
    * unrolled round per seed: distances to the chosen set (same fold as
    * the assignment CTEs), min per vid, argmax by (d DESC, vid). Replays
    * [[graft.operators.Clustering.kMeansAssignFarthest]]'s seeding
    * exactly. */
  private def farthestSeedCtes(k: Int, dims: Int): String = {
    require(k >= 2, s"farthest seeding CTEs need k >= 2, got $k")
    val rounds = (1 until k).map { j =>
      s"""fa$j AS (SELECT e.vid, c.cid,
         |    list_reduce(list_transform(
         |      [CAST(e.q[i+1] AS DOUBLE) - c.cl[i+1] for i in range(0,$dims)], v -> v*v),
         |      (x,y) -> x+y) AS d
         |  FROM e CROSS JOIN fc$j c),
         |fm$j AS (SELECT vid, min(d) AS d FROM fa$j GROUP BY vid),
         |fn$j AS (SELECT e.q FROM fm$j JOIN e USING (vid)
         |         ORDER BY fm$j.d DESC, vid LIMIT 1),
         |fc${j + 1} AS (SELECT cid, cl FROM fc$j UNION ALL
         |  SELECT CAST($j AS BIGINT) AS cid,
         |         [CAST(x AS DOUBLE) for x in q] AS cl FROM fn$j)""".stripMargin
    }.mkString(",\n")
    s"""f1 AS (SELECT vid, q FROM e ORDER BY vid LIMIT 1),
       |fc1 AS (SELECT CAST(0 AS BIGINT) AS cid,
       |        [CAST(x AS DOUBLE) for x in q] AS cl FROM f1),
       |$rounds,
       |cent0 AS (SELECT cid, cl FROM fc$k)""".stripMargin
  }

  private def kmeansOracle(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${kmeansCtes(k, iters, dims)}
       |SELECT vid AS vec_id, cid AS cluster, round(d, 4) AS dist FROM sfin
       |ORDER BY vec_id""".stripMargin

  /** q140: the kmeans chain, with BOTH assignment ranks (1 = cluster,
    * 2 = runner-up) taken from the final all-distances relation `afin`
    * under the same (d, cid) order the engine's two-min kernel scan
    * implements, then the positive/negative candidate joins with the
    * q132 rounded-cosine contract. */
  private def hardNegativesOracle(k: Int, iters: Int, dims: Int,
      nNeg: Int): String =
    s"""WITH ${kmeansCtes(k, iters, dims)},
       |asg AS MATERIALIZED (SELECT vid, cid,
       |          row_number() OVER (PARTITION BY vid ORDER BY d, cid) AS rn
       |        FROM afin),
       |av AS MATERIALIZED (SELECT e2.vec_id AS did, e2.embedding::DOUBLE[] AS v,
       |          a1.cid AS cluster, a2.cid AS cluster2
       |       FROM embeddings e2
       |       JOIN asg a1 ON a1.vid = e2.vec_id AND a1.rn = 1
       |       JOIN asg a2 ON a2.vid = e2.vec_id AND a2.rn = 2),
       |pos AS (SELECT a.did AS vid, b.did AS other_id,
       |          round(list_cosine_similarity(a.v, b.v) * 1000000.0)
       |            / 1000000.0 AS cos
       |        FROM av a JOIN av b ON a.cluster = b.cluster AND a.did <> b.did),
       |neg AS (SELECT a.did AS vid, b.did AS other_id,
       |          round(list_cosine_similarity(a.v, b.v) * 1000000.0)
       |            / 1000000.0 AS cos
       |        FROM av a JOIN av b ON a.cluster2 = b.cluster),
       |rp AS (SELECT vid, 'pos' AS kind,
       |         row_number() OVER (PARTITION BY vid ORDER BY cos DESC, other_id) AS rnk,
       |         other_id, cos FROM pos),
       |rg AS (SELECT vid, 'neg' AS kind,
       |         row_number() OVER (PARTITION BY vid ORDER BY cos DESC, other_id) AS rnk,
       |         other_id, cos FROM neg)
       |SELECT vid AS vec_id, kind, CAST(rnk AS INT) AS rnk, other_id, cos
       |FROM (SELECT * FROM rp WHERE rnk <= 1
       |      UNION ALL SELECT * FROM rg WHERE rnk <= $nNeg)
       |ORDER BY vec_id, kind, rnk""".stripMargin

  /** q132: the kmeans chain, then q101's exact-cosine + recursive-CC
    * tail scoped to pairs sharing a k-means cluster. */
  private def semdedupClusteredOracle(k: Int, iters: Int, dims: Int,
      threshold: Double): String =
    s"""WITH RECURSIVE ${kmeansCtes(k, iters, dims)},
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT a.vid AS ia, b.vid AS ib
       |      FROM sfin a JOIN sfin b ON a.cid = b.cid AND a.vid < b.vid
       |      JOIN ev va ON va.vec_id = a.vid
       |      JOIN ev vb ON vb.vec_id = b.vid
       |      WHERE round(list_cosine_similarity(va.v, vb.v) * 1000000.0)
       |            / 1000000.0 >= $threshold),
       |edges AS (SELECT ia AS u, ib AS v FROM p UNION SELECT ib, ia FROM p),
       |reach AS (SELECT u AS src, u AS dst FROM edges
       |          UNION
       |          SELECT r.src, e2.v FROM reach r JOIN edges e2 ON r.dst = e2.u),
       |lab AS (SELECT src AS vec_id, min(dst) AS cluster
       |        FROM reach GROUP BY src)
       |SELECT vec_id FROM embeddings
       |WHERE vec_id NOT IN (SELECT vec_id FROM lab WHERE vec_id <> cluster)
       |ORDER BY vec_id""".stripMargin
}
