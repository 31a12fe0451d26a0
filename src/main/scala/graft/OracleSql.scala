package graft

/** DuckDB oracle SQL for the extended operator families (text analysis,
  * dedup, similarity, events, generalized relational). Each statement is
  * the ANSI twin of one SparkEntry.queries entry — identical output column
  * names, identical deterministic ordering, and engine-reproducible
  * arithmetic only (integer math, exact decimals surfaced as doubles,
  * cosine rounded to 1e-6).
  */
object OracleSql {

  /** Whitespace tokens of (trimmed, optionally lowered) text, [] if empty —
    * twin of TextOps.tokens.
    */
  private def toksSql(expr: String): String =
    s"CASE WHEN length(trim($expr)) = 0 THEN []::VARCHAR[] " +
      s"ELSE string_split_regex(trim($expr), '\\s+') END"

  private val lexValues = ops.TextOps.lexicon
    .map { case (l, w) => s"('$l','$w')" }.mkString(", ")

  /** The corpus staging dir the gate's DuckDB re-count reads — GENERATED
    * from the same `Sinks.namespaced` helper `CorpusPipeline.stageDir`
    * uses (over the canonical gate dataset dir and the DEFAULT staging
    * root), so the engine's write path and the oracle's read path cannot
    * drift. Still deliberately coupled to the gate's pinned SF and root:
    * a gate run from another path fails LOUD (absent path), never a
    * silent false pass.
    */
  private val corpusStageDir = graft.sources.Sinks.namespaced(
    "/tmp/graft_corpus_stages/sf0.01", "/root/testdata/sf0.01")

  /** [[corpusStageDir]]'s embedding-pipeline sibling (EmbPipeline). */
  private val embStageDir = graft.sources.Sinks.namespaced(
    "/tmp/graft_emb_stages/sf0.01", "/root/testdata/sf0.01")

  /** Shared CTE chain producing `jpairs` — exact 3-gram Jaccard ≥ 60%
    * pairs over `documents` with the df∈[2,1000] skew guard; the twin of
    * `DedupOps.ngramJaccardPairsFrom`. Used by the ngram oracle and both
    * cluster oracles.
    */
  /** Shared CTE chain producing `cand` — banded-SimHash candidate pairs
    * (doc_a < doc_b, hamming distance) over `documents`; the twin of
    * `DedupOps.simhashPairs` up to the hamming filter. Used by the
    * simhash-pairs oracle and the recursive-reachability oracle.
    */
  private def simhashPairsCtes: String = {
    val tokBase = "(SELECT doc_id, unnest(" + toksSql("lower(text)") +
      ") AS tok FROM documents)"
    s"""${Xxh64Sql.chain(tokBase, "tok", 2, "th")},
       |votes AS (
       |  SELECT doc_id, i.range AS i,
       |         sum(CASE WHEN (th_u // power(2, i.range)::HUGEINT) % 2 = 1
       |             THEN 1 ELSE -1 END) AS v
       |  FROM th CROSS JOIN range(64) i GROUP BY 1, 2),
       |sim AS (
       |  SELECT doc_id,
       |         sum(CASE WHEN v > 0 THEN power(2, i)::HUGEINT
       |             ELSE 0::HUGEINT END) AS u
       |  FROM votes GROUP BY 1),
       |fp AS (
       |  SELECT d.doc_id, COALESCE(s.u, 0::HUGEINT) AS u,
       |         COALESCE(CASE WHEN s.u >= 9223372036854775808
       |                       THEN CAST(s.u - 18446744073709551616 AS BIGINT)
       |                       ELSE CAST(s.u AS BIGINT) END, 0) AS fphash
       |  FROM documents d LEFT JOIN sim s ON d.doc_id = s.doc_id),
       |banded AS (
       |  SELECT doc_id, fphash, b.range AS band,
       |         (u // power(2, 16*b.range)::HUGEINT) % 65536 AS chunk
       |  FROM fp CROSS JOIN range(4) b),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |         CAST(bit_count(xor(x.fphash, y.fphash)) AS INTEGER) AS hamming
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.chunk = y.chunk
       |  WHERE x.doc_id < y.doc_id)""".stripMargin
  }

  /** Shared candidate chain (toks → distinct shingles → df∈[2,1000]
    * inverted-index pairs with per-doc sizes) behind both the Jaccard and
    * the containment pair oracles; `rawpairs`/`sizes` are the last CTEs.
    */
  private def ngramBaseCtes: String =
    s"""toks AS (
       |  SELECT doc_id, ${toksSql("lower(text)")} AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      generate_series(1, len(t) - 2),
       |      i -> array_to_string(t[i:i+2], ' '))) AS shingle
       |    FROM toks WHERE len(t) >= 3)),
       |pairforming AS (
       |  SELECT shingle FROM sh GROUP BY shingle
       |  HAVING count(*) BETWEEN 2 AND 1000),
       |idx AS (
       |  SELECT * FROM sh
       |  WHERE shingle IN (SELECT shingle FROM pairforming)),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
       |rawpairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM idx a JOIN idx b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  private def ngramPairsCtes: String =
    s"""$ngramBaseCtes,
       |jpairs AS (
       |  SELECT doc_a, doc_b, shared, sa.n_sh AS size_a, sb.n_sh AS size_b
       |  FROM rawpairs
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE shared * 100 >= 60 * (sa.n_sh + sb.n_sh - shared))""".stripMargin

  /** Token n-grams of `t` as a list, [] when the doc is shorter than n —
    * twin of CorpusOps.grams.
    */
  private def gramsSql(n: Int): String =
    s"CASE WHEN len(t) >= $n THEN list_transform(" +
      s"generate_series(1, len(t) - ${n - 1}), " +
      s"i -> array_to_string(t[i:i+${n - 1}], ' ')) ELSE []::VARCHAR[] END"

  /** Shared CTE chain producing `sig` — (media_id, uh HUGEINT, phash
    * BIGINT) perceptual hashes of the image-kind media rows; the twin of
    * `Multimodal.imagePhash` over the text-bytes fixture payloads.
    */
  private val phashSigCtes: String =
    """hx AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS h,
      |         octet_length(encode(text)) AS n
      |  FROM documents WHERE doc_id % 3 = 0),
      |byteval AS (
      |  SELECT media_id, unnest(list_transform(range(1, n+1), i ->
      |    {'pos': i,
      |     'b': (strpos('123456789ABCDEF', substr(h, 2*i-1, 1))) * 16
      |        + (strpos('123456789ABCDEF', substr(h, 2*i, 1)))})) AS x
      |  FROM hx),
      |cells AS (
      |  SELECT media_id, CAST((x.pos - 1) % 64 AS INT) AS cell,
      |         CAST(sum(x.b) AS BIGINT) AS v
      |  FROM byteval GROUP BY 1, 2),
      |tot AS (SELECT media_id, sum(v) AS t FROM cells GROUP BY 1),
      |bits AS (
      |  SELECT cells.media_id,
      |         sum(CASE WHEN v * 64 > t
      |             THEN CAST(1 AS HUGEINT) << cell
      |             ELSE CAST(0 AS HUGEINT) END) AS uh
      |  FROM cells JOIN tot ON cells.media_id = tot.media_id GROUP BY 1),
      |sig AS (
      |  SELECT media_id, uh,
      |         CAST(CASE WHEN uh >= (CAST(1 AS HUGEINT) << 63)
      |              THEN uh - (CAST(1 AS HUGEINT) << 64) ELSE uh END
      |           AS BIGINT) AS phash
      |  FROM bits)""".stripMargin

  /** [[phashSigCtes]] extended to `jpairs` — verified Hamming ≤ 3 image
    * pairs via the 4×16-bit banding; twin of `Multimodal.phashPairs`.
    */
  private val phashPairsCtes: String =
    s"""$phashSigCtes,
       |banded AS (
       |  SELECT media_id, phash, b.band AS band,
       |         CAST((uh >> (b.band * 16)) & 65535 AS INT) AS chunk
       |  FROM sig, (SELECT unnest(range(4)) AS band) b),
       |jpairs AS (
       |  SELECT media_a, media_b, CAST(hamming AS INT) AS hamming FROM (
       |    SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
       |           bit_count(xor(x.phash, y.phash)) AS hamming
       |    FROM banded x JOIN banded y
       |      ON x.band = y.band AND x.chunk = y.chunk
       |    WHERE x.media_id < y.media_id) p
       |  WHERE hamming <= 3)""".stripMargin

  private def decontaminateSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${toksSql("lower(text)")} AS t FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(list_distinct(${gramsSql(5)})) AS gram
       |  FROM toks),
       |evalg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
       |traing AS (SELECT doc_id, gram FROM g WHERE doc_id % 20 <> 0)
       |SELECT doc_id, count(*) AS n_shared
       |FROM traing JOIN evalg USING (gram)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  val extended: Map[String, String] = Map(

    // ----------------------------------------------------- round 3 ops

    // Relational.mergeOrders twin: MERGE = updates ∪ (base ∖ matched keys).
    "r_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |         o_totalprice + 100.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 1)
        |SELECT * FROM upd
        |UNION ALL
        |SELECT * FROM base
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |ORDER BY o_orderkey""".stripMargin,

    // TextOps.lengthQuantiles twin: same integer rank rule as
    // ev_value_quantiles, over the bounded n_chars domain.
    "txt_length_quantiles" ->
      """WITH r AS (
        |  SELECT lang, CAST(n_chars AS DOUBLE) AS len,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS cnt
        |  FROM documents)
        |SELECT lang,
        |  max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100) THEN len END) AS len_p50,
        |  max(CASE WHEN rn = GREATEST(1, (90 * cnt + 99) // 100) THEN len END) AS len_p90,
        |  max(CASE WHEN rn = GREATEST(1, (99 * cnt + 99) // 100) THEN len END) AS len_p99
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    // Relational.incrementalJoinOrders twin: the FULL recompute — the
    // maintained join must equal it exactly (delta-term coverage proof).
    "r_incremental_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Relational.eventKeySkew twin: integer-exact ppm share and heavy
    // flag (n·keys > 2·total), deterministic top-10 (count desc, key).
    "r_skew_profile" ->
      """WITH c AS (
        |  SELECT user_id AS key, count(*) AS n_rows
        |  FROM events GROUP BY 1),
        |s AS (
        |  SELECT CAST(sum(n_rows) AS BIGINT) AS total,
        |         count(*) AS n_keys FROM c)
        |SELECT key, n_rows, n_rows * 1000000 // total AS share_ppm,
        |       n_rows * n_keys > 2 * total AS is_heavy
        |FROM c, s
        |ORDER BY n_rows DESC, key LIMIT 10""".stripMargin,

    // Relational.orderDiff twin: rebuild the merged revision (minus the
    // deleted slice), FULL OUTER JOIN on the key, classify null-safely.
    "r_table_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |         o_totalprice + 100.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 1),
        |revised AS (
        |  SELECT * FROM (
        |    SELECT * FROM upd
        |    UNION ALL
        |    SELECT * FROM base
        |    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd))
        |  WHERE o_orderkey % 7 <> 3),
        |j AS (
        |  SELECT coalesce(b.o_orderkey, r.o_orderkey) AS k,
        |    b.o_orderkey IS NOT NULL AS in_b,
        |    r.o_orderkey IS NOT NULL AS in_r,
        |    (b.o_custkey IS DISTINCT FROM r.o_custkey OR
        |     b.o_orderstatus IS DISTINCT FROM r.o_orderstatus OR
        |     b.o_totalprice IS DISTINCT FROM r.o_totalprice) AS chg
        |  FROM base b FULL OUTER JOIN revised r
        |    ON b.o_orderkey = r.o_orderkey)
        |SELECT CASE WHEN NOT in_b THEN 'insert'
        |            WHEN NOT in_r THEN 'delete'
        |            WHEN chg THEN 'update' ELSE 'same' END AS change_type,
        |  count(*) AS n_rows, CAST(sum(k) AS BIGINT) AS key_sum
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // SimilarityOps.bruteForceTopKInt8 twin: identical quantization
    // arithmetic (max/127 scale, floor(x/scale + 0.5)) — the integer dot
    // products are exact on both engines, floats only in scale and the
    // final cosine ratio (mirrored op-for-op).
    "emb_topk_int8" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings),
        |qz AS (
        |  SELECT vec_id,
        |    CASE WHEN scale = 0
        |      THEN list_transform(emb, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(emb,
        |        x -> CAST(floor(x / scale + 0.5) AS BIGINT)) END AS qv
        |  FROM n),
        |nn AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS norm2
        |  FROM qz),
        |q AS (
        |  SELECT vec_id AS query_id, qv AS q_qv, norm2 AS q_norm2
        |  FROM nn WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, c.vec_id,
        |    round(CAST(list_sum(list_transform(range(1, len(q.q_qv) + 1),
        |        i -> q.q_qv[i] * c.qv[i])) AS DOUBLE)
        |      / (sqrt(CAST(q.q_norm2 AS DOUBLE))
        |         * sqrt(CAST(c.norm2 AS DOUBLE))), 6) AS cosine_sim
        |  FROM q CROSS JOIN nn c
        |  WHERE c.vec_id <> q.query_id AND c.norm2 > 0 AND q.q_norm2 > 0),
        |r AS (
        |  SELECT query_id, vec_id, cosine_sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine_sim DESC, vec_id) AS rnk
        |  FROM scored)
        |SELECT query_id, CAST(rnk AS BIGINT) AS rank,
        |       vec_id AS neighbor_id, cosine_sim
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    // TextOps.qualityGate twin: keep iff rank·100 ≤ n·keepPct (floor).
    "txt_quality_gate" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |        AS DOUBLE)
        |      / greatest(length(text), 1) AS alpha_ratio
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, alpha_ratio,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY alpha_ratio DESC, doc_id) AS q_rank,
        |    count(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM scored)
        |SELECT doc_id, lang, alpha_ratio, CAST(q_rank AS BIGINT) AS q_rank
        |FROM r WHERE q_rank * 100 <= n_lang * 60
        |ORDER BY doc_id""".stripMargin,

    // TextOps.mixtureSample twin: τ=0.5 budgets, all-integer thresholds
    // (w = floor(sqrt(n)·1e6); IEEE sqrt is correctly rounded, so both
    // engines compute the identical BIGINT), md5 bucket % 10000.
    "txt_mixture_sample" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_lang,
        |    CAST(floor(sqrt(count(*)) * 1e6) AS BIGINT) AS w
        |  FROM documents GROUP BY lang),
        |th AS (
        |  SELECT lang,
        |    CAST(least(10000, (10000 * 250 * w)
        |      // ((SELECT sum(w) FROM c) * n_lang)) AS BIGINT) AS thresh
        |  FROM c),
        |b AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 10000
        |      AS bucket
        |  FROM documents)
        |SELECT doc_id, b.lang, bucket
        |FROM b JOIN th USING (lang)
        |WHERE bucket < thresh
        |ORDER BY doc_id""".stripMargin,

    // EventOps.incrementalHourly twin: the FULL recompute — equality with
    // the engine's partial-merge result is the correctness statement.
    "ev_incremental_agg" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Relational.constraintAudit twin. NOT EXISTS (not NOT IN) so the
    // orphan check matches anti-join null semantics.
    "r_constraint_audit" ->
      """WITH nulls AS (
        |  SELECT count(*) AS n_rows,
        |    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS null_key,
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
        |    sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
        |        THEN 1 ELSE 0 END) AS nonpositive_price,
        |    count(*) - count(DISTINCT o_orderkey) AS dup_keys
        |  FROM orders),
        |orph AS (
        |  SELECT count(*) AS fk_orphans FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                    WHERE c.c_custkey = o.o_custkey))
        |SELECT 'dup_keys' AS check_name,
        |       CAST(dup_keys AS BIGINT) AS n_violations FROM nulls
        |UNION ALL SELECT 'fk_orphans', CAST(fk_orphans AS BIGINT) FROM orph
        |UNION ALL SELECT 'nonpositive_price',
        |       CAST(nonpositive_price AS BIGINT) FROM nulls
        |UNION ALL SELECT 'null_cust', CAST(null_cust AS BIGINT) FROM nulls
        |UNION ALL SELECT 'null_key', CAST(null_key AS BIGINT) FROM nulls
        |ORDER BY check_name""".stripMargin,

    // Relational.scd2 twin: one window, lead() closes each version.
    "r_scd2" ->
      """SELECT o_custkey AS key,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
        |  o_orderstatus AS status,
        |  CAST(o_orderdate AS TIMESTAMP) AS valid_from,
        |  CAST(lead(o_orderdate) OVER w AS TIMESTAMP) AS valid_to,
        |  (lead(o_orderdate) OVER w IS NULL) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)
        |ORDER BY key, version""".stripMargin,

    // Relational.tableStats twin: exact per-column profile.
    "r_table_stats" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val aggs = cols.map(c =>
        s"""sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS null_$c,
           |    count(DISTINCT $c) AS ndv_$c""".stripMargin).mkString(",\n    ")
      val rows = cols.map(c =>
        s"""SELECT '$c' AS "column", CAST(n_rows AS BIGINT) AS n_rows,
           |  CAST(null_$c AS BIGINT) AS n_null,
           |  CAST(ndv_$c AS BIGINT) AS n_distinct FROM s""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH s AS (
         |  SELECT count(*) AS n_rows,
         |    $aggs
         |  FROM orders)
         |$rows
         |ORDER BY "column"""".stripMargin
    },

    // ----------------------------------------------------------- corpus

    "txt_decontaminate" -> decontaminateSql,
    // the Bloom pre-filter must be output-invisible: same oracle
    "txt_decontaminate_bloom" -> decontaminateSql,

    "txt_shuffle_export" -> {
      val base = "(SELECT doc_id, 'shuf:' || CAST(doc_id AS VARCHAR) AS s " +
        "FROM documents)"
      s"""WITH ${Xxh64Sql.chain(base, "s", 1, "sh")}
         |SELECT doc_id, sh_val AS skey FROM sh
         |ORDER BY skey, doc_id""".stripMargin
    },

    "txt_repetition" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("lower(text)")} AS t FROM documents),
         |g AS (SELECT doc_id, ${gramsSql(3)} AS gl FROM toks)
         |SELECT doc_id,
         |  CAST(len(gl) AS BIGINT) AS n_grams,
         |  CAST(len(list_distinct(gl)) AS BIGINT) AS n_distinct,
         |  CASE WHEN len(gl) > 0
         |       THEN 1.0 - len(list_distinct(gl)) / len(gl)
         |       ELSE 0.0 END AS rep_ratio
         |FROM g ORDER BY doc_id""".stripMargin,

    // Mirrors CorpusOps.segmentDedup exactly: 10-word fixed segments,
    // drop segments present in >1 distinct doc, reassemble in order.
    // DuckDB list slicing wl[a:b] is inclusive-bounds — equivalent to
    // Spark slice(w, a, 10) truncated at len(wl).
    "txt_segment_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
        |segs AS (
        |  SELECT doc_id, x.seg_id AS seg_id, x.seg_text AS seg_text FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(0,
        |        greatest(CAST(ceil(len(wl)/10.0) AS INT), 1) - 1),
        |      i -> {'seg_id': i,
        |            'seg_text': array_to_string(
        |              wl[i*10+1 : least((i+1)*10, len(wl))], ' ')})) AS x
        |    FROM w) t),
        |shared AS (
        |  SELECT seg_text FROM segs
        |  GROUP BY 1 HAVING count(DISTINCT doc_id) > 1),
        |kept AS (
        |  SELECT * FROM segs
        |  WHERE seg_text NOT IN (SELECT seg_text FROM shared)),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(seg_text, ' ' ORDER BY seg_id)
        |           AS clean_text,
        |         count(*) AS kept_segs
        |  FROM kept GROUP BY 1),
        |tot AS (SELECT doc_id,
        |          greatest(CAST(ceil(len(wl)/10.0) AS BIGINT), 1) AS n_segs
        |        FROM w)
        |SELECT tot.doc_id AS doc_id, coalesce(clean_text, '') AS clean_text,
        |       coalesce(kept_segs, 0) AS kept_segs,
        |       tot.n_segs - coalesce(kept_segs, 0) AS dropped_segs
        |FROM tot LEFT JOIN rebuilt ON tot.doc_id = rebuilt.doc_id
        |ORDER BY doc_id""".stripMargin,

    "txt_chunks" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |c AS (
         |  SELECT doc_id, t, len(t) AS n,
         |    CASE WHEN len(t) <= 64 THEN 1
         |         ELSE 1 + CAST(floor((len(t) - 64 + 47) / 48.0) AS BIGINT)
         |    END AS nc
         |  FROM toks WHERE len(t) >= 1),
         |e AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(0, nc - 1),
         |    i -> {'idx': i, 'chunk': t[i*48+1 : least(i*48+64, n)]})) AS x
         |  FROM c)
         |SELECT doc_id, CAST(x.idx AS BIGINT) AS chunk_idx,
         |  CAST(len(x.chunk) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(x.chunk, ' ')) AS chunk_fp
         |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    "txt_pack" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |c AS (
         |  SELECT doc_id, t, len(t) AS n,
         |    CASE WHEN len(t) <= 64 THEN 1
         |         ELSE 1 + CAST(floor((len(t) - 64 + 47) / 48.0) AS BIGINT)
         |    END AS nc
         |  FROM toks WHERE len(t) >= 1),
         |e AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(0, nc - 1),
         |    i -> {'idx': i, 'chunk': t[i*48+1 : least(i*48+64, n)]})) AS x
         |  FROM c),
         |chunks AS (
         |  SELECT doc_id, CAST(x.idx AS BIGINT) AS chunk_idx,
         |    CAST(len(x.chunk) AS BIGINT) AS n_tokens
         |  FROM e),
         |binned AS (
         |  SELECT doc_id % 8 AS shard, doc_id, chunk_idx, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY doc_id % 8
         |      ORDER BY doc_id, chunk_idx) - n_tokens AS cum_before
         |  FROM chunks),
         |withbin AS (
         |  SELECT shard, CAST(floor(cum_before / 256) AS BIGINT) AS bin_id,
         |    doc_id, chunk_idx, n_tokens,
         |    row_number() OVER (PARTITION BY shard,
         |      CAST(floor(cum_before / 256) AS BIGINT)
         |      ORDER BY doc_id, chunk_idx) AS rn,
         |    row_number() OVER (PARTITION BY shard,
         |      CAST(floor(cum_before / 256) AS BIGINT)
         |      ORDER BY doc_id DESC, chunk_idx DESC) AS rnd
         |  FROM binned)
         |SELECT shard, bin_id,
         |  count(*) AS n_chunks,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_packed,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS first_doc,
         |  max(CASE WHEN rn = 1 THEN chunk_idx END) AS first_idx,
         |  max(CASE WHEN rnd = 1 THEN doc_id END) AS last_doc,
         |  max(CASE WHEN rnd = 1 THEN chunk_idx END) AS last_idx
         |FROM withbin GROUP BY 1, 2 ORDER BY shard, bin_id""".stripMargin,

    // ------------------------------------------------------------- text
    "txt_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_subword_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,

    // DuckDB regexp_replace replaces the FIRST match unless the 'g' flag
    // is passed; Spark's always replaces all. Patterns are written to the
    // Java-regex ∩ RE2 common subset (TextOps.emailRe etc.).
    "txt_pii_redact" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${ops.TextOps.emailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${ops.TextOps.ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '${ops.TextOps.phoneRe}')) AS BIGINT) AS n_phones,
         |  regexp_replace(
         |    regexp_replace(
         |      regexp_replace(text, '${ops.TextOps.emailRe}', '<EMAIL>', 'g'),
         |      '${ops.TextOps.ipv4Re}', '<IP>', 'g'),
         |    '${ops.TextOps.phoneRe}', '<PHONE>', 'g') AS redacted
         |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_train_test_split" ->
      """SELECT doc_id,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 100 AS bucket,
        |  CASE WHEN CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 100 < 10
        |       THEN 'test' ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_top_terms" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS term
         |  FROM documents)
         |SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
         |FROM t GROUP BY term
         |ORDER BY tf DESC, term LIMIT 50""".stripMargin,

    // Independent audit of the corpus pipeline's reported stage counts:
    // DuckDB re-counts the parquet each stage STAGED (CorpusPipeline
    // writes under `corpusStageDir` above — namespaced by the same
    // helper the engine uses, so the paths cannot drift). A mismatch
    // means the pipeline's report diverged from what it wrote. The
    // gate-dir coupling stays deliberate: running the gate at another
    // SF or root fails LOUD (absent path, or '1_total' from the new SF
    // vs stage counts from the old staging — never a silent false
    // pass), because stageSummary always re-runs the pipeline and
    // rewrites its staging in the same invocation.
    "corpus_pipeline_stages" ->
      s"""SELECT '1_total' AS stage, count(*) AS n_rows FROM documents
        |UNION ALL SELECT '2_survivors', count(*)
        |  FROM read_parquet('$corpusStageDir/survivors/*.parquet')
        |UNION ALL SELECT '3_boilerplate', count(*)
        |  FROM read_parquet('$corpusStageDir/deboiled/*.parquet')
        |UNION ALL SELECT '4_quality', count(*)
        |  FROM read_parquet('$corpusStageDir/quality/*.parquet')
        |UNION ALL SELECT '5_gate', count(*)
        |  FROM read_parquet('$corpusStageDir/gated/*.parquet')
        |UNION ALL SELECT '6_balance', count(*)
        |  FROM read_parquet('$corpusStageDir/balanced/*.parquet')
        |UNION ALL SELECT '7_decontam', count(*)
        |  FROM read_parquet('$corpusStageDir/clean/*.parquet')
        |UNION ALL SELECT '8_chunks', count(*)
        |  FROM read_parquet('$corpusStageDir/chunks/*.parquet')
        |UNION ALL SELECT '9_packed', count(*)
        |  FROM read_parquet('$corpusStageDir/packed/*.parquet')
        |ORDER BY stage""".stripMargin,

    // CMS sketch VALUES are engine-specific; the hash-compared contract is
    // (term, exact tf, within_bound) — the engine computes the bound check
    // against its own sketch, the oracle states the promise as TRUE
    // (the r_approx_distinct_bound precedent)
    "txt_top_terms_cms" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS term
         |  FROM documents)
         |SELECT term, count(*) AS tf, TRUE AS within_bound
         |FROM t GROUP BY term
         |ORDER BY tf DESC, term LIMIT 50""".stripMargin,

    "txt_tfidf" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS term
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |x AS (
         |  SELECT doc_id, term, tf, df,
         |    CAST(tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
         |      AS DECIMAL(20,8)) AS tfidf,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY
         |      CAST(tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
         |        AS DECIMAL(20,8)) DESC,
         |      term) AS rn
         |  FROM tf JOIN df USING (term) CROSS JOIN n)
         |SELECT doc_id, term, tf, df, CAST(tfidf AS DOUBLE) AS tfidf
         |FROM x WHERE rn <= 3 ORDER BY doc_id, term""".stripMargin,

    "txt_lm_score" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS term
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |ctf AS (SELECT term, sum(tf) AS ctf FROM tf GROUP BY 1),
         |tot AS (SELECT sum(tf) AS t_total FROM tf),
         |lp AS (
         |  SELECT doc_id, tf,
         |    CAST(tf * ln(CAST(ctf AS DOUBLE) / CAST(t_total AS DOUBLE))
         |      AS DECIMAL(24,9)) AS lp
         |  FROM tf JOIN ctf USING (term) CROSS JOIN tot)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |  CAST(sum(lp) AS DOUBLE) / CAST(sum(tf) AS BIGINT) AS avg_logprob
         |FROM lp GROUP BY 1 ORDER BY 1""".stripMargin,

    "txt_quality" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens,
         |    CAST(length(text) -
         |      length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))
         |      AS BIGINT) AS n_punct,
         |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
         |      AS BIGINT) AS n_alpha,
         |    CAST(len(regexp_extract_all(lower(text),
         |      '\\b(the|a|of|to|in|and|is|it|that|for)\\b')) AS BIGINT)
         |      AS n_stop
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, n_chars, n_tokens,
         |    CAST(n_chars AS DOUBLE) / greatest(n_tokens, 1) AS mean_token_len,
         |    CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
         |    CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1) AS alpha_ratio,
         |    CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) AS stopword_ratio
         |  FROM base)
         |SELECT *,
         |  (n_tokens >= 5 AND n_tokens <= 100000 AND mean_token_len >= 2.0
         |   AND mean_token_len <= 15.0 AND alpha_ratio >= 0.5) AS keep
         |FROM q ORDER BY doc_id""".stripMargin,

    "txt_lang_id" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS word
         |  FROM documents),
         |lex(lex_lang, lex_word) AS (VALUES $lexValues),
         |hits AS (
         |  SELECT t.doc_id, l.lex_lang, count(l.lex_lang) AS hits
         |  FROM tok t LEFT JOIN lex l ON t.word = l.lex_word
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT doc_id, lex_lang, hits,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY hits DESC, lex_lang ASC NULLS LAST) AS rn
         |  FROM hits)
         |SELECT doc_id,
         |  CASE WHEN hits > 0 THEN lex_lang ELSE 'und' END AS predicted_lang,
         |  hits
         |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "txt_fingerprint_md5" ->
      s"""SELECT doc_id,
         |  md5(array_to_string(${toksSql("lower(text)")}, ' ')) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,

    // xxhash64 reproduced in pure SQL ([[Xxh64Sql]]) — 32 unrolled
    // stripes support docs up to 1055 bytes (sf0.01 max is 553)
    "txt_fingerprint_xx" -> {
      val base = "(SELECT doc_id, array_to_string(" +
        toksSql("lower(text)") + ", ' ') AS s FROM documents)"
      s"""WITH ${Xxh64Sql.chain(base, "s", 32, "fp")}
         |SELECT doc_id, fp_val AS fingerprint FROM fp
         |ORDER BY doc_id""".stripMargin
    },

    // Per-token xxhash64 via [[Xxh64Sql]] (2 stripe levels: tokens are
    // ≤8 bytes here, 95-byte headroom), then the ±1 bit votes and the
    // sign→bit fold. Docs with no tokens fingerprint as 0 (LEFT JOIN).
    "dedup_simhash" -> {
      val tokBase = "(SELECT doc_id, unnest(" + toksSql("lower(text)") +
        ") AS tok FROM documents)"
      s"""WITH ${Xxh64Sql.chain(tokBase, "tok", 2, "th")},
         |votes AS (
         |  SELECT doc_id, i.range AS i,
         |         sum(CASE WHEN (th_u // power(2, i.range)::HUGEINT) % 2 = 1
         |             THEN 1 ELSE -1 END) AS v
         |  FROM th CROSS JOIN range(64) i GROUP BY 1, 2),
         |sim AS (
         |  SELECT doc_id,
         |         sum(CASE WHEN v > 0 THEN power(2, i)::HUGEINT
         |             ELSE 0::HUGEINT END) AS u
         |  FROM votes GROUP BY 1)
         |SELECT d.doc_id,
         |       COALESCE(CASE WHEN s.u >= 9223372036854775808
         |                     THEN CAST(s.u - 18446744073709551616 AS BIGINT)
         |                     ELSE CAST(s.u AS BIGINT) END, 0) AS simhash
         |FROM documents d LEFT JOIN sim s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // dedup_simhash + 4×16-bit banding, bucket join, Hamming verify —
    // the xor/bit_count run on the signed BIGINT form (two's complement
    // xor ≡ u64 xor), mirroring the engine
    "dedup_simhash_pairs" ->
      s"""WITH $simhashPairsCtes
         |SELECT doc_a, doc_b, hamming FROM cand
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,

    // Recursive-CTE DAG reachability from the smallest near-dup doc over
    // the (doc_a < doc_b)-directed simhash edges, depth-capped at 4 —
    // the hierarchy/BOM-walk shape of WITH RECURSIVE (Spark 4 UNION ALL
    // semantics; min-depth aggregation dedups diamond paths).
    "r_recursive_reach" ->
      s"""WITH RECURSIVE $simhashPairsCtes,
         |edges AS (
         |  SELECT doc_a, doc_b FROM cand WHERE hamming <= 3),
         |reach(doc_id, depth) AS (
         |  SELECT min(doc_a), 0 FROM edges
         |  UNION ALL
         |  SELECT e.doc_b, r.depth + 1
         |  FROM reach r JOIN edges e ON e.doc_a = r.doc_id
         |  WHERE r.depth < 4)
         |SELECT doc_id, CAST(min(depth) AS BIGINT) AS depth
         |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // ------------------------------------------------------------ dedup
    "dedup_exact" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    md5(array_to_string(${toksSql("lower(text)")}, ' ')) AS content_hash
         |  FROM documents)
         |SELECT content_hash, min(doc_id) AS keep_doc_id,
         |       count(*) AS n_copies
         |FROM h GROUP BY 1 ORDER BY keep_doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $ngramPairsCtes
         |SELECT doc_a, doc_b, shared, size_a, size_b FROM jpairs
         |ORDER BY doc_a, doc_b""".stripMargin,

    // the incremental run is DEFINED as the full recompute restricted to
    // pairs with a new-batch side (doc_id % 10 = 0) — the engine prunes
    // candidate generation to new-touching postings, the oracle just
    // filters the full pair set; both produce identical rows
    "dedup_incremental" ->
      s"""WITH $ngramPairsCtes
         |SELECT doc_a, doc_b, shared, size_a, size_b FROM jpairs
         |WHERE doc_a % 10 = 0 OR doc_b % 10 = 0
         |ORDER BY doc_a, doc_b""".stripMargin,

    // DedupOps.containmentPairs twin: the same candidate chain, decided by
    // the overlap coefficient 100·shared >= 80·min(|A|,|B|) instead of
    // Jaccard — subset/quote duplication.
    "dedup_containment" ->
      s"""WITH $ngramBaseCtes,
         |cpairs AS (
         |  SELECT doc_a, doc_b, shared, sa.n_sh AS size_a, sb.n_sh AS size_b
         |  FROM rawpairs
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE shared * 100 >= 80 * least(sa.n_sh, sb.n_sh))
         |SELECT doc_a, doc_b, shared, size_a, size_b FROM cpairs
         |ORDER BY doc_a, doc_b""".stripMargin,

    // DedupOps.dupSpans twin (k=8): windows keyed by their text where the
    // engine uses xxhash64 (injective relabeling); parallel unnest zips
    // positions with window strings; islands merged by the same running
    // max(pos+k) frame; the single double division mirrors the engine.
    "dedup_substring_spans" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("lower(text)")} AS t FROM documents),
         |base AS (
         |  SELECT doc_id, t, len(t) AS n_tokens FROM toks),
         |wins AS (
         |  SELECT doc_id,
         |    unnest(generate_series(1, len(t) - 7)) - 1 AS pos,
         |    unnest(list_transform(generate_series(1, len(t) - 7),
         |      i -> array_to_string(t[i:i+7], ' '))) AS w
         |  FROM base WHERE len(t) >= 8),
         |duph AS (
         |  SELECT w FROM wins GROUP BY w
         |  HAVING count(DISTINCT doc_id) >= 2),
         |flag AS (
         |  SELECT doc_id, pos FROM wins
         |  WHERE w IN (SELECT w FROM duph)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM flag),
         |sp AS (
         |  SELECT doc_id, pos,
         |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end
         |        THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
         |  FROM isl),
         |spans AS (
         |  SELECT doc_id, span_id, min(pos) AS s, max(pos) + 8 AS e,
         |         count(*) AS nw
         |  FROM sp GROUP BY 1, 2),
         |per AS (
         |  SELECT doc_id, count(*) AS n_spans, sum(e - s) AS dup_tokens,
         |         sum(nw) AS n_dup_windows
         |  FROM spans GROUP BY 1)
         |SELECT b.doc_id,
         |  CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(greatest(b.n_tokens - 7, 0) AS BIGINT) AS n_windows,
         |  CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
         |  CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CASE WHEN b.n_tokens > 0
         |       THEN CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / b.n_tokens
         |       ELSE 0.0 END AS dup_frac
         |FROM base b LEFT JOIN per p ON b.doc_id = p.doc_id
         |ORDER BY b.doc_id""".stripMargin,

    // DedupOps.removeDupSpans twin (k=8): same window/islands chain as
    // dedup_substring_spans, but windows keep their canonical
    // (min-doc_id) copy; removable positions cut, survivors re-joined.
    // Correlated NOT EXISTS does the span-coverage test per token.
    "dedup_remove_spans" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("lower(text)")} AS t FROM documents),
         |base AS (
         |  SELECT doc_id, t, len(t) AS n_tokens FROM toks),
         |wins AS (
         |  SELECT doc_id,
         |    unnest(generate_series(1, len(t) - 7)) - 1 AS pos,
         |    unnest(list_transform(generate_series(1, len(t) - 7),
         |      i -> array_to_string(t[i:i+7], ' '))) AS w
         |  FROM base WHERE len(t) >= 8),
         |canon AS (
         |  SELECT w, min(doc_id) AS keeper FROM wins GROUP BY w
         |  HAVING count(DISTINCT doc_id) >= 2),
         |rem AS (
         |  SELECT doc_id, pos FROM wins JOIN canon USING (w)
         |  WHERE doc_id <> keeper),
         |isl AS (
         |  SELECT doc_id, pos,
         |    max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM rem),
         |sp AS (
         |  SELECT doc_id, pos,
         |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end
         |        THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
         |  FROM isl),
         |spans AS (
         |  SELECT doc_id, span_id, min(pos) AS s, max(pos) + 8 AS e
         |  FROM sp GROUP BY 1, 2),
         |tokpos AS (
         |  SELECT doc_id, unnest(t) AS tok,
         |    unnest(generate_series(1, len(t))) - 1 AS p
         |  FROM base),
         |kept AS (
         |  SELECT tp.doc_id, tp.tok, tp.p FROM tokpos tp
         |  WHERE NOT EXISTS (SELECT 1 FROM spans s2
         |    WHERE s2.doc_id = tp.doc_id AND tp.p >= s2.s AND tp.p < s2.e)),
         |agg AS (
         |  SELECT doc_id, count(*) AS kept_tokens,
         |         string_agg(tok, ' ' ORDER BY p) AS clean_text
         |  FROM kept GROUP BY 1)
         |SELECT b.doc_id,
         |  CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(b.n_tokens - coalesce(a.kept_tokens, 0) AS BIGINT)
         |    AS removed_tokens,
         |  CAST(coalesce(a.kept_tokens, 0) AS BIGINT) AS kept_tokens,
         |  coalesce(a.clean_text, '') AS clean_text
         |FROM base b LEFT JOIN agg a ON b.doc_id = a.doc_id
         |ORDER BY b.doc_id""".stripMargin,

    // DedupOps.dedupSurvivorsByQuality twin: the dedup_clusters recursive
    // CC labels + the txt_quality keep/n_tokens slice; per-cluster argmax
    // by (keep DESC, n_tokens DESC, doc_id) — boolean+integer keys only.
    "dedup_survivors_quality" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
         |  UNION SELECT doc_b, doc_a FROM jpairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |q AS (
         |  SELECT doc_id,
         |    CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens,
         |    (len(${toksSql("text")}) >= 5
         |     AND len(${toksSql("text")}) <= 100000
         |     AND CAST(length(text) AS DOUBLE)
         |         / greatest(len(${toksSql("text")}), 1) >= 2.0
         |     AND CAST(length(text) AS DOUBLE)
         |         / greatest(len(${toksSql("text")}), 1) <= 15.0
         |     AND CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
         |           AS DOUBLE) / greatest(length(text), 1) >= 0.5) AS keep
         |  FROM documents),
         |ranked AS (
         |  SELECT q.doc_id, l.cluster_id, q.n_tokens, q.keep,
         |    row_number() OVER (PARTITION BY l.cluster_id
         |      ORDER BY q.keep DESC, q.n_tokens DESC, q.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY l.cluster_id) AS n_members
         |  FROM q JOIN lab l ON q.doc_id = l.doc_id)
         |SELECT doc_id, cluster_id, CAST(n_members AS BIGINT) AS n_members,
         |       n_tokens, keep
         |FROM ranked WHERE rn = 1
         |UNION ALL
         |SELECT q.doc_id, q.doc_id AS cluster_id, CAST(1 AS BIGINT),
         |       q.n_tokens, q.keep
         |FROM q WHERE q.doc_id NOT IN (SELECT doc_id FROM lab)
         |ORDER BY doc_id""".stripMargin,

    // connected components over the same pairs, as a recursive
    // transitive-closure CTE: label = min over the reachable set —
    // exactly the fixpoint the engine's min-label propagation converges to
    "dedup_clusters" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
         |  UNION SELECT doc_b, doc_a FROM jpairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src)
         |SELECT cluster_id, count(*) AS n_members,
         |  array_to_string(list_sort(list(doc_id)), ',') AS members
         |FROM lab GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    "dedup_survivors" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
         |  UNION SELECT doc_b, doc_a FROM jpairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src)
         |SELECT d.doc_id FROM documents d
         |LEFT JOIN lab l ON d.doc_id = l.doc_id
         |WHERE l.cluster_id IS NULL OR l.cluster_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Exact ground truth for the MinHash+LSH pipeline: every pair with
    // full-set n-gram Jaccard >= 0.6. Valid as a hash-equality oracle
    // because (a) the verify stage scores candidates with exact full-set
    // Jaccard (same integer arithmetic as below), and (b) banding recall
    // on this corpus is exactly 1.0 — all qualifying pairs sit at
    // J >= 0.9, where the 16-band x 4-row miss probability is
    // (1 - 0.9^4)^16 ~ 4e-8, and the signature seeds are fixed so the
    // result is deterministic. Differs from the ngram oracle only in
    // using full shingle sets (no max-df skew cap in the verify path).
    "dedup_minhash_lsh" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("lower(text)")} AS t FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, shingle FROM (
         |    SELECT doc_id, unnest(list_transform(
         |      generate_series(1, len(t) - 2),
         |      i -> array_to_string(t[i:i+2], ' '))) AS shingle
         |    FROM toks WHERE len(t) >= 3)),
         |pairforming AS (
         |  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= 2),
         |idx AS (
         |  SELECT * FROM sh
         |  WHERE shingle IN (SELECT shingle FROM pairforming)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM idx a JOIN idx b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, shared, sa.n_sh AS size_a, sb.n_sh AS size_b
         |FROM pairs
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE shared * 100 >= 60 * (sa.n_sh + sb.n_sh - shared)
         |ORDER BY doc_a, doc_b""".stripMargin,

    // ------------------------------------------------------- similarity
    "emb_topk_brute" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm
        |  FROM n WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, c.vec_id,
        |    round(list_sum(list_transform(range(1, len(q.q_emb) + 1),
        |        i -> q.q_emb[i] * c.emb[i])) / (q.q_nrm * c.nrm), 6)
        |      AS cosine_sim
        |  FROM q CROSS JOIN n c WHERE c.vec_id <> q.query_id),
        |r AS (
        |  SELECT query_id, vec_id, cosine_sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine_sim DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank,
        |       vec_id AS neighbor_id, cosine_sim
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // SimilarityOps.centroidDrift twin: same DECIMAL(20,10) component
    // quantization, exact-input centroid divisions, and per-term
    // DECIMAL(24,12) dot/norm reductions. Spark's posexplode pos is
    // 0-based and DuckDB's range here 1-based, but pos only keys the
    // within-engine side join, so the offset cancels.
    "emb_centroid_drift" ->
      """WITH base AS (
        |  SELECT CAST(label AS BIGINT) AS label, vec_id % 2 AS side,
        |    embedding AS emb
        |  FROM embeddings),
        |ex AS (
        |  SELECT label, side, unnest(range(1, len(emb) + 1)) AS i, emb
        |  FROM base),
        |e AS (
        |  SELECT label, side, i AS pos,
        |    CAST(CAST(emb[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(20,10))
        |      AS v
        |  FROM ex),
        |comp AS (
        |  SELECT label, side, pos,
        |    CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS c,
        |    count(*) AS n
        |  FROM e GROUP BY 1, 2, 3),
        |a AS (SELECT label, pos, c AS ca, n AS n_a FROM comp
        |  WHERE side = 0),
        |b AS (SELECT label, pos, c AS cb, n AS n_b FROM comp
        |  WHERE side = 1),
        |g AS (
        |  SELECT a.label,
        |    CAST(max(n_a) AS BIGINT) AS n_a,
        |    CAST(max(n_b) AS BIGINT) AS n_b,
        |    sum(CAST(ca * cb AS DECIMAL(24,12))) AS dot,
        |    sum(CAST(ca * ca AS DECIMAL(24,12))) AS naa,
        |    sum(CAST(cb * cb AS DECIMAL(24,12))) AS nbb
        |  FROM a JOIN b ON a.label = b.label AND a.pos = b.pos
        |  GROUP BY 1)
        |SELECT label, n_a, n_b,
        |  CAST(dot AS DOUBLE) / (sqrt(CAST(naa AS DOUBLE))
        |    * sqrt(CAST(nbb AS DOUBLE))) AS cos_drift
        |FROM g ORDER BY label""".stripMargin,

    // Hyperplane LSH reproduced in SQL: the signature planes are
    // deterministic literals (splitmix64, SimilarityOps.hyperplane), so
    // each signature bit is an explicit sign-of-dot-product expression.
    // Double literals are shortest-round-trip (Java Double.toString ↔
    // DuckDB decimal parse is exact), and sign flips from accumulation
    // -order differences would need |dot| ~ 1e-15 — validated
    // cell-identical on the gate corpus.
    "emb_topk_lsh" -> {
      val dim = 64
      val nBits = 32
      val planes = (0 until nBits)
        .map(j => ops.SimilarityOps.hyperplane(j + 1, dim))
      def dotSql(p: Seq[Double]) =
        "(" + p.zipWithIndex.map { case (c, i) =>
          s"CAST(embedding[${i + 1}] AS DOUBLE) * ($c)" }.mkString(" + ") + ")"
      val sigBits = planes.zipWithIndex.map { case (p, j) =>
        s"CASE WHEN ${dotSql(p)} >= 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH sigs AS (
         |  SELECT vec_id, embedding, CAST($sigBits AS BIGINT) AS sig
         |  FROM embeddings),
         |banded AS (
         |  SELECT vec_id, embedding, b.range AS band,
         |         (sig // power(2, 8*b.range)::BIGINT) % 256 AS chunk
         |  FROM sigs CROSS JOIN range(4) b),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, q.embedding AS q_emb,
         |         c.vec_id, c.embedding
         |  FROM banded c JOIN (SELECT * FROM banded WHERE vec_id < 10) q
         |    ON c.band = q.band AND c.chunk = q.chunk
         |  WHERE c.vec_id <> q.vec_id),
         |scored AS (
         |  SELECT query_id, vec_id,
         |    round(
         |      list_sum(list_transform(range(1, len(q_emb) + 1),
         |        i -> CAST(q_emb[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) /
         |      (sqrt(list_sum(list_transform(q_emb,
         |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |       sqrt(list_sum(list_transform(embedding,
         |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine_sim
         |  FROM cand),
         |ranked AS (
         |  SELECT query_id, vec_id, cosine_sim,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine_sim DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank,
         |       vec_id AS neighbor_id, cosine_sim
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    // SimilarityOps.lshTopKMultiprobe twin: the lshTopK oracle with the
    // query side fanned out over the chunk's Hamming-1 probes
    // (xor with 0 and each single-bit mask) before the same bucket join.
    "emb_topk_lsh_mp" -> {
      val dim = 64
      val nBits = 32
      val planes = (0 until nBits)
        .map(j => ops.SimilarityOps.hyperplane(j + 1, dim))
      def dotSql(p: Seq[Double]) =
        "(" + p.zipWithIndex.map { case (c, i) =>
          s"CAST(embedding[${i + 1}] AS DOUBLE) * ($c)" }.mkString(" + ") + ")"
      val sigBits = planes.zipWithIndex.map { case (p, j) =>
        s"CASE WHEN ${dotSql(p)} >= 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      val probeMasks = (0L +: (0 until 8).map(j => 1L << j))
        .mkString("[", ", ", "]")
      s"""WITH sigs AS (
         |  SELECT vec_id, embedding, CAST($sigBits AS BIGINT) AS sig
         |  FROM embeddings),
         |banded AS (
         |  SELECT vec_id, embedding, b.range AS band,
         |         (sig // power(2, 8*b.range)::BIGINT) % 256 AS chunk
         |  FROM sigs CROSS JOIN range(4) b),
         |probes AS (
         |  SELECT vec_id, embedding, band,
         |         xor(chunk, CAST(pm.m AS BIGINT)) AS chunk
         |  FROM banded,
         |       (SELECT unnest($probeMasks) AS m) pm
         |  WHERE vec_id < 10),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, q.embedding AS q_emb,
         |         c.vec_id, c.embedding
         |  FROM banded c JOIN probes q
         |    ON c.band = q.band AND c.chunk = q.chunk
         |  WHERE c.vec_id <> q.vec_id),
         |scored AS (
         |  SELECT query_id, vec_id,
         |    round(
         |      list_sum(list_transform(range(1, len(q_emb) + 1),
         |        i -> CAST(q_emb[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) /
         |      (sqrt(list_sum(list_transform(q_emb,
         |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |       sqrt(list_sum(list_transform(embedding,
         |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine_sim
         |  FROM cand),
         |ranked AS (
         |  SELECT query_id, vec_id, cosine_sim,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine_sim DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank,
         |       vec_id AS neighbor_id, cosine_sim
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    // Medoid-seeded IVF: centroids are stored vectors, so assignment and
    // probing are pure sequential dot products — reproducible across
    // engines with no rounding needed until the final cosine
    "emb_topk_ivf_seeded" ->
      """WITH emb AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 10),
        |sims AS (
        |  SELECT v.vec_id, c.cell,
        |    list_sum(list_transform(range(1, len(v.e) + 1),
        |      i -> v.e[i] * c.ce[i])) /
        |    (sqrt(list_sum(list_transform(v.e, x -> x * x))) *
        |     sqrt(list_sum(list_transform(c.ce, x -> x * x)))) AS sim
        |  FROM emb v CROSS JOIN cent c),
        |assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY sim DESC, cell) AS rn
        |    FROM sims) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cell FROM (
        |    SELECT vec_id, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY sim DESC, cell) AS rn
        |    FROM sims WHERE vec_id < 10) WHERE rn <= 3),
        |cand AS (
        |  SELECT p.query_id, a.vec_id
        |  FROM probes p JOIN assign a ON p.cell = a.cell
        |  WHERE a.vec_id <> p.query_id),
        |scored AS (
        |  SELECT c.query_id, c.vec_id,
        |    round(
        |      list_sum(list_transform(range(1, len(q.e) + 1),
        |        i -> q.e[i] * v.e[i])) /
        |      (sqrt(list_sum(list_transform(q.e, x -> x * x))) *
        |       sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6)
        |      AS cosine_sim
        |  FROM cand c
        |  JOIN emb q ON c.query_id = q.vec_id
        |  JOIN emb v ON c.vec_id = v.vec_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine_sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY cosine_sim DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank,
        |       vec_id AS neighbor_id, cosine_sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // PQ ANN — mirrors pqTopKSeeded exactly: 16 subspaces × 4 dims,
    // 32 medoid-seeded codewords per subspace (sub-slices of vec_id < 32),
    // L2 argmin encode (sequential fold, ties → lower code), reconstruct,
    // then full-precision-query cosine over the reconstruction
    "emb_topk_pq" ->
      """WITH emb AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |ss AS (SELECT unnest(range(16)) AS s),
        |cb AS (
        |  SELECT sd.vec_id AS code, ss.s,
        |         sd.e[ss.s*4+1 : ss.s*4+4] AS cw
        |  FROM emb sd, ss WHERE sd.vec_id < 32),
        |subs AS (
        |  SELECT v.vec_id, ss.s, v.e[ss.s*4+1 : ss.s*4+4] AS sv
        |  FROM emb v, ss),
        |codes AS (
        |  SELECT vec_id, s, code FROM (
        |    SELECT sub.vec_id, sub.s, cb.code,
        |      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
        |        ORDER BY list_sum(list_transform(range(1, 5),
        |          i -> (sub.sv[i] - cb.cw[i]) * (sub.sv[i] - cb.cw[i]))),
        |          cb.code) AS rn
        |    FROM subs sub JOIN cb ON sub.s = cb.s) WHERE rn = 1),
        |recon AS (
        |  SELECT c.vec_id, flatten(list(cb.cw ORDER BY c.s)) AS r
        |  FROM codes c JOIN cb ON c.s = cb.s AND c.code = cb.code
        |  GROUP BY c.vec_id),
        |approx AS (
        |  SELECT q.vec_id AS query_id, r.vec_id,
        |    list_sum(list_transform(range(1, len(q.e) + 1),
        |      i -> q.e[i] * r.r[i])) /
        |    (sqrt(list_sum(list_transform(q.e, x -> x * x))) *
        |     sqrt(list_sum(list_transform(r.r, x -> x * x)))) AS approx_sim
        |  FROM emb q JOIN recon r
        |    ON q.vec_id < 10 AND r.vec_id <> q.vec_id),
        |shortlist AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |                         ORDER BY approx_sim DESC, vec_id) AS arank
        |    FROM approx) WHERE arank <= 50),
        |rescored AS (
        |  SELECT sl.query_id, sl.vec_id,
        |    round(
        |      list_sum(list_transform(range(1, len(q.e) + 1),
        |        i -> q.e[i] * v.e[i])) /
        |      (sqrt(list_sum(list_transform(q.e, x -> x * x))) *
        |       sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6)
        |      AS cosine_sim
        |  FROM shortlist sl
        |  JOIN emb q ON sl.query_id = q.vec_id
        |  JOIN emb v ON sl.vec_id = v.vec_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine_sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY cosine_sim DESC, vec_id) AS rank
        |  FROM rescored)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank,
        |       vec_id AS neighbor_id, cosine_sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "emb_topk_ivfpq" ->
      """WITH emb AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 10),
        |csims AS (
        |  SELECT v.vec_id, c.cell,
        |    list_sum(list_transform(range(1, len(v.e) + 1),
        |      i -> v.e[i] * c.ce[i])) /
        |    (sqrt(list_sum(list_transform(v.e, x -> x * x))) *
        |     sqrt(list_sum(list_transform(c.ce, x -> x * x)))) AS sim
        |  FROM emb v CROSS JOIN cent c),
        |assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY sim DESC, cell) AS rn
        |    FROM csims) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cell FROM (
        |    SELECT vec_id, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY sim DESC, cell) AS rn
        |    FROM csims WHERE vec_id < 10) WHERE rn <= 3),
        |ss AS (SELECT unnest(range(16)) AS s),
        |cb AS (
        |  SELECT sd.vec_id AS code, ss.s,
        |         sd.e[ss.s*4+1 : ss.s*4+4] AS cw
        |  FROM emb sd, ss WHERE sd.vec_id < 32),
        |subs AS (
        |  SELECT v.vec_id, ss.s, v.e[ss.s*4+1 : ss.s*4+4] AS sv
        |  FROM emb v, ss),
        |codes AS (
        |  SELECT vec_id, s, code FROM (
        |    SELECT sub.vec_id, sub.s, cb.code,
        |      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
        |        ORDER BY list_sum(list_transform(range(1, 5),
        |          i -> (sub.sv[i] - cb.cw[i]) * (sub.sv[i] - cb.cw[i]))),
        |          cb.code) AS rn
        |    FROM subs sub JOIN cb ON sub.s = cb.s) WHERE rn = 1),
        |recon AS (
        |  SELECT c.vec_id, flatten(list(cb.cw ORDER BY c.s)) AS r
        |  FROM codes c JOIN cb ON c.s = cb.s AND c.code = cb.code
        |  GROUP BY c.vec_id),
        |cand AS (
        |  SELECT p.query_id, a.vec_id
        |  FROM probes p JOIN assign a ON p.cell = a.cell
        |  WHERE a.vec_id <> p.query_id),
        |approx AS (
        |  SELECT c.query_id, c.vec_id,
        |    list_sum(list_transform(range(1, len(q.e) + 1),
        |      i -> q.e[i] * r.r[i])) /
        |    (sqrt(list_sum(list_transform(q.e, x -> x * x))) *
        |     sqrt(list_sum(list_transform(r.r, x -> x * x)))) AS approx_sim
        |  FROM cand c
        |  JOIN emb q ON c.query_id = q.vec_id
        |  JOIN recon r ON c.vec_id = r.vec_id),
        |shortlist AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |                         ORDER BY approx_sim DESC, vec_id) AS arank
        |    FROM approx) WHERE arank <= 50),
        |rescored AS (
        |  SELECT sl.query_id, sl.vec_id,
        |    round(
        |      list_sum(list_transform(range(1, len(q.e) + 1),
        |        i -> q.e[i] * v.e[i])) /
        |      (sqrt(list_sum(list_transform(q.e, x -> x * x))) *
        |       sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6)
        |      AS cosine_sim
        |  FROM shortlist sl
        |  JOIN emb q ON sl.query_id = q.vec_id
        |  JOIN emb v ON sl.vec_id = v.vec_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine_sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY cosine_sim DESC, vec_id) AS rank
        |  FROM rescored)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank,
        |       vec_id AS neighbor_id, cosine_sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "emb_near_dup" ->
      """WITH n AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
        |    round(list_sum(list_transform(range(1, len(a.emb) + 1),
        |        i -> a.emb[i] * b.emb[i])) / (a.nrm * b.nrm), 6) AS cosine_sim
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, label, cosine_sim
        |FROM pairs WHERE cosine_sim >= 0.3
        |ORDER BY vec_a, vec_b""".stripMargin,

    // ----------------------------------------------------------- events
    "ev_json_extract" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "ev_hourly_by_type" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "r_set_ops_all" ->
      """WITH open_o AS (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |urgent AS (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |both_ops AS (
        |  SELECT 'intersect_all' AS set_op, o_custkey
        |  FROM (SELECT o_custkey FROM open_o
        |        INTERSECT ALL SELECT o_custkey FROM urgent)
        |  UNION ALL
        |  SELECT 'except_all' AS set_op, o_custkey
        |  FROM (SELECT o_custkey FROM open_o
        |        EXCEPT ALL SELECT o_custkey FROM urgent))
        |SELECT set_op, o_custkey, count(*) AS multiplicity
        |FROM both_ops GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "r_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_price,
        |    CAST(count(*) AS DOUBLE) AS n_lines
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value
        |  FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', sum_price FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'n_lines', n_lines FROM wide
        |ORDER BY 1, 2""".stripMargin,

    "ev_variant_extract" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract(props, '$.missing') AS BIGINT) AS missing
        |FROM events ORDER BY event_id""".stripMargin,

    "ev_gap_fill" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |    sum(CAST(value AS DECIMAL(18,2))) AS hour_dec,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |spans AS (
        |  SELECT user_id, min(hour) AS first_hour, max(hour) AS last_hour
        |  FROM hourly GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(first_hour, last_hour,
        |    INTERVAL 1 HOUR)) AS hour
        |  FROM spans)
        |SELECT g.user_id, g.hour,
        |  COALESCE(h.n_events, 0) AS n_events,
        |  COALESCE(CAST(h.hour_dec AS DOUBLE), 0.0) AS hour_value,
        |  CAST(last_value(h.hour_dec IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS carried_value
        |FROM grid g
        |LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
        |ORDER BY 1, 2""".stripMargin,

    "ev_sessionize" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (
        |  SELECT *,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM e),
        |m AS (
        |  SELECT *,
        |    CASE WHEN prev_ts IS NULL THEN 1
        |         WHEN CAST(floor(epoch(ts)) AS BIGINT) -
        |              CAST(floor(epoch(prev_ts)) AS BIGINT) >= 1800 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM g),
        |s AS (
        |  SELECT *,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_seq
        |  FROM m)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ts) AS session_start,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) -
        |    CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_sec
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin,

    // Twin of Spark's native session_window: exact timestamp+interval
    // arithmetic (micros), unlike ev_sessionize's second-truncated
    // unix_timestamp convention — and the native merge rule is
    // touching-inclusive (split only when ts > prev + gap, strictly).
    // session_end = max(ts) + gap.
    "ev_session_native" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, seq
        |ORDER BY user_id, session_start""".stripMargin,

    // Interval-overlap twin: native session bounds vs top-5 busiest
    // hours, half-open overlap on exact micro timestamps.
    "ev_session_overlap" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM m),
        |sess AS (
        |  SELECT user_id, min(ts) AS session_start,
        |         max(ts) + INTERVAL 30 MINUTE AS session_end
        |  FROM s GROUP BY user_id, seq),
        |h AS (
        |  SELECT date_trunc('hour', ts) AS window_start, count(*) AS n
        |  FROM events GROUP BY 1),
        |top5 AS (
        |  SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end
        |  FROM h ORDER BY n DESC, window_start LIMIT 5)
        |SELECT window_start, count(*) AS n_sessions,
        |       count(DISTINCT user_id) AS n_users
        |FROM sess JOIN top5
        |  ON session_start < window_end AND window_start < session_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "ev_top_users" ->
      """SELECT user_id, count(*) AS n_events FROM events
        |GROUP BY 1 ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin,

    "ev_value_stats" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events),
        |med AS (
        |  SELECT event_type, value AS median_value
        |  FROM r WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)),
        |agg AS (
        |  SELECT event_type, count(*) AS n_events,
        |    min(value) AS min_value, max(value) AS max_value
        |  FROM events GROUP BY 1)
        |SELECT agg.event_type, n_events, min_value, max_value, median_value
        |FROM agg JOIN med USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // Window twin of the one-pass ExactQuantile aggregate. Rank rule is
    // integer arithmetic — GREATEST(1, (p·cnt + 99) // 100) — matching
    // the aggregate's ceil(p·n) without a float boundary. Ties share the
    // value, so which tied row ROW_NUMBER picks is immaterial.
    "ev_value_quantiles" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events)
        |SELECT event_type,
        |  max(CASE WHEN rn = GREATEST(1, (25 * cnt + 99) // 100) THEN value END) AS p25,
        |  max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100) THEN value END) AS p50,
        |  max(CASE WHEN rn = GREATEST(1, (75 * cnt + 99) // 100) THEN value END) AS p75,
        |  max(CASE WHEN rn = GREATEST(1, (95 * cnt + 99) // 100) THEN value END) AS p95
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // IQR fences from the same integer-rank quantiles; fence arithmetic
    // written in the identical expression shape as the Spark query so the
    // IEEE double results (and hence the outlier comparisons) agree bitwise.
    "ev_value_outliers" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events),
        |q AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = GREATEST(1, (25 * cnt + 99) // 100) THEN value END) AS p25,
        |    max(CASE WHEN rn = GREATEST(1, (75 * cnt + 99) // 100) THEN value END) AS p75
        |  FROM r GROUP BY event_type),
        |f AS (
        |  SELECT event_type,
        |    p25 - (p75 - p25) * 1.5 AS fence_lo,
        |    p75 + (p75 - p25) * 1.5 AS fence_hi
        |  FROM q)
        |SELECT e.event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN value < fence_lo OR value > fence_hi
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  max(fence_lo) AS fence_lo, max(fence_hi) AS fence_hi
        |FROM events e JOIN f USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // ------------------------------------------------------- multimodal
    "mm_media_stats" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
        |    (['jpeg','wav','mp4'])[CAST(doc_id % 3 AS INT) + 1] AS fmt,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents)
        |SELECT kind, fmt, count(*) AS n_media,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // payload bytes via hex pairs: b(i) = 16·hi + lo of hex digit values.
    // Integer-exact twin of Multimodal.featureHistogram (bucket = byte % 64,
    // zero buckets dropped).
    "mm_features" ->
      """WITH hx AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS h,
        |         octet_length(encode(text)) AS n
        |  FROM documents
        |), byteval AS (
        |  SELECT media_id,
        |         unnest(list_transform(range(1, n+1), i ->
        |           (strpos('123456789ABCDEF', substr(h, 2*i-1, 1))) * 16
        |         + (strpos('123456789ABCDEF', substr(h, 2*i, 1))))) AS b
        |  FROM hx
        |)
        |SELECT media_id, CAST(b % 64 AS INT) AS pos, count(*) AS cnt
        |FROM byteval GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Multimodal.audioEnergy stub twin: signed-8-bit-PCM energy per
    // 256-sample frame; silence is the integer cross-multiply
    // e < floor·n. Byte values decode unsigned here — identical to the
    // engine's signed read because the fixture payloads are ASCII (<128).
    "mm_audio_energy" ->
      """WITH hx AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS h,
        |         octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |byteval AS (
        |  SELECT media_id, unnest(list_transform(range(1, n+1), i ->
        |    {'pos': i,
        |     'b': (strpos('123456789ABCDEF', substr(h, 2*i-1, 1))) * 16
        |        + (strpos('123456789ABCDEF', substr(h, 2*i, 1)))})) AS x
        |  FROM hx),
        |frames AS (
        |  SELECT media_id, (x.pos - 1) // 256 AS frame,
        |         sum(x.b * x.b) AS e, count(*) AS n
        |  FROM byteval GROUP BY 1, 2),
        |agg AS (
        |  SELECT media_id, count(*) AS n_frames,
        |         sum(CASE WHEN e < 9600 * n THEN 1 ELSE 0 END) AS n_silent,
        |         sum(e) AS total_energy
        |  FROM frames GROUP BY 1)
        |SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,
        |       CAST(n_silent AS BIGINT) AS n_silent,
        |       CAST(total_energy AS BIGINT) AS total_energy
        |FROM agg ORDER BY media_id""".stripMargin,

    // Multimodal.imagePhash stub twin: bytes fold into 64 cells by
    // position mod 64; bit c set iff cell·64 > total (integer
    // cross-multiply). HUGEINT bit-build, then two's-complement fold to
    // signed BIGINT (DuckDB's ** returns DOUBLE — shifts stay exact).
    "mm_phash" ->
      s"""WITH $phashSigCtes
         |SELECT media_id, phash FROM sig ORDER BY media_id""".stripMargin,

    // Multimodal.phashPairs twin: same 4×16-bit banding + Hamming verify
    // as dedup_simhash_pairs, over the shared phash CTEs.
    "mm_phash_pairs" ->
      s"""WITH $phashPairsCtes
         |SELECT media_a, media_b, hamming FROM jpairs
         |ORDER BY 1, 2""".stripMargin,

    // Multimodal.phashClusters twin: min-label connected components over
    // the phash pairs (same recursive-reach formulation as dedup_clusters).
    "mm_phash_clusters" ->
      s"""WITH RECURSIVE $phashPairsCtes,
         |edges AS (
         |  SELECT media_a AS src, media_b AS dst FROM jpairs
         |  UNION SELECT media_b, media_a FROM jpairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (
         |  SELECT src AS media_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src)
         |SELECT cluster_id, count(*) AS n_members,
         |  array_to_string(list_sort(list(media_id)), ',') AS members
         |FROM lab GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    // Multimodal.decodeImages stub twin: Java-long polynomial byte fold
    // (h = 31·h + b mod 2^64, init 1125899906842597, final & Long.MaxValue)
    // via HUGEINT list_reduce; width/height are modular slices of the fold.
    "mm_decode_images" ->
      """WITH hx AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS h,
        |         octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id % 3 = 0
        |), folded AS (
        |  SELECT media_id, n,
        |    list_reduce(
        |      list_prepend(CAST(1125899906842597 AS HUGEINT),
        |        list_transform(range(1, n+1), i ->
        |          CAST((strpos('123456789ABCDEF', substr(h, 2*i-1, 1))) * 16
        |             + (strpos('123456789ABCDEF', substr(h, 2*i, 1))) AS HUGEINT))),
        |      (acc, b) -> (31*acc + b) % 18446744073709551616) AS acc
        |  FROM hx
        |)
        |SELECT media_id,
        |  CAST(64 + (acc % 9223372036854775808) % 1024 AS INT) AS width,
        |  CAST(64 + ((acc % 9223372036854775808) // 1024) % 1024 AS INT) AS height,
        |  3 AS n_channels, CAST(n AS BIGINT) AS n_bytes
        |FROM folded ORDER BY media_id""".stripMargin,

    // Multimodal.resizeImages stub twin: nearest-neighbor byte resample
    // onto the 32×32 grid — out[j] = src[(j*n)//1024] — then the same
    // 31·acc+b fold the engine's byteFold applies, verifying the actual
    // resampled bytes
    "mm_resize" ->
      """WITH hx AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS h,
        |         octet_length(encode(text)) AS n
        |  FROM documents
        |  WHERE doc_id % 3 = 0 AND octet_length(encode(text)) > 0
        |), folded AS (
        |  SELECT media_id, n,
        |    list_reduce(
        |      list_prepend(CAST(1125899906842597 AS HUGEINT),
        |        list_transform(range(0, 1024), j ->
        |          CAST((strpos('123456789ABCDEF',
        |                  substr(h, 2*((j*n)//1024)+1, 1))) * 16
        |             + (strpos('123456789ABCDEF',
        |                  substr(h, 2*((j*n)//1024)+2, 1))) AS HUGEINT))),
        |      (acc, b) -> (31*acc + b) % 18446744073709551616) AS acc
        |  FROM hx)
        |SELECT media_id, CAST(n AS BIGINT) AS src_bytes,
        |  CAST(32 AS INT) AS out_w, CAST(32 AS INT) AS out_h,
        |  CAST(1024 AS BIGINT) AS out_bytes,
        |  CAST(acc % 9223372036854775808 AS BIGINT) AS checksum
        |FROM folded ORDER BY media_id""".stripMargin,

    // Multimodal.sampleFrameStats stub twin: every 4th 256-byte block of
    // video payloads, sliced from the hex string (2 hex chars per byte)
    // and folded with the engine's byteFold (31·acc+b mod 2^64, init
    // 1125899906842597, final mod 2^63) — scalars only, because the
    // driver gate cannot hash-compare a binary column.
    "mm_sample_frames" ->
      """WITH vid AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS h,
        |         octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id % 3 = 2
        |), frames AS (
        |  SELECT media_id, h, n,
        |         CAST(unnest(range(0, greatest(1, n // 256), 4)) AS BIGINT)
        |           AS frame_idx
        |  FROM vid
        |), bounds AS (
        |  SELECT media_id, h, frame_idx,
        |         frame_idx * 256 AS f, least(n, frame_idx * 256 + 256) AS u
        |  FROM frames
        |), folded AS (
        |  SELECT media_id, frame_idx, u - f AS frame_len,
        |    list_reduce(
        |      list_prepend(CAST(1125899906842597 AS HUGEINT),
        |        list_transform(range(f + 1, u + 1), i ->
        |          CAST((strpos('123456789ABCDEF',
        |                  substr(h, CAST(2*i-1 AS INT), 1))) * 16
        |             + (strpos('123456789ABCDEF',
        |                  substr(h, CAST(2*i AS INT), 1))) AS HUGEINT))),
        |      (acc, b) -> (31*acc + b) % 18446744073709551616) AS acc
        |  FROM bounds
        |)
        |SELECT media_id, frame_idx, CAST(frame_len AS BIGINT) AS frame_len,
        |       CAST(acc % 9223372036854775808 AS BIGINT) AS checksum
        |FROM folded ORDER BY media_id, frame_idx""".stripMargin,

    // Multimodal.sceneDetect twin: same stride-1 frame slices, exact
    // byte sums recovered from the hex payload, same one-division luma,
    // lag delta, and threshold flag (first frame opens a scene).
    "mm_scene_detect" ->
      """WITH vid AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS h,
        |         octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id % 3 = 2
        |), frames AS (
        |  SELECT media_id, h, n,
        |         CAST(unnest(range(0, greatest(1, n // 256), 1)) AS BIGINT)
        |           AS frame_idx
        |  FROM vid
        |), bounds AS (
        |  SELECT media_id, h, frame_idx,
        |         frame_idx * 256 AS f, least(n, frame_idx * 256 + 256) AS u
        |  FROM frames
        |), summed AS (
        |  SELECT media_id, frame_idx, u - f AS frame_len,
        |    list_sum(list_transform(range(f + 1, u + 1), i ->
        |      (strpos('123456789ABCDEF',
        |         substr(h, CAST(2*i-1 AS INT), 1))) * 16
        |      + (strpos('123456789ABCDEF',
        |          substr(h, CAST(2*i AS INT), 1))))) AS byte_sum
        |  FROM bounds
        |), luma AS (
        |  SELECT media_id, frame_idx,
        |    CAST(byte_sum AS DOUBLE) / CAST(frame_len AS DOUBLE) AS luma
        |  FROM summed
        |), lagged AS (
        |  SELECT media_id, frame_idx, luma,
        |    abs(luma - lag(luma, 1) OVER (PARTITION BY media_id
        |      ORDER BY frame_idx)) AS delta
        |  FROM luma)
        |SELECT media_id, frame_idx, luma, delta,
        |  COALESCE(delta > 1.0, TRUE) AS is_cut
        |FROM lagged ORDER BY media_id, frame_idx""".stripMargin,

    // ------------------------------------------------------- relational
    "r_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN
        |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "r_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS
        |  (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "r_outer_counts" ->
      """SELECT n_name, count(DISTINCT c_custkey) AS n_customers,
        |  count(o_orderkey) AS n_orders
        |FROM nation
        |LEFT JOIN customer ON n_nationkey = c_nationkey
        |LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "r_set_ops" ->
      """WITH rich AS (
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        |active AS (
        |  SELECT o_custkey AS c_custkey FROM orders
        |  WHERE o_orderstatus = 'O')
        |SELECT c_custkey, 'union' AS set_op FROM
        |  (SELECT c_custkey FROM rich UNION SELECT c_custkey FROM active)
        |UNION ALL
        |SELECT c_custkey, 'intersect' FROM
        |  (SELECT c_custkey FROM rich INTERSECT SELECT c_custkey FROM active)
        |UNION ALL
        |SELECT c_custkey, 'except' FROM
        |  (SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM active)
        |ORDER BY set_op, c_custkey""".stripMargin,

    "r_explode_words" ->
      """SELECT word, count(*) AS n FROM
        |  (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY 1 ORDER BY n DESC, word""".stripMargin,

    "r_rollup" ->
      """SELECT n_name, o_orderpriority, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderpriority)
        |ORDER BY n_name ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,

    "r_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "r_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,

    "r_window_funcs" ->
      """WITH w AS (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(rank() OVER win AS BIGINT) AS rnk,
        |    CAST(dense_rank() OVER win AS BIGINT) AS drnk,
        |    percent_rank() OVER win AS prnk,
        |    cume_dist() OVER win AS cdist,
        |    lag(c_acctbal, 1) OVER win AS prev_bal,
        |    lead(c_acctbal, 1) OVER win AS next_bal,
        |    CAST(ntile(4) OVER win AS BIGINT) AS quartile,
        |    first_value(c_acctbal) OVER win AS seg_top_bal,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
        |      OVER (win ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) AS running_sum
        |  FROM customer
        |  WINDOW win AS (PARTITION BY c_mktsegment
        |                 ORDER BY c_acctbal DESC, c_custkey))
        |SELECT * FROM w WHERE rnk <= 10
        |ORDER BY c_mktsegment, rnk""".stripMargin,

    "r_offset_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 5 OFFSET 100""".stripMargin,

    // the oracle states the range join declaratively (BETWEEN join) —
    // the engine's binned formulation must produce identical results
    "r_range_join" ->
      """WITH ship AS (
        |  SELECT DISTINCT CAST(l_shipdate AS DATE) AS d
        |  FROM lineitem),
        |o AS (SELECT CAST(o_orderdate AS DATE) AS s FROM orders)
        |SELECT CAST(d AS TIMESTAMP) AS ship_date, count(*) AS n_covering
        |FROM ship JOIN o ON d >= s AND d <= s + 6
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // both engines' HLL sketches differ in VALUE but share the PROMISE:
    // approx within a small relative error of exact — that promise plus
    // the exact counts is the hash-comparable contract
    "r_approx_distinct_bound" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS exact_customers,
        |  abs(approx_count_distinct(o_custkey)
        |      - count(DISTINCT o_custkey))
        |    <= count(DISTINCT o_custkey) * 0.2 AS within_bound
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "r_salted_join" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ev_asof_purchase" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |  max(CASE WHEN event_type = 'purchase'
        |           THEN CAST(ts AS TIMESTAMP) END)
        |    OVER (PARTITION BY user_id
        |          ORDER BY CAST(ts AS TIMESTAMP), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS last_purchase_ts
        |FROM events ORDER BY event_id""".stripMargin,

    "ev_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_ts
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT e.user_id,
        |    datediff('day', DATE '1970-01-01',
        |             CAST(CAST(f.first_ts AS TIMESTAMP) AS DATE)) // 7
        |      AS cohort_week,
        |    datediff('day', DATE '1970-01-01',
        |             CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) // 7
        |    - datediff('day', DATE '1970-01-01',
        |               CAST(CAST(f.first_ts AS TIMESTAMP) AS DATE)) // 7
        |      AS weeks_since
        |  FROM events e JOIN f USING (user_id))
        |SELECT cohort_week, weeks_since,
        |       count(DISTINCT user_id) AS n_active
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "txt_sample_stratified" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 100
        |      AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE bucket < CASE WHEN lang = 'en' THEN 20 ELSE 50 END
        |ORDER BY doc_id""".stripMargin,

    "ev_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > t1
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > t2
        |  GROUP BY 1)
        |SELECT stage, count(*) AS n_users FROM (
        |  SELECT '1_view' AS stage, user_id FROM s1
        |  UNION ALL SELECT '2_click', user_id FROM s2
        |  UNION ALL SELECT '3_purchase', user_id FROM s3)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN is the declarative statement of the
    // engine's union-trick two-table as-of join
    "ev_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.ts,
        |       p.ts AS last_purchase_ts, p.value AS last_purchase_value
        |FROM clicks c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    // identical contract through the native AsOfJoinExec operator
    "ev_asof_native" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.ts,
        |       p.ts AS last_purchase_ts, p.value AS last_purchase_value
        |FROM clicks c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "r_scalar_subquery" ->
      """SELECT c1.c_custkey, c1.c_nationkey, c1.c_acctbal
        |FROM customer c1
        |WHERE c1.c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
        |                      WHERE c2.c_nationkey = c1.c_nationkey)
        |ORDER BY c1.c_custkey""".stripMargin,

    "r_exists_subquery" ->
      """SELECT c_custkey, c_nationkey, c_acctbal
        |FROM customer c1
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c1.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c1.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "r_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |       count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority),
        |                        (o_orderstatus),
        |                        (o_orderpriority, o_orderstatus),
        |                        ())
        |ORDER BY g_prio, g_status, o_orderpriority, o_orderstatus""".stripMargin,

    "ev_moving_stats" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS mov_sum,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mov_n,
        |  max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mov_max
        |FROM events ORDER BY event_id""".stripMargin,

    // Time-range frame twin: trailing-hour window over epoch seconds
    // (floor(epoch) matches Spark's timestamp→long truncation).
    "ev_moving_range" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS rng_sum,
        |  count(*) OVER w AS rng_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "r_pivot" ->
      """SELECT n_name,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
        |    AS "1-URGENT",
        |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
        |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
        |    AS "4-NOT SPECIFIED",
        |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // ---- multi-way join analytics (ops/Analytics) ----
    // Money sums are computed in DECIMAL(18,2) exactly as the engine does,
    // surfaced as doubles only at the end — hash-stable under any
    // aggregation order.

    "r_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "r_local_supplier_volume" ->
      """SELECT n_name AS nation,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |             AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, nation""".stripMargin,

    "r_late_lines" ->
      """SELECT o_orderpriority AS priority,
        |  CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |      THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
        |  count(*) AS total_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "r_promo_revenue" ->
      """SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS total_revenue,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "r_revenue_by_tier" ->
      """SELECT
        |  CASE WHEN c_acctbal < 0 THEN 'negative'
        |       WHEN c_acctbal < 5000 THEN 'standard'
        |       ELSE 'premium' END AS tier,
        |  o_orderstatus,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "r_lateral_topn" ->
      """SELECT n_name, c.c_name, c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin,

    // ---- classic decision-support shapes (TPC-H Q13/Q18/Q19/Q17/Q15/
    // Q16/Q11 analogues over this schema) ----

    "r_order_count_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "r_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty_d
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) >
        |         CAST(200 AS DECIMAL(18,2)))
        |SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(total_qty_d AS DOUBLE) AS total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "r_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "r_small_qty_revenue" ->
      """WITH lp AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#7'),
        |stats AS (
        |  SELECT l_partkey AS agg_partkey,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |         count(*) AS cnt
        |  FROM lp GROUP BY 1)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0
        |    AS DOUBLE) AS avg_yearly
        |FROM lp JOIN stats ON l_partkey = agg_partkey
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty""".stripMargin,

    "r_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |      AS total_rev_d
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_rev_d AS DOUBLE) AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_d = (SELECT max(total_rev_d) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "r_supplier_part_counts" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_partkey, l_suppkey
        |  FROM lineitem
        |  WHERE l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM pairs JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'PROMO'
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "r_important_stock" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        CAST(l_quantity AS DECIMAL(18,2))) AS part_value_d
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT sum(part_value_d) AS total_value,
        |             count(*) AS n_parts FROM per_part)
        |SELECT l_partkey AS p_partkey,
        |       CAST(part_value_d AS DOUBLE) AS part_value
        |FROM per_part
        |WHERE part_value_d * (SELECT n_parts FROM g) * 4 >
        |      (SELECT total_value FROM g) * 5
        |ORDER BY part_value DESC, p_partkey""".stripMargin,

    // ----------------------------------------------------- round 4 ops

    // TextOps.gopherRules twin: same tokenization, same per-rule
    // thresholds; ratios are int-over-int double divisions in both
    // engines (IEEE-exact).
    "txt_gopher_rules" ->
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    ${toksSql("text")} AS toks,
         |    list_transform(${toksSql("text")},
         |      t -> regexp_replace(lower(t), '^[^a-z]+|[^a-z]+$$', '', 'g'))
         |      AS ltoks,
         |    string_split(text, chr(10)) AS lines
         |  FROM documents),
         |sig AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
         |      AS BIGINT) AS sum_len,
         |    CAST(len(lines) AS BIGINT) AS n_lines,
         |    CAST(len(list_filter(lines,
         |      l -> regexp_matches(trim(l), '^[-*•]'))) AS BIGINT) AS n_bullet,
         |    CAST(len(list_filter(lines,
         |      l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$$')))
         |      AS BIGINT) AS n_ell,
         |    CAST(len(list_filter(toks,
         |      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha_w,
         |    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…'))
         |      AS BIGINT) AS n_sym,
         |    CAST((CASE WHEN list_contains(ltoks, 'the') THEN 1 ELSE 0 END)
         |       + (CASE WHEN list_contains(ltoks, 'be') THEN 1 ELSE 0 END)
         |       + (CASE WHEN list_contains(ltoks, 'to') THEN 1 ELSE 0 END)
         |       + (CASE WHEN list_contains(ltoks, 'of') THEN 1 ELSE 0 END)
         |       + (CASE WHEN list_contains(ltoks, 'and') THEN 1 ELSE 0 END)
         |       + (CASE WHEN list_contains(ltoks, 'that') THEN 1 ELSE 0 END)
         |       + (CASE WHEN list_contains(ltoks, 'have') THEN 1 ELSE 0 END)
         |       + (CASE WHEN list_contains(ltoks, 'with') THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_stop_kinds
         |  FROM base),
         |q AS (
         |  SELECT doc_id, n_words,
         |    CAST(sum_len AS DOUBLE) / greatest(n_words, 1) AS mean_word_len,
         |    CAST(n_sym AS DOUBLE) / greatest(n_words, 1) AS symbol_ratio,
         |    CAST(n_bullet AS DOUBLE) / greatest(n_lines, 1)
         |      AS bullet_line_ratio,
         |    CAST(n_ell AS DOUBLE) / greatest(n_lines, 1)
         |      AS ellipsis_line_ratio,
         |    CAST(n_alpha_w AS DOUBLE) / greatest(n_words, 1)
         |      AS alpha_word_ratio,
         |    n_stop_kinds
         |  FROM sig)
         |SELECT *,
         |  (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
         |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
         |    AS rule_mean_word_len,
         |  (symbol_ratio <= 0.1) AS rule_symbol_ratio,
         |  (bullet_line_ratio <= 0.9) AS rule_bullet_lines,
         |  (ellipsis_line_ratio <= 0.3) AS rule_ellipsis_lines,
         |  (alpha_word_ratio >= 0.8) AS rule_alpha_words,
         |  (n_stop_kinds >= 2) AS rule_stop_words,
         |  (n_words >= 50 AND n_words <= 100000
         |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |   AND symbol_ratio <= 0.1 AND bullet_line_ratio <= 0.9
         |   AND ellipsis_line_ratio <= 0.3 AND alpha_word_ratio >= 0.8
         |   AND n_stop_kinds >= 2) AS keep
         |FROM q ORDER BY doc_id""".stripMargin,

    // TextOps.c4Rules twin: same line predicate (terminal punctuation,
    // >=5 tokens, no "javascript"), same page rules, list ops mirrored
    // HOF-for-HOF.
    "txt_c4_rules" ->
      s"""WITH base AS (
         |  SELECT doc_id, text, string_split(text, chr(10)) AS lines
         |  FROM documents),
         |k AS (
         |  SELECT doc_id, text, lines,
         |    list_filter(lines, l ->
         |      regexp_matches(rtrim(l), '[.!?"]$$')
         |      AND len(${toksSql("l")}) >= 5
         |      AND NOT contains(lower(l), 'javascript')) AS kept
         |  FROM base),
         |c AS (
         |  SELECT doc_id, text, lines, kept,
         |    coalesce(array_to_string(kept, chr(10)), '') AS clean
         |  FROM k),
         |sig AS (
         |  SELECT doc_id,
         |    CAST(len(lines) AS BIGINT) AS n_lines,
         |    CAST(len(kept) AS BIGINT) AS n_kept_lines,
         |    CAST(length(clean) AS BIGINT) AS clean_len,
         |    CAST(len(regexp_extract_all(clean, '[.!?]')) AS BIGINT)
         |      AS n_sentences,
         |    contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
         |    contains(text, '{') AS has_brace
         |  FROM c)
         |SELECT *,
         |  (n_kept_lines >= 1 AND n_sentences >= 3
         |   AND NOT has_lorem_ipsum AND NOT has_brace) AS keep
         |FROM sig ORDER BY doc_id""".stripMargin,

    // TextOps.dsirWeights twin: add-one-smoothed unigram target/raw log
    // ratio, target = the lang='en' slice, per-(doc, term) contribution
    // rounded DECIMAL(24,9) before the exact decimal sum (lmScore
    // discipline), quotient surfaced as double once.
    "txt_dsir_weights" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS term
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |target AS (
         |  SELECT doc_id FROM documents WHERE lang = 'en'),
         |rawct AS (
         |  SELECT term, CAST(sum(tf) AS BIGINT) AS rct FROM tf GROUP BY 1),
         |tgtct AS (
         |  SELECT term, CAST(sum(tf) AS BIGINT) AS tct FROM tf
         |  WHERE doc_id IN (SELECT doc_id FROM target) GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(rct) AS BIGINT) AS r_total,
         |    CAST(count(*) AS BIGINT) AS v FROM rawct),
         |ttot AS (
         |  SELECT CAST(coalesce(sum(tf), 0) AS BIGINT) AS t_total FROM tf
         |  WHERE doc_id IN (SELECT doc_id FROM target)),
         |lr AS (
         |  SELECT r.term,
         |    ln((CAST(coalesce(g.tct, 0) + 1 AS DOUBLE)
         |          / CAST(ttot.t_total + tot.v AS DOUBLE))
         |       / (CAST(r.rct + 1 AS DOUBLE)
         |          / CAST(tot.r_total + tot.v AS DOUBLE))) AS lratio
         |  FROM rawct r LEFT JOIN tgtct g ON r.term = g.term
         |  CROSS JOIN tot CROSS JOIN ttot),
         |per AS (
         |  SELECT tf.doc_id,
         |    CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         |    sum(CAST(tf.tf * lr.lratio AS DECIMAL(24,9))) AS sum_lr
         |  FROM tf JOIN lr ON tf.term = lr.term
         |  GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  CAST(sum_lr AS DOUBLE) / n_tokens AS avg_log_ratio,
         |  (CAST(sum_lr AS DOUBLE) / n_tokens > 0.0) AS selected
         |FROM per ORDER BY doc_id""".stripMargin,

    // TextOps.dsirWeightsHashed twin: identical xxhash64 (Xxh64Sql, 2
    // stripe levels — tokens are far under the 95-byte bound) bucketed
    // mod 65536 (a power of two, so unsigned u64 mod == the engine's
    // signed pmod), then the exact-DSIR arithmetic over bucket keys.
    "txt_dsir_hashed" -> {
      val tokBase = "(SELECT doc_id, unnest(" + toksSql("lower(text)") +
        ") AS tok FROM documents)"
      s"""WITH ${Xxh64Sql.chain(tokBase, "tok", 2, "th")},
         |tf AS (
         |  SELECT doc_id, CAST(th_u % 65536 AS BIGINT) AS b,
         |    count(*) AS tf
         |  FROM th GROUP BY 1, 2),
         |target AS (
         |  SELECT doc_id FROM documents WHERE lang = 'en'),
         |rawct AS (
         |  SELECT b, CAST(sum(tf) AS BIGINT) AS rct FROM tf GROUP BY 1),
         |tgtct AS (
         |  SELECT b, CAST(sum(tf) AS BIGINT) AS tct FROM tf
         |  WHERE doc_id IN (SELECT doc_id FROM target) GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(rct) AS BIGINT) AS r_total,
         |    CAST(count(*) AS BIGINT) AS v FROM rawct),
         |ttot AS (
         |  SELECT CAST(coalesce(sum(tf), 0) AS BIGINT) AS t_total FROM tf
         |  WHERE doc_id IN (SELECT doc_id FROM target)),
         |lr AS (
         |  SELECT r.b,
         |    ln((CAST(coalesce(g.tct, 0) + 1 AS DOUBLE)
         |          / CAST(ttot.t_total + tot.v AS DOUBLE))
         |       / (CAST(r.rct + 1 AS DOUBLE)
         |          / CAST(tot.r_total + tot.v AS DOUBLE))) AS lratio
         |  FROM rawct r LEFT JOIN tgtct g ON r.b = g.b
         |  CROSS JOIN tot CROSS JOIN ttot),
         |per AS (
         |  SELECT tf.doc_id,
         |    CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         |    sum(CAST(tf.tf * lr.lratio AS DECIMAL(24,9))) AS sum_lr
         |  FROM tf JOIN lr ON tf.b = lr.b
         |  GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  CAST(sum_lr AS DOUBLE) / n_tokens AS avg_log_ratio,
         |  (CAST(sum_lr AS DOUBLE) / n_tokens > 0.0) AS selected
         |FROM per ORDER BY doc_id""".stripMargin
    },

    // TextOps.fertility twin: whitespace words vs the BPE-ish subword
    // regex, summed per language; one exact long/long double division.
    "txt_fertility" ->
      s"""WITH per AS (
         |  SELECT lang,
         |    CAST(len(${toksSql("text")}) AS BIGINT) AS w,
         |    CAST(len(regexp_extract_all(text,
         |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS sw
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(w) AS BIGINT) AS n_words,
         |  CAST(sum(sw) AS BIGINT) AS n_subwords,
         |  CAST(sum(sw) AS DOUBLE) / greatest(CAST(sum(w) AS BIGINT), 1)
         |    AS fertility
         |FROM per GROUP BY lang ORDER BY lang""".stripMargin,

    // TextOps.unimaxBudget twin (maxEpochs=4, budget=total div 2): the
    // sequential waterfall as a recursive CTE over capacity-ascending
    // rank — each step takes min(cap, floor(remaining / langs_left)),
    // the identical long->double->floor arithmetic as the engine's
    // aggregate() fold.
    "txt_unimax_budget" ->
      s"""WITH RECURSIVE pl AS (
         |  SELECT lang,
         |    CAST(sum(len(${toksSql("text")})) AS BIGINT) AS toks
         |  FROM documents GROUP BY lang),
         |par AS (
         |  SELECT CAST(sum(toks) AS BIGINT) // 2 AS budget,
         |    count(*) AS nl FROM pl),
         |ord AS (
         |  SELECT lang, toks, toks * 4 AS cap,
         |    row_number() OVER (ORDER BY toks * 4, lang) AS rk
         |  FROM pl),
         |alloc(rk, lang, toks, cap, a, rem_after) AS (
         |  SELECT o.rk, o.lang, o.toks, o.cap,
         |    least(o.cap, CAST(floor(p.budget / p.nl) AS BIGINT)),
         |    p.budget
         |      - least(o.cap, CAST(floor(p.budget / p.nl) AS BIGINT))
         |  FROM ord o, par p WHERE o.rk = 1
         |  UNION ALL
         |  SELECT o.rk, o.lang, o.toks, o.cap,
         |    least(o.cap,
         |      CAST(floor(prev.rem_after / (p.nl - o.rk + 1)) AS BIGINT)),
         |    prev.rem_after - least(o.cap,
         |      CAST(floor(prev.rem_after / (p.nl - o.rk + 1)) AS BIGINT))
         |  FROM alloc prev, ord o, par p WHERE o.rk = prev.rk + 1)
         |SELECT lang, toks AS n_tokens, cap, a AS alloc,
         |  CASE WHEN toks > 0 THEN a / toks ELSE 0.0 END AS epochs
         |FROM alloc ORDER BY lang""".stripMargin,

    // TextOps.ccnetBuckets twin: lmScore's CTE chain, then a per-language
    // ntile(3) tercile cut (avg_logprob DESC, doc_id tiebreak) and a
    // DECIMAL-stabilized bucket mean.
    "txt_ccnet_buckets" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS term
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |ctf AS (SELECT term, sum(tf) AS ctf FROM tf GROUP BY 1),
         |tot AS (SELECT sum(tf) AS t_total FROM tf),
         |lp AS (
         |  SELECT doc_id, tf,
         |    CAST(tf * ln(CAST(ctf AS DOUBLE) / CAST(t_total AS DOUBLE))
         |      AS DECIMAL(24,9)) AS lp
         |  FROM tf JOIN ctf USING (term) CROSS JOIN tot),
         |doc AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |    sum(lp) AS sum_lp,
         |    CAST(sum(lp) AS DOUBLE) / CAST(sum(tf) AS BIGINT) AS avg_logprob
         |  FROM lp GROUP BY 1),
         |scored AS (
         |  SELECT dd.lang, d.n_tokens, d.sum_lp,
         |    ntile(3) OVER (PARTITION BY dd.lang
         |                   ORDER BY d.avg_logprob DESC, d.doc_id) AS tile
         |  FROM doc d JOIN documents dd USING (doc_id)),
         |b AS (
         |  SELECT lang,
         |    CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |              ELSE 'tail' END AS bucket,
         |    n_tokens, sum_lp
         |  FROM scored)
         |SELECT lang, bucket, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(sum_lp) AS DOUBLE)
         |    / CAST(sum(n_tokens) AS BIGINT) AS mean_logprob
         |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,

    // SimilarityOps.clusterProfile twin: the seeded-IVF assignment CTE
    // (centroids = first 10 corpus vectors verbatim, nearest by cosine
    // with cell-asc tiebreak), then per-cell count and min/mean/max of
    // the 1e-6-rounded cosine (DECIMAL sum, one double division).
    "emb_cluster_profile" ->
      """WITH emb AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 10),
        |sims AS (
        |  SELECT v.vec_id, c.cell,
        |    list_sum(list_transform(range(1, len(v.e) + 1),
        |      i -> v.e[i] * c.ce[i])) /
        |    (sqrt(list_sum(list_transform(v.e, x -> x * x))) *
        |     sqrt(list_sum(list_transform(c.ce, x -> x * x)))) AS sim
        |  FROM emb v CROSS JOIN cent c),
        |assign AS (
        |  SELECT vec_id, cell, sim FROM (
        |    SELECT vec_id, cell, sim,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY sim DESC, cell) AS rn
        |    FROM sims) WHERE rn = 1),
        |r AS (
        |  SELECT cell, round(sim, 6) AS sim_r,
        |    CAST(round(sim, 6) AS DECIMAL(10,6)) AS sim_d
        |  FROM assign)
        |SELECT CAST(cell AS BIGINT) AS cell, count(*) AS n_vectors,
        |  CAST(sum(sim_d) AS DOUBLE) / count(*) AS mean_sim,
        |  min(sim_r) AS min_sim, max(sim_r) AS max_sim
        |FROM r GROUP BY cell ORDER BY cell""".stripMargin,

    // SimilarityOps.semanticDedup twin: same assignment CTE, then the
    // in-cell pair join and the greedy-by-id drop (v dropped iff SOME
    // lower-id cell-mate has rounded cosine >= threshold).
    "emb_semantic_dedup" ->
      """WITH emb AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 10),
        |sims AS (
        |  SELECT v.vec_id, c.cell,
        |    list_sum(list_transform(range(1, len(v.e) + 1),
        |      i -> v.e[i] * c.ce[i])) /
        |    (sqrt(list_sum(list_transform(v.e, x -> x * x))) *
        |     sqrt(list_sum(list_transform(c.ce, x -> x * x)))) AS sim
        |  FROM emb v CROSS JOIN cent c),
        |assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY sim DESC, cell) AS rn
        |    FROM sims) WHERE rn = 1),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM assign a JOIN assign b ON a.cell = b.cell
        |    AND a.vec_id < b.vec_id
        |  JOIN emb va ON a.vec_id = va.vec_id
        |  JOIN emb vb ON b.vec_id = vb.vec_id
        |  WHERE round(
        |      list_sum(list_transform(range(1, len(va.e) + 1),
        |        i -> va.e[i] * vb.e[i])) /
        |      (sqrt(list_sum(list_transform(va.e, x -> x * x))) *
        |       sqrt(list_sum(list_transform(vb.e, x -> x * x)))), 6)
        |    >= 0.4)
        |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell
        |FROM assign a
        |WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
        |ORDER BY a.vec_id""".stripMargin,

    // TextOps.weightedSample twin: Efraimidis–Spirakis priority with the
    // content-hash bucket standing in for the uniform key; one integer
    // division, smallest-k, doc_id tiebreak.
    "txt_weighted_sample" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    greatest(CAST(len(${toksSql("text")}) AS BIGINT), 1) AS weight,
         |    CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 10000
         |      AS bucket
         |  FROM documents)
         |SELECT doc_id, weight, (bucket * 1000000) // weight AS priority
         |FROM w ORDER BY priority, doc_id LIMIT 100""".stripMargin,

    // TextOps.curriculum twin: exact p25/p50/p75 length cutoffs via the
    // same integer rank rule as ExactQuantiles ((p·n + 99) div 100),
    // phase by threshold comparison, within-(phase, shard) row_number
    // over the content-hash order.
    "txt_curriculum" ->
      """WITH r AS (
        |  SELECT n_chars,
        |    ROW_NUMBER() OVER (ORDER BY n_chars) AS rn,
        |    COUNT(*) OVER () AS cnt
        |  FROM documents),
        |cuts AS (
        |  SELECT
        |    max(CASE WHEN rn = GREATEST(1, (25 * cnt + 99) // 100)
        |        THEN CAST(n_chars AS DOUBLE) END) AS c25,
        |    max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100)
        |        THEN CAST(n_chars AS DOUBLE) END) AS c50,
        |    max(CASE WHEN rn = GREATEST(1, (75 * cnt + 99) // 100)
        |        THEN CAST(n_chars AS DOUBLE) END) AS c75
        |  FROM r),
        |p AS (
        |  SELECT doc_id,
        |    1 + CASE WHEN n_chars > c25 THEN 1 ELSE 0 END
        |      + CASE WHEN n_chars > c50 THEN 1 ELSE 0 END
        |      + CASE WHEN n_chars > c75 THEN 1 ELSE 0 END AS phase,
        |    CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS bucket
        |  FROM documents CROSS JOIN cuts)
        |SELECT doc_id, phase, CAST(bucket % 8 AS INT) AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY phase, bucket % 8
        |                          ORDER BY bucket, doc_id) AS INT) AS ord
        |FROM p ORDER BY phase, shard, ord""".stripMargin,

    // TextOps.classifierScore twin: the identical 16-bit md5 feature
    // hash and [-100, 100] pseudo-weight per token, integer sum, one
    // exact double division.
    "txt_classifier_score" ->
      s"""WITH per AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(coalesce(list_sum(list_transform(toks, tk ->
         |      CAST(concat('0x', substr(md5(tk), 1, 4)) AS BIGINT)
         |        % 201 - 100)), 0) AS BIGINT) AS raw_score
         |  FROM (SELECT doc_id, ${toksSql("lower(text)")} AS toks
         |        FROM documents))
         |SELECT doc_id, n_tokens, raw_score,
         |  CAST(raw_score AS DOUBLE) / greatest(n_tokens, 1) AS score,
         |  CAST(raw_score AS DOUBLE) / greatest(n_tokens, 1) > 0 AS keep
         |FROM per ORDER BY doc_id""".stripMargin,

    // CorpusOps.corpusDatasheet twin: one grouped scan, distinct
    // fingerprints/langs, exactly-rounded double divisions.
    "corpus_datasheet" ->
      s"""SELECT source, count(*) AS n_docs,
         |  CAST(sum(w) AS BIGINT) AS n_tokens,
         |  count(DISTINCT fp) AS n_distinct,
         |  count(DISTINCT lang) AS n_langs,
         |  CAST(1 AS DOUBLE)
         |    - CAST(count(DISTINCT fp) AS DOUBLE) / count(*) AS dup_rate,
         |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars
         |FROM (SELECT source, lang, n_chars,
         |        CAST(len(${toksSql("text")}) AS BIGINT) AS w,
         |        md5(text) AS fp
         |      FROM documents)
         |GROUP BY source ORDER BY source""".stripMargin,

    // CorpusOps.corpusDiff twin: reconstruct the derived v2 snapshot,
    // full outer join on doc_id, classify by md5 fingerprint.
    "corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END
        |      AS text
        |  FROM v1 WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT -doc_id - 1 AS doc_id, text
        |  FROM v1 WHERE doc_id % 11 = 0),
        |a AS (SELECT doc_id, md5(text) AS fp1 FROM v1),
        |b AS (SELECT doc_id, md5(text) AS fp2 FROM v2),
        |j AS (
        |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, fp1, fp2
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT doc_id,
        |  CASE WHEN fp1 IS NULL THEN 'added'
        |       WHEN fp2 IS NULL THEN 'removed'
        |       WHEN fp1 <> fp2 THEN 'changed' END AS change
        |FROM j
        |WHERE (CASE WHEN fp1 IS NULL THEN 'added'
        |            WHEN fp2 IS NULL THEN 'removed'
        |            WHEN fp1 <> fp2 THEN 'changed' END) IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // Relational.bloomSemiJoin twin: the Bloom prefilter has no false
    // negatives and the exact semi-join removes its false positives, so
    // the oracle is the plain semi-join aggregate.
    "r_bloom_join" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Relational.bucketedJoinAgg twin: bucketing is pure storage layout,
    // never semantics — the oracle is the plain join aggregate.
    "r_bucketed_join" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // EventOps.grainRollup twin: the same minute→hour→day re-aggregation
    // ladder over DECIMAL partials, doubles only at the edge.
    "ev_grain_rollup" ->
      """WITH minute AS (
        |  SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS bucket_ts,
        |    count(*) AS n_events,
        |    sum(CAST(value AS DECIMAL(18,2))) AS dec_v
        |  FROM events GROUP BY 1),
        |hour AS (
        |  SELECT date_trunc('hour', bucket_ts) AS bucket_ts,
        |    CAST(sum(n_events) AS BIGINT) AS n_events,
        |    sum(dec_v) AS dec_v
        |  FROM minute GROUP BY 1),
        |day AS (
        |  SELECT date_trunc('day', bucket_ts) AS bucket_ts,
        |    CAST(sum(n_events) AS BIGINT) AS n_events,
        |    sum(dec_v) AS dec_v
        |  FROM hour GROUP BY 1)
        |SELECT 'minute' AS grain, bucket_ts, n_events,
        |  CAST(dec_v AS DOUBLE) AS sum_value FROM minute
        |UNION ALL SELECT 'hour', bucket_ts, n_events,
        |  CAST(dec_v AS DOUBLE) FROM hour
        |UNION ALL SELECT 'day', bucket_ts, n_events,
        |  CAST(dec_v AS DOUBLE) FROM day
        |ORDER BY grain, bucket_ts""".stripMargin,

    // TextOps.hashEmbedding twin: identical md5 bucket/sign per token,
    // sparse signed counts, L2 norm from the integer sum of squares.
    "txt_hash_embedding" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS tk
         |  FROM documents),
         |e AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substr(md5(tk), 1, 4)) AS BIGINT) % 64
         |      AS dim,
         |    CASE WHEN CAST(concat('0x', substr(md5(tk), 5, 1)) AS BIGINT)
         |      % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM t),
         |sp AS (
         |  SELECT doc_id, dim, CAST(sum(sgn) AS BIGINT) AS value
         |  FROM e GROUP BY 1, 2 HAVING CAST(sum(sgn) AS BIGINT) <> 0)
         |SELECT doc_id, dim, value,
         |  CAST(value AS DOUBLE) / sqrt(CAST(
         |    sum(value * value) OVER (PARTITION BY doc_id) AS DOUBLE))
         |    AS unit_value
         |FROM sp ORDER BY doc_id, dim""".stripMargin,

    // Analytics.rfmSegments twin: per-customer RFM metrics, exact
    // 20/40/60/80 cutoffs via the (p·n + 99) div 100 rank rule per
    // metric (recency scored on its negation), threshold-comparison
    // scores.
    "r_rfm_segments" ->
      """WITH per AS (
        |  SELECT o_custkey AS custkey,
        |    max(o_orderdate) AS last_order,
        |    count(*) AS n_orders,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
        |  FROM orders GROUP BY 1),
        |anch AS (SELECT max(last_order) AS anchor FROM per),
        |a AS (
        |  SELECT custkey,
        |    date_diff('day', CAST(last_order AS DATE),
        |              CAST(anchor AS DATE)) AS recency_days,
        |    n_orders,
        |    CAST(spend_dec AS DOUBLE) AS monetary
        |  FROM per CROSS JOIN anch),
        |rr AS (SELECT -recency_days AS v,
        |    ROW_NUMBER() OVER (ORDER BY -recency_days) AS rn,
        |    COUNT(*) OVER () AS cnt FROM a),
        |rc AS (SELECT
        |    max(CASE WHEN rn = GREATEST(1, (20 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q1,
        |    max(CASE WHEN rn = GREATEST(1, (40 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q2,
        |    max(CASE WHEN rn = GREATEST(1, (60 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q3,
        |    max(CASE WHEN rn = GREATEST(1, (80 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q4 FROM rr),
        |fr AS (SELECT n_orders AS v,
        |    ROW_NUMBER() OVER (ORDER BY n_orders) AS rn,
        |    COUNT(*) OVER () AS cnt FROM a),
        |fc AS (SELECT
        |    max(CASE WHEN rn = GREATEST(1, (20 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q1,
        |    max(CASE WHEN rn = GREATEST(1, (40 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q2,
        |    max(CASE WHEN rn = GREATEST(1, (60 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q3,
        |    max(CASE WHEN rn = GREATEST(1, (80 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q4 FROM fr),
        |mr AS (SELECT monetary AS v,
        |    ROW_NUMBER() OVER (ORDER BY monetary) AS rn,
        |    COUNT(*) OVER () AS cnt FROM a),
        |mc AS (SELECT
        |    max(CASE WHEN rn = GREATEST(1, (20 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q1,
        |    max(CASE WHEN rn = GREATEST(1, (40 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q2,
        |    max(CASE WHEN rn = GREATEST(1, (60 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q3,
        |    max(CASE WHEN rn = GREATEST(1, (80 * cnt + 99) // 100)
        |        THEN CAST(v AS DOUBLE) END) AS q4 FROM mr)
        |SELECT custkey, recency_days, n_orders, monetary,
        |  1 + (CASE WHEN -recency_days > rc.q1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN -recency_days > rc.q2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN -recency_days > rc.q3 THEN 1 ELSE 0 END)
        |    + (CASE WHEN -recency_days > rc.q4 THEN 1 ELSE 0 END)
        |    AS r_score,
        |  1 + (CASE WHEN n_orders > fc.q1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN n_orders > fc.q2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN n_orders > fc.q3 THEN 1 ELSE 0 END)
        |    + (CASE WHEN n_orders > fc.q4 THEN 1 ELSE 0 END)
        |    AS f_score,
        |  1 + (CASE WHEN monetary > mc.q1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN monetary > mc.q2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN monetary > mc.q3 THEN 1 ELSE 0 END)
        |    + (CASE WHEN monetary > mc.q4 THEN 1 ELSE 0 END)
        |    AS m_score
        |FROM a CROSS JOIN rc CROSS JOIN fc CROSS JOIN mc
        |ORDER BY custkey""".stripMargin,

    // EventOps.anomalyMad twin: lower-median and MAD per type via the
    // (50·n + 99) div 100 rank rule, identical 4.4478·MAD flag boundary.
    "ev_anomaly_mad" ->
      """WITH m AS (
        |  SELECT event_type, v AS med FROM (
        |    SELECT event_type, value AS v,
        |      ROW_NUMBER() OVER (PARTITION BY event_type
        |                         ORDER BY value) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |    FROM events WHERE value IS NOT NULL)
        |  WHERE rn = GREATEST(1, (50 * cnt + 99) // 100)),
        |d AS (
        |  SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
        |  FROM events e JOIN m USING (event_type)
        |  WHERE e.value IS NOT NULL),
        |md AS (
        |  SELECT event_type, v AS mad FROM (
        |    SELECT event_type, dev AS v,
        |      ROW_NUMBER() OVER (PARTITION BY event_type
        |                         ORDER BY dev) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |    FROM d)
        |  WHERE rn = GREATEST(1, (50 * cnt + 99) // 100))
        |SELECT event_type, count(*) AS n_events,
        |  min(d.med) AS med, min(md.mad) AS mad,
        |  CAST(sum(CASE WHEN d.dev > 4.4478 * md.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_anomalies
        |FROM d JOIN md USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // EventOps.cusumChangepoint twin: identical DECIMAL-exact mean,
    // DECIMAL(24,9)-rounded deviations so the running sum is associative
    // (engines group window additions differently), identical
    // |CUSUM|-desc argmax tiebreak. The SAME oracle gates the
    // partitioned-with-carried-offsets engine form (ev_cusum_partitioned,
    // aliased below): decimal associativity makes the two engine plans
    // bit-identical, so one SQL truth serves both.
    "ev_cusum_changepoint" ->
      """WITH st AS (
        |  SELECT event_type,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |      AS mean,
        |    count(*) AS n_events
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |c AS (
        |  SELECT e.event_type, CAST(e.ts AS TIMESTAMP) AS ts, e.event_id,
        |    st.n_events,
        |    sum(CAST(e.value - st.mean AS DECIMAL(24,9))) OVER (
        |      PARTITION BY e.event_type
        |      ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id
        |      ROWS UNBOUNDED PRECEDING) AS cusum
        |  FROM events e JOIN st USING (event_type)
        |  WHERE e.value IS NOT NULL)
        |SELECT event_type, n_events, ts AS cp_ts,
        |  CAST(abs(cusum) AS DOUBLE) AS max_abs_cusum
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY event_type
        |    ORDER BY abs(cusum) DESC, ts, event_id) AS rn
        |  FROM c)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,

    // Analytics.yoyRevenue twin: DECIMAL yearly revenue, previous year
    // via a self-join on order_year - 1 (gap years surface NULL, never a
    // non-adjacent pairing), exact delta and one exactly-rounded ratio.
    "r_yoy_revenue" ->
      """WITH y AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |    o_orderpriority AS priority,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders GROUP BY 1, 2),
        |l AS (
        |  SELECT y.*, p.rev_dec AS prev_dec
        |  FROM y LEFT JOIN y p ON p.priority = y.priority
        |                      AND p.order_year = y.order_year - 1)
        |SELECT order_year, priority,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(prev_dec AS DOUBLE) AS prev_revenue,
        |  CAST(rev_dec - prev_dec AS DOUBLE) AS delta,
        |  CAST(rev_dec AS DOUBLE) / CAST(prev_dec AS DOUBLE) - 1.0
        |    AS growth
        |FROM l ORDER BY priority, order_year""".stripMargin,
  )

  /** The shared PageRank superstep chain (10 unrolled CTEs, scaled-
    * integer state — see GraphOps.pageRankFrom): node-type-agnostic, so
    * graph_pagerank (long ids) and txt_textrank (word strings) reuse it
    * verbatim over their own `edges`/`deg`/`nodes`/`pr0` CTEs.
    */
  private val pagerankSteps: String = (1 to 10).map { i =>
    s"""pr$i AS (
       |  SELECT nd.node,
       |    CAST(floor((1.0 - 0.85) / nd.n * 1e12) AS BIGINT)
       |      + CAST(floor(0.85 * CAST(coalesce(m.sin, 0) AS DOUBLE))
       |          AS BIGINT) AS r
       |  FROM nodes nd LEFT JOIN (
       |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT)
       |      AS sin
       |    FROM pr${i - 1} p
       |    JOIN edges e ON e.src = p.node
       |    JOIN deg dg ON dg.src = p.node
       |    GROUP BY 1) m ON m.node = nd.node)"""
  }.mkString(",\n")

  /** The PERSONALIZED superstep chain (round 8): identical arithmetic to
    * [[pagerankSteps]] except the teleport base rides the `based` CTE —
    * seed nodes carry floor((1−0.85)/|S|·1e12), all others 0.
    */
  private val pprSteps: String = (1 to 10).map { i =>
    s"""pr$i AS (
       |  SELECT nd.node,
       |    nd.base
       |      + CAST(floor(0.85 * CAST(coalesce(m.sin, 0) AS DOUBLE))
       |          AS BIGINT) AS r
       |  FROM based nd LEFT JOIN (
       |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT)
       |      AS sin
       |    FROM pr${i - 1} p
       |    JOIN edges e ON e.src = p.node
       |    JOIN deg dg ON dg.src = p.node
       |    GROUP BY 1) m ON m.node = nd.node)"""
  }.mkString(",\n")

  /** The HITS half-round chain (round 8): integer sum → max-normalize
    * via one floor division per side, mirroring [[ops.GraphOps.hits]]'
    * scaled-integer contract — every round bit-equal, no doubles in
    * the loop.
    */
  private val hitsSteps: String = (1 to 4).map { i =>
    s"""a${i}r AS (
       |  SELECT e.p, CAST(sum(h.hub) AS BIGINT) AS ar
       |  FROM e JOIN h${i - 1} h ON e.c = h.c GROUP BY 1),
       |a${i}m AS (SELECT max(ar) AS m FROM a${i}r),
       |a$i AS (
       |  SELECT p, ar * 1000000 // m AS auth
       |  FROM a${i}r CROSS JOIN a${i}m),
       |h${i}r AS (
       |  SELECT e.c, CAST(sum(a.auth) AS BIGINT) AS hr
       |  FROM e JOIN a$i a ON e.p = a.p GROUP BY 1),
       |h${i}m AS (SELECT max(hr) AS m FROM h${i}r),
       |h$i AS (
       |  SELECT c, hr * 1000000 // m AS hub
       |  FROM h${i}r CROSS JOIN h${i}m)"""
  }.mkString(",\n")

  /** Round-6 additions: decorrelated Q21/Q22 shapes + BM25 retrieval. */
  val round6: Map[String, String] = Map(
    // Analytics.soleLateSupplier twin: the same decorrelated aggregate
    // form (per-(order, supplier) late flag -> per-order counts) the
    // engine runs — semantically the Q21 EXISTS/NOT-EXISTS pair.
    "r_sole_late_supplier" ->
      """WITH per AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN CAST(l_shipdate AS TIMESTAMP) >
        |          CAST(o_orderdate AS TIMESTAMP) + INTERVAL 90 DAY
        |        THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |po AS (
        |  SELECT l_orderkey, count(*) AS n_supps, sum(late) AS n_late
        |  FROM per GROUP BY 1)
        |SELECT p.l_suppkey AS suppkey, s.s_name AS name,
        |  count(*) AS numwait
        |FROM per p
        |JOIN po USING (l_orderkey)
        |JOIN supplier s ON p.l_suppkey = s.s_suppkey
        |WHERE p.late = 1 AND po.n_supps >= 2 AND po.n_late = 1
        |GROUP BY 1, 2 ORDER BY numwait DESC, suppkey""".stripMargin,

    // Analytics.idleRichCustomers twin: DECIMAL-exact positive-balance
    // average (scalar subquery), NOT EXISTS anti-join, per-segment rollup.
    "r_idle_rich" ->
      """WITH ab AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment AS segment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_bal
        |FROM customer c CROSS JOIN ab
        |WHERE c.c_acctbal > ab.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // TextOps.bm25TopK twin: identical left-associated IEEE factors
    // (avglen, idf, tf normalization; k1=1.2, b=0.75), per-term
    // DECIMAL(20,8) contributions (absorbing ln's libm spread), exact
    // decimal per-doc sums, identical (score desc, doc_id) ranking.
    "txt_bm25_topk" -> {
      val toks = "(SELECT doc_id, " + toksSql("lower(text)") +
        " AS t FROM documents)"
      s"""WITH q(query_id, term) AS (
         |  VALUES (1, 'hash'), (1, 'join'), (1, 'merge'),
         |         (2, 'vector'), (2, 'scan'), (2, 'filter'),
         |         (3, 'customer'), (3, 'order'), (3, 'data')),
         |dl AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS len FROM $toks),
         |st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len) AS BIGINT) AS total_len FROM dl),
         |tft AS (
         |  SELECT x.doc_id, x.term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS term FROM $toks) x
         |  WHERE x.term IN (SELECT DISTINCT term FROM q)
         |  GROUP BY 1, 2),
         |dft AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df
         |  FROM tft GROUP BY 1),
         |sc AS (
         |  SELECT q.query_id, tft.doc_id,
         |    sum(CAST(
         |      ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) *
         |      (tft.tf * (1.2 + 1.0) / (tft.tf + 1.2 * (1.0 - 0.75 +
         |        0.75 * (CAST(dl.len AS DOUBLE)
         |          / (CAST(st.total_len AS DOUBLE) / st.n_docs)))))
         |      AS DECIMAL(20,8))) AS score_dec,
         |    count(*) AS n_terms_hit
         |  FROM tft
         |  JOIN dft USING (term)
         |  JOIN q USING (term)
         |  JOIN dl ON tft.doc_id = dl.doc_id
         |  CROSS JOIN st
         |  GROUP BY 1, 2)
         |SELECT CAST(query_id AS BIGINT) AS query_id,
         |  CAST(rank AS BIGINT) AS rank, doc_id,
         |  CAST(score_dec AS DOUBLE) AS bm25, n_terms_hit
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score_dec DESC, doc_id) AS rank
         |  FROM sc)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    // Analytics.marketBasket twin: identical basket-size guard, integer
    // support/count/total, one exactly-rounded division per ratio.
    "r_market_basket" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
        |  FROM lineitem),
        |sized AS (
        |  SELECT okey, part FROM (
        |    SELECT okey, part,
        |      COUNT(*) OVER (PARTITION BY okey) AS bsz FROM items)
        |  WHERE bsz <= 50),
        |n AS (
        |  SELECT count(DISTINCT okey) AS n_orders FROM sized),
        |pp AS (
        |  SELECT part, count(*) AS cnt FROM sized GROUP BY 1),
        |pairs AS (
        |  SELECT x.part AS part_a, y.part AS part_b,
        |    count(*) AS support
        |  FROM sized x JOIN sized y ON x.okey = y.okey
        |    AND x.part < y.part
        |  GROUP BY 1, 2)
        |SELECT part_a, part_b, support,
        |  a.cnt AS cnt_a, b.cnt AS cnt_b,
        |  CAST(support AS DOUBLE) / a.cnt AS confidence,
        |  CAST(support * n.n_orders AS DOUBLE) / (a.cnt * b.cnt) AS lift
        |FROM pairs
        |JOIN pp a ON a.part = part_a
        |JOIN pp b ON b.part = part_b
        |CROSS JOIN n
        |ORDER BY support DESC, part_a, part_b LIMIT 30""".stripMargin,

    // Analytics.quantityDiscountCorr twin: DECIMAL moment sums (exact,
    // scaled ints far under 2^53 → exact-input double surfacing), the
    // closed-form r in one identically-ordered double expression.
    "r_correlation" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(q) AS DOUBLE) AS sx,
        |    CAST(sum(disc) AS DOUBLE) AS sy,
        |    CAST(sum(q * disc) AS DOUBLE) AS sxy,
        |    CAST(sum(q * q) AS DOUBLE) AS sxx,
        |    CAST(sum(disc * disc) AS DOUBLE) AS syy
        |  FROM (SELECT l_returnflag,
        |          CAST(l_quantity AS DECIMAL(12,2)) AS q,
        |          CAST(l_discount AS DECIMAL(12,2)) AS disc
        |        FROM lineitem)
        |  GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (n * sxy - sx * sy)
        |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        |    AS corr_q_disc
        |FROM m ORDER BY l_returnflag""".stripMargin,

    // EventOps.crossCorrelation twin: epoch-hour integer keys, decimal
    // moment sums, the identical fixed-order closed-form r per lag.
    "ev_cross_correlation" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
        |      AS h,
        |    count(*) AS cnt
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1, 2),
        |a AS (SELECT h, cnt AS ca FROM hourly
        |      WHERE event_type = 'click'),
        |b AS (SELECT h AS hb, cnt AS cb FROM hourly
        |      WHERE event_type = 'purchase'),
        |lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
        |m AS (
        |  SELECT lag,
        |    CAST(ca AS DECIMAL(14,0)) AS x,
        |    CAST(cb AS DECIMAL(14,0)) AS y
        |  FROM a JOIN (SELECT * FROM b CROSS JOIN lags) bl
        |    ON a.h = bl.hb + bl.lag),
        |s AS (
        |  SELECT lag, count(*) AS n_hours,
        |    CAST(sum(x) AS DOUBLE) AS sx,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM m GROUP BY 1)
        |SELECT lag, n_hours,
        |  (n_hours * sxy - sx * sy)
        |    / sqrt((n_hours * sxx - sx * sx)
        |      * (n_hours * syy - sy * sy)) AS xcorr
        |FROM s ORDER BY lag""".stripMargin,

    // EventOps.slidingDistinctUsers twin: the HLL estimate is engine-
    // specific, so the oracle is the EXACT per-window distinct (integer)
    // plus the bound contract as a literal — the approxDistinctBound
    // pattern; the engine-side flag is deterministic for a fixed input.
    // The audit is SAMPLED (every 3rd window): unaudited windows carry
    // NULL exact/bound columns in BOTH engines — the full exact twin
    // would explode events windowHours×, the cost the sketch avoids.
    "ev_sliding_distinct" ->
      """WITH ev AS (
        |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600)
        |      AS BIGINT) AS h,
        |    user_id
        |  FROM events),
        |allw AS (
        |  SELECT DISTINCT h + u.off AS wend
        |  FROM (SELECT DISTINCT h FROM ev) hrs CROSS JOIN
        |    (SELECT unnest(generate_series(0, 5)) AS off) u),
        |w AS (
        |  SELECT h + u.off AS wend, user_id
        |  FROM ev CROSS JOIN
        |    (SELECT unnest(generate_series(0, 5)) AS off) u
        |  WHERE (h + u.off) % 3 = 0),
        |ex AS (
        |  SELECT wend, count(DISTINCT user_id) AS exact_users
        |  FROM w GROUP BY 1)
        |SELECT a.wend, ex.exact_users,
        |  CASE WHEN ex.exact_users IS NOT NULL THEN TRUE END
        |    AS within_bound
        |FROM allw a LEFT JOIN ex ON a.wend = ex.wend
        |ORDER BY a.wend""".stripMargin,

    // TextOps.bpePairs twin: vocabulary-reduced adjacent character-pair
    // counts weighted by word frequency — pure integer counting.
    "txt_bpe_pairs" ->
      s"""WITH vocab AS (
         |  SELECT word, count(*) AS wf FROM (
         |    SELECT unnest(${toksSql("lower(text)")}) AS word
         |    FROM documents)
         |  GROUP BY 1 HAVING length(word) >= 2),
         |p AS (
         |  SELECT unnest(list_transform(
         |      generate_series(1, length(word) - 1),
         |      i -> substr(word, i, 2))) AS pair, wf
         |  FROM vocab)
         |SELECT pair, CAST(sum(wf) AS BIGINT) AS n_occurrences,
         |  count(*) AS n_vocab_words
         |FROM p GROUP BY 1
         |ORDER BY n_occurrences DESC, pair LIMIT 50""".stripMargin,

    // GraphOps.pageRank twin: 10 supersteps UNROLLED as chained CTEs
    // (standard SQL forbids aggregation in a recursive term). Rank state
    // is a scaled INTEGER (1e-12 micro-units): integer floor-div
    // messages, exact integer inbox sums, floor(0.85·sum) update — the
    // only float ops are single correctly-rounded products/divisions,
    // and floor has no .5 tie, so every superstep table is bit-equal.
    "graph_pagerank" -> {
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (
         |  SELECT c AS src, p AS dst FROM pairs
         |  UNION ALL SELECT p AS src, c AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |nodes AS (
         |  SELECT src AS node, (SELECT count(*) FROM deg) AS n FROM deg),
         |pr0 AS (
         |  SELECT node, CAST(floor(1.0 / n * 1e12) AS BIGINT) AS r
         |  FROM nodes),
         |$pagerankSteps
         |SELECT node,
         |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         |    AS kind,
         |  CAST(r AS DOUBLE) / 1e12 AS pagerank
         |FROM pr10 ORDER BY r DESC, node LIMIT 20""".stripMargin
    },

    // TextOps.textRank twin: the SAME unrolled superstep chain over the
    // word co-occurrence graph — the generator is node-type-agnostic,
    // exactly like the engine's pageRankFrom core.
    "txt_textrank" -> {
      val toks = "(SELECT " + toksSql("lower(text)") + " AS t FROM documents)"
      s"""WITH toks AS (SELECT t FROM $toks WHERE len(t) >= 2),
         |raw AS (
         |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         |    i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
         |  FROM toks),
         |pairs AS (
         |  SELECT DISTINCT p.a AS a, p.b AS b FROM raw WHERE p.a <> p.b),
         |edges AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION SELECT b AS src, a AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |nodes AS (
         |  SELECT src AS node, (SELECT count(*) FROM deg) AS n FROM deg),
         |pr0 AS (
         |  SELECT node, CAST(floor(1.0 / n * 1e12) AS BIGINT) AS r
         |  FROM nodes),
         |$pagerankSteps
         |SELECT node AS term, CAST(r AS DOUBLE) / 1e12 AS textrank
         |FROM pr10 ORDER BY r DESC, node LIMIT 25""".stripMargin
    },

    // TextOps.tokenEntropy twin: per-(doc, term) tf·ln(tf/n) rounded
    // DECIMAL(24,9) (associative sum), one exactly-rounded final divide.
    "txt_token_entropy" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(${toksSql("lower(text)")}) AS term
         |    FROM documents)
         |  GROUP BY 1, 2),
         |w AS (
         |  SELECT doc_id, term, tf,
         |    sum(tf) OVER (PARTITION BY doc_id) AS n
         |  FROM tf)
         |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
         |  count(*) AS n_distinct,
         |  -CAST(sum(CAST(tf * ln(CAST(tf AS DOUBLE) / n)
         |      AS DECIMAL(24,9))) AS DOUBLE) / CAST(max(n) AS BIGINT)
         |    AS entropy
         |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** TextOps.bpeMerges twin: the k-round merge loop UNROLLED as chained
    * CTEs (count pairs over v_{i-1} → top-1 with (cnt desc, a, b)
    * tie-break → literal sentinel-replace into v_i). `replace` is
    * greedy-left-to-right-non-overlapping in both engines, which IS the
    * reference BPE merge semantics. Each v_i LEFT-joins its (0- or
    * 1-row) top-1 t_i: when merges EXHAUST before round k (a tiny or
    * degenerate corpus leaves no pair with len(syms) ≥ 2), t_i is
    * empty and v_i must carry v_{i-1} forward unchanged — a CROSS JOIN
    * would wipe the vocabulary and every later CTE, diverging from the
    * Scala loop's early-exit (which keeps the last vocabulary).
    */
  private def bpeStepCtes(k: Int): String = (1 to k).map { i =>
    s"""p$i AS (
       |  SELECT pr.a AS a, pr.b AS b, CAST(sum(wf) AS BIGINT) AS cnt
       |  FROM (SELECT wf,
       |      unnest(list_transform(generate_series(1, len(syms) - 1),
       |        i -> struct_pack(a := syms[i], b := syms[i + 1]))) AS pr
       |    FROM (SELECT wf,
       |        regexp_extract_all(repr, '<([^<>]*)>', 1) AS syms
       |      FROM v${i - 1}) s
       |    WHERE len(syms) >= 2) q
       |  GROUP BY 1, 2),
       |t$i AS (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
       |v$i AS (SELECT word, wf,
       |  CASE WHEN t$i.a IS NULL THEN repr
       |    ELSE replace(repr, '<' || t$i.a || '><' || t$i.b || '>',
       |      '<' || t$i.a || t$i.b || '>') END AS repr
       |  FROM v${i - 1} LEFT JOIN t$i ON TRUE)"""
  }.mkString(",\n")

  /** Round-7 additions: the five remaining TPC-H analytics shapes
    * (Q6/Q7/Q8/Q9/Q10), previously implemented but unregistered (round-6
    * ADVICE) — now first-class driver-gated entries — plus the BPE
    * merge loop.
    */
  val round7: Map[String, String] = {
    // l_extendedprice * (1 - l_discount), exact decimal — the shared
    // revenue expression of every money oracle
    val dp = """CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"""
      .stripMargin
    Map(
    // Analytics.forecastRevenueChange twin (TPC-H Q6 shape): pure
    // scan-filter-aggregate; the discount band compares on DECIMAL(18,2)
    // so the fixture's binary doubles bucket identically in both engines.
    "r_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_quantity < 24
        |  AND CAST(l_discount AS DECIMAL(18,2))
        |      >= CAST('0.05' AS DECIMAL(18,2))
        |  AND CAST(l_discount AS DECIMAL(18,2))
        |      <= CAST('0.07' AS DECIMAL(18,2))""".stripMargin,

    // Analytics.nationTradeVolume twin (TPC-H Q7 shape): bilateral
    // revenue between two named nations by ship year.
    "r_nation_trade_volume" ->
      s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         |  CAST(sum($dp) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ns ON s_nationkey = ns.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation nc ON c_nationkey = nc.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
         |  AND l_shipdate <  TIMESTAMP '1997-01-01'
         |  AND ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7') OR
         |       (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // Analytics.marketShare twin (TPC-H Q8 shape): exact-decimal
    // numerator/denominator divided ONCE in double; zero denominator →
    // NULL on both engines (Spark when-guard ≙ the CASE here).
    "r_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CASE WHEN sum($dp) <> 0 THEN
         |    CAST(sum(CASE WHEN ns.n_name = 'NATION_5' THEN $dp
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
         |    CAST(sum($dp) AS DOUBLE) END AS mkt_share,
         |  CAST(sum($dp) AS DOUBLE) AS total_volume
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ns ON s_nationkey = ns.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation nc ON c_nationkey = nc.n_nationkey
         |JOIN region ON nc.n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND p_type LIKE 'ECONOMY%'
         |  AND o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o_orderdate <  TIMESTAMP '1997-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Analytics.productProfit twin (TPC-H Q9 shape, adapted: supply cost
    // is the catalog retail price; ship-year grouping keeps one fact pass).
    "r_product_profit" ->
      s"""SELECT n_name AS nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         |  CAST(sum($dp - CAST(p_retailprice AS DECIMAL(18,2)) *
         |    CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit,
         |  count(*) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY 1, 2 ORDER BY nation, ship_year DESC""".stripMargin,

    // TextOps.lmScoreBigram twin: add-one-smoothed bigram LM, decimal
    // per-contribution rounding; docs without bigrams absent (as
    // zero-token docs are from txt_lm_score).
    "txt_lm_bigram" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("lower(text)")} AS t FROM documents),
         |big AS (
         |  SELECT doc_id, pr.prev AS prev, pr.cur AS cur FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(generate_series(1, len(t) - 1),
         |        i -> struct_pack(prev := t[i], cur := t[i + 1]))) AS pr
         |    FROM toks WHERE len(t) >= 2) x),
         |cb AS (SELECT prev, cur, count(*) AS cb FROM big GROUP BY 1, 2),
         |cp AS (SELECT prev, count(*) AS cp FROM big GROUP BY 1),
         |v AS (
         |  SELECT count(DISTINCT word) AS v FROM (
         |    SELECT unnest(${toksSql("lower(text)")}) AS word
         |    FROM documents) w),
         |tf AS (
         |  SELECT doc_id, prev, cur, count(*) AS tf
         |  FROM big GROUP BY 1, 2, 3),
         |lp AS (
         |  SELECT doc_id, tf,
         |    CAST(tf * ln((cb + 1.0) / (cp + v)) AS DECIMAL(24,9)) AS lp
         |  FROM tf JOIN cb USING (prev, cur) JOIN cp USING (prev)
         |  CROSS JOIN v)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |  CAST(sum(lp) AS DOUBLE) / CAST(sum(tf) AS BIGINT) AS avg_logprob
         |FROM lp GROUP BY 1 ORDER BY 1""".stripMargin,

    // TextOps.knScore twin: interpolated Kneser–Ney bigram smoothing
    // (Chen & Goodman 1999 eq. 16, D = 0.75) — same bigram frame, plus
    // the three continuation-count aggregates; identical double
    // operation order, per-position DECIMAL(24,9) rounding.
    "txt_kn_score" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("lower(text)")} AS t FROM documents),
         |big AS (
         |  SELECT doc_id, pr.prev AS prev, pr.cur AS cur FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(generate_series(1, len(t) - 1),
         |        i -> struct_pack(prev := t[i], cur := t[i + 1]))) AS pr
         |    FROM toks WHERE len(t) >= 2) x),
         |cb AS (SELECT prev, cur, count(*) AS cb FROM big GROUP BY 1, 2),
         |cp AS (SELECT prev, count(*) AS cp FROM big GROUP BY 1),
         |n1p AS (SELECT prev, count(*) AS n1p FROM cb GROUP BY 1),
         |n1c AS (SELECT cur, count(*) AS n1c FROM cb GROUP BY 1),
         |nt AS (SELECT count(*) AS ntypes FROM cb),
         |tf AS (
         |  SELECT doc_id, prev, cur, count(*) AS tf
         |  FROM big GROUP BY 1, 2, 3),
         |lp AS (
         |  SELECT doc_id, tf, CAST(tf * ln(
         |      (cb - 0.75) / cp
         |        + (0.75 * n1p / cp) * (CAST(n1c AS DOUBLE) / ntypes)
         |    ) AS DECIMAL(24,9)) AS lp
         |  FROM tf JOIN cb USING (prev, cur) JOIN cp USING (prev)
         |  JOIN n1p USING (prev) JOIN n1c USING (cur) CROSS JOIN nt)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |  CAST(sum(lp) AS DOUBLE) / CAST(sum(tf) AS BIGINT)
         |    AS avg_logprob
         |FROM lp GROUP BY 1 ORDER BY 1""".stripMargin,

    // TextOps.ccnetBucketsBigram twin: per-language terciles by mean
    // bigram logprob (the txt_ccnet_buckets window, one n-gram order up).
    "txt_ccnet_bigram" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("lower(text)")} AS t FROM documents),
         |big AS (
         |  SELECT doc_id, pr.prev AS prev, pr.cur AS cur FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(generate_series(1, len(t) - 1),
         |        i -> struct_pack(prev := t[i], cur := t[i + 1]))) AS pr
         |    FROM toks WHERE len(t) >= 2) x),
         |cb AS (SELECT prev, cur, count(*) AS cb FROM big GROUP BY 1, 2),
         |cp AS (SELECT prev, count(*) AS cp FROM big GROUP BY 1),
         |v AS (
         |  SELECT count(DISTINCT word) AS v FROM (
         |    SELECT unnest(${toksSql("lower(text)")}) AS word
         |    FROM documents) w),
         |tf AS (
         |  SELECT doc_id, prev, cur, count(*) AS tf
         |  FROM big GROUP BY 1, 2, 3),
         |lp AS (
         |  SELECT doc_id, tf,
         |    CAST(tf * ln((cb + 1.0) / (cp + v)) AS DECIMAL(24,9)) AS lp
         |  FROM tf JOIN cb USING (prev, cur) JOIN cp USING (prev)
         |  CROSS JOIN v),
         |doc AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |    sum(lp) AS sum_lp,
         |    CAST(sum(lp) AS DOUBLE) / CAST(sum(tf) AS BIGINT)
         |      AS avg_logprob
         |  FROM lp GROUP BY 1),
         |scored AS (
         |  SELECT dd.lang, d.n_bigrams, d.sum_lp,
         |    ntile(3) OVER (PARTITION BY dd.lang
         |                   ORDER BY d.avg_logprob DESC, d.doc_id) AS tile
         |  FROM doc d JOIN documents dd USING (doc_id))
         |SELECT lang,
         |  CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |            ELSE 'tail' END AS bucket,
         |  count(*) AS n_docs,
         |  CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
         |  CAST(sum(sum_lp) AS DOUBLE) / CAST(sum(n_bigrams) AS BIGINT)
         |    AS mean_logprob
         |FROM scored GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // EventOps.quantileRollupDaily twin: KLL estimates are engine-
    // specific, so the oracle is the exact per-day p50/p90 (the
    // ev_value_quantiles rank convention) + the bound flags as
    // literals — the approxDistinctBound pattern for rank-domain
    // guarantees.
    "ev_quantile_rollup" ->
      """WITH ev AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day_ts,
        |    value
        |  FROM events),
        |r AS (
        |  SELECT day_ts, value,
        |    ROW_NUMBER() OVER (PARTITION BY day_ts ORDER BY value) AS rn,
        |    COUNT(*) OVER (PARTITION BY day_ts) AS cnt
        |  FROM ev)
        |SELECT day_ts, CAST(max(cnt) AS BIGINT) AS n_events,
        |  max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100)
        |      THEN value END) AS exact_p50,
        |  max(CASE WHEN rn = GREATEST(1, (90 * cnt + 99) // 100)
        |      THEN value END) AS exact_p90,
        |  TRUE AS p50_within, TRUE AS p90_within
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // TextOps.termFreqRollup twin: exact top-30 term counts + the CMS
    // promise as a literal (the txt_top_terms_cms contract, exercised
    // through the shard-merge path).
    "txt_cms_rollup" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS term
         |  FROM documents)
         |SELECT term, count(*) AS tf, TRUE AS within_bound
         |FROM t GROUP BY term
         |ORDER BY tf DESC, term LIMIT 30""".stripMargin,

    // EventOps.slidingQuantile twin: sampled exact p50 per 3rd window
    // (the ev_sliding_distinct audit discipline, quantile edition);
    // unaudited windows carry NULLs in both engines.
    "ev_sliding_quantile" ->
      """WITH ev AS (
        |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600)
        |      AS BIGINT) AS h,
        |    value
        |  FROM events),
        |allw AS (
        |  SELECT DISTINCT h + u.off AS wend
        |  FROM (SELECT DISTINCT h FROM ev) hrs CROSS JOIN
        |    (SELECT unnest(generate_series(0, 5)) AS off) u),
        |w AS (
        |  SELECT h + u.off AS wend, value
        |  FROM ev CROSS JOIN
        |    (SELECT unnest(generate_series(0, 5)) AS off) u
        |  WHERE (h + u.off) % 3 = 0),
        |r AS (
        |  SELECT wend, value,
        |    ROW_NUMBER() OVER (PARTITION BY wend ORDER BY value) AS rn,
        |    COUNT(*) OVER (PARTITION BY wend) AS cnt
        |  FROM w),
        |ex AS (
        |  SELECT wend, CAST(max(cnt) AS BIGINT) AS n_values,
        |    max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100)
        |        THEN value END) AS exact_p50
        |  FROM r GROUP BY 1)
        |SELECT a.wend, ex.n_values, ex.exact_p50,
        |  CASE WHEN ex.exact_p50 IS NOT NULL THEN TRUE END AS p50_within
        |FROM allw a LEFT JOIN ex ON a.wend = ex.wend
        |ORDER BY a.wend""".stripMargin,

    // EventOps.segmentOverlap twin: exact pairwise distinct-user
    // overlap; theta at fixture cardinality is in its exact regime so
    // the bound flag is a literal TRUE on both sides.
    "ev_segment_overlap" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |t AS (SELECT DISTINCT event_type FROM events),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b
        |  FROM t a JOIN t b ON a.event_type < b.event_type),
        |e AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b,
        |    count(*) AS exact_both
        |  FROM ut x JOIN ut y
        |    ON x.user_id = y.user_id AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b,
        |  coalesce(e.exact_both, 0) AS exact_both,
        |  TRUE AS within_bound
        |FROM p LEFT JOIN e USING (type_a, type_b)
        |ORDER BY 1, 2""".stripMargin,

    // EventOps.segmentExclusive twin: |A \ B| = |A| − |A∩B| per ordered
    // pair; theta difference at fixture cardinality is exact.
    "ev_segment_exclusive" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |nd AS (
        |  SELECT event_type, count(*) AS nd FROM ut GROUP BY 1),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, a.nd
        |  FROM nd a JOIN nd b ON a.event_type <> b.event_type),
        |e AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b,
        |    count(*) AS n_both
        |  FROM ut x JOIN ut y
        |    ON x.user_id = y.user_id AND x.event_type <> y.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b,
        |  p.nd - coalesce(e.n_both, 0) AS exact_only_a,
        |  TRUE AS within_bound
        |FROM p LEFT JOIN e USING (type_a, type_b)
        |ORDER BY 1, 2""".stripMargin,

    // Relational.storagePartitionedJoinAgg twin: the graftdocs doc_id
    // space is pure arithmetic, so the SPJ self-join aggregate
    // reproduces from generate_series — layout is the engine's, the
    // numbers are engine-independent.
    "r_storage_partitioned_join" ->
      """WITH ids AS (
        |  SELECT unnest(generate_series(0, 4999)) AS doc_id),
        |b AS (SELECT doc_id, doc_id // 250 AS id_bucket FROM ids)
        |SELECT a.id_bucket, count(*) AS n_docs,
        |  min(a.doc_id) AS min_id, max(a.doc_id) AS max_id
        |FROM b a JOIN b c
        |  ON a.id_bucket = c.id_bucket AND a.doc_id = c.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // TextOps.bpeMerges twin: 8 merge rounds unrolled ([[bpeStepCtes]]).
    "txt_bpe_merges" -> {
      val sel = (1 to 8).map(i =>
        s"""SELECT $i AS step, a AS left_sym, b AS right_sym,
           |  a || b AS merged, cnt AS n_occurrences FROM t$i""".stripMargin)
        .mkString("\n  UNION ALL ")
      s"""WITH vocab AS (
         |  SELECT word, count(*) AS wf FROM (
         |    SELECT unnest(${toksSql("lower(text)")}) AS word
         |    FROM documents) t
         |  WHERE regexp_full_match(word, '[a-z]+') AND length(word) >= 2
         |  GROUP BY 1),
         |v0 AS (SELECT word, wf,
         |  regexp_replace(word, '(.)', '<\\1>', 'g') AS repr FROM vocab),
         |${bpeStepCtes(8)}
         |SELECT * FROM (
         |  $sel) u
         |ORDER BY step""".stripMargin
    },

    // TextOps.bpeEncode twin: the same 8 unrolled merge rounds, then
    // the final vocabulary's subword counts joined back to the corpus.
    "txt_bpe_encode" -> {
      s"""WITH vocab AS (
         |  SELECT word, count(*) AS wf FROM (
         |    SELECT unnest(${toksSql("lower(text)")}) AS word
         |    FROM documents) t
         |  WHERE regexp_full_match(word, '[a-z]+') AND length(word) >= 2
         |  GROUP BY 1),
         |v0 AS (SELECT word, wf,
         |  regexp_replace(word, '(.)', '<\\1>', 'g') AS repr FROM vocab),
         |${bpeStepCtes(8)},
         |sub AS (
         |  SELECT word,
         |    CAST(len(regexp_extract_all(repr, '<([^<>]*)>', 1))
         |      AS BIGINT) AS n_sub
         |  FROM v8),
         |dw AS (
         |  SELECT doc_id, word FROM (
         |    SELECT doc_id, unnest(${toksSql("lower(text)")}) AS word
         |    FROM documents) x
         |  WHERE regexp_full_match(word, '[a-z]+') AND length(word) >= 2)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
         |  CAST(sum(n_sub) AS DOUBLE) / count(*) AS bpe_fertility
         |FROM dw JOIN sub USING (word)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // Analytics.returnedItemRevenue twin (TPC-H Q10 shape): top-20
    // customers by returned revenue in one quarter.
    "r_returned_item_revenue" ->
      s"""SELECT c_custkey AS custkey, c_name AS name,
         |  CAST(sum($dp) AS DOUBLE) AS revenue,
         |  c_acctbal AS acctbal, n_name AS nation
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1996-04-01'
         |GROUP BY 1, 2, 4, 5
         |ORDER BY revenue DESC, custkey LIMIT 20""".stripMargin)
  }

  /** The thresholded co-purchase edge CTEs shared by the components /
    * k-core / Adamic–Adar oracles (GraphOps.coPurchaseEdges twin):
    * basket-capped distinct (order, part) pairs, kept when the pair
    * co-occurs in ≥ minCount orders; e2 is the distinct a < b edge set.
    */
  private def coEdgesCtes(minCount: Int): String =
    s"""items AS (
       |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
       |  FROM lineitem),
       |sized AS (
       |  SELECT okey, part FROM (
       |    SELECT okey, part, COUNT(*) OVER (PARTITION BY okey) AS bsz
       |    FROM items)
       |  WHERE bsz <= 50),
       |e2 AS (
       |  SELECT a, b FROM (
       |    SELECT x.part AS a, y.part AS b, count(*) AS n
       |    FROM sized x JOIN sized y
       |      ON x.okey = y.okey AND x.part < y.part
       |    GROUP BY 1, 2)
       |  WHERE n >= $minCount)""".stripMargin

  /** GraphOps.kcoreFromEdges twin: `rounds` unrolled simultaneous-peel
    * CTEs (recompute degrees over the surviving directed edge set, drop
    * every endpoint below k at once). MATERIALIZED because each e_i is
    * consumed twice (degree filter + edge prune) — without it the
    * doubly-referenced chain inlines exponentially.
    */
  private def kcorePeelCtes(k: Int, rounds: Int): String =
    (1 to rounds).map { i =>
      s"""kk$i AS MATERIALIZED (
         |  SELECT src FROM pe${i - 1} GROUP BY src
         |  HAVING count(*) >= $k),
         |pe$i AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM pe${i - 1} e
         |  JOIN kk$i ka ON ka.src = e.src
         |  JOIN kk$i kb ON kb.src = e.dst)"""
    }.mkString(",\n")

  /** GraphOps.lpaLabels twin: `rounds` unrolled synchronous label
    * updates — each node adopts the most frequent neighbor label,
    * (count desc, label asc) tiebreak. MATERIALIZED because each lp_i
    * feeds the next round's join; pure integer (count, label) argmax.
    */
  private def lpaCtes(rounds: Int): String = {
    val base =
      """ladj AS MATERIALIZED (
        |  SELECT a AS node, b AS nb FROM e2
        |  UNION ALL SELECT b, a FROM e2),
        |lp0 AS MATERIALIZED (
        |  SELECT node, node AS lab FROM (
        |    SELECT DISTINCT node FROM ladj))""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""lc$i AS MATERIALIZED (
         |  SELECT j.node, l.lab, count(*) AS c
         |  FROM ladj j JOIN lp${i - 1} l ON j.nb = l.node
         |  GROUP BY 1, 2),
         |lp$i AS MATERIALIZED (
         |  SELECT node, lab FROM (
         |    SELECT node, lab, ROW_NUMBER() OVER (PARTITION BY node
         |      ORDER BY c DESC, lab) AS rn
         |    FROM lc$i)
         |  WHERE rn = 1)"""
    }.mkString(",\n")
    s"$base,\n$steps"
  }

  /** Round-8 additions: the two remaining TPC-H shapes (Q2 adapted to
    * the fixture's lineitem-as-supply-catalog, Q4 on the ship-date
    * late convention) — the full 22-query family is now covered.
    */
  val round8: Map[String, String] = Map(
    // EventOps.seasonalProfile twin: hourly integer counts, one
    // int->double day mean, residuals rounded onto DECIMAL(24,9) so
    // the per-hour-of-day sum is associative.
    "ev_seasonal_profile" ->
      """WITH hourly AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |trend AS (
        |  SELECT day, sum(c) AS dsum, count(*) AS dcnt
        |  FROM hourly GROUP BY 1),
        |resid AS (
        |  SELECT hod, c,
        |    CAST(c - CAST(dsum AS DOUBLE) / dcnt AS DECIMAL(24,9)) AS r
        |  FROM hourly JOIN trend USING (day))
        |SELECT hod, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(c) AS BIGINT) AS n_events,
        |  CAST(sum(r) AS DOUBLE) / count(*) AS seasonal
        |FROM resid GROUP BY 1 ORDER BY hod""".stripMargin,

    // Relational.equidepthHist twin: NTILE over the identical
    // (value, key) total order — pure integer bucketing; DECIMAL money
    // bounds cast to double at the end.
    "r_equidepth_hist" ->
      """WITH v AS (
        |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS v
        |  FROM orders),
        |b AS (
        |  SELECT v, CAST(NTILE(10) OVER (ORDER BY v, o_orderkey)
        |    AS BIGINT) AS bucket
        |  FROM v)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(v) AS DOUBLE) AS lo, CAST(max(v) AS DOUBLE) AS hi
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Relational.benfordAudit twin: same DECIMAL(18,2)-string first
    // digit, same hardcoded Benford literals cast to DOUBLE, same
    // chi-term shape, total as an associative DECIMAL(24,9) window sum.
    "r_benford_audit" ->
      """WITH d0 AS (
        |  SELECT CAST(regexp_extract(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
        |    '[1-9]', 0) AS BIGINT) AS digit
        |  FROM lineitem),
        |o AS (
        |  SELECT digit, count(*) AS observed FROM d0
        |  WHERE digit IS NOT NULL GROUP BY 1),
        |dg AS (SELECT range AS digit FROM range(1, 10)),
        |j AS (
        |  SELECT dg.digit,
        |    CAST(COALESCE(o.observed, 0) AS BIGINT) AS observed
        |  FROM dg LEFT JOIN o ON dg.digit = o.digit),
        |t AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM j),
        |c AS (
        |  SELECT digit, observed,
        |    CAST(CASE digit WHEN 1 THEN 0.3010299957
        |      WHEN 2 THEN 0.1760912591 WHEN 3 THEN 0.1249387366
        |      WHEN 4 THEN 0.0969100130 WHEN 5 THEN 0.0791812460
        |      WHEN 6 THEN 0.0669467896 WHEN 7 THEN 0.0579919470
        |      WHEN 8 THEN 0.0511525224 WHEN 9 THEN 0.0457574906
        |      END AS DOUBLE) AS expected_p
        |  FROM j),
        |e AS (
        |  SELECT digit, observed, expected_p,
        |    expected_p * CAST(n AS DOUBLE) AS expected_n
        |  FROM c CROSS JOIN t),
        |x AS (
        |  SELECT digit, observed, expected_p, expected_n,
        |    CAST((CAST(observed AS DOUBLE) - expected_n)
        |      * (CAST(observed AS DOUBLE) - expected_n)
        |      / expected_n AS DECIMAL(24,9)) AS chi_dec
        |  FROM e)
        |SELECT digit, observed, expected_p, expected_n,
        |  CAST(chi_dec AS DOUBLE) AS chi_term,
        |  CAST(sum(chi_dec) OVER () AS DOUBLE) AS chi_sq
        |FROM x ORDER BY digit""".stripMargin,

    // TextOps.heapsFit twin: per-doc (tokens, distinct types), the
    // zipf OLS discipline over ln/ln points.
    "txt_heaps_fit" ->
      s"""WITH per AS (
         |  SELECT len(t) AS n_tokens, len(list_distinct(t)) AS n_types
         |  FROM (SELECT ${toksSql("lower(text)")} AS t FROM documents)
         |  WHERE len(t) >= 1),
         |terms AS (
         |  SELECT
         |    CAST(ln(CAST(n_tokens AS DOUBLE)) AS DECIMAL(24,9)) AS x,
         |    CAST(ln(CAST(n_types AS DOUBLE)) AS DECIMAL(24,9)) AS y,
         |    CAST(ln(CAST(n_tokens AS DOUBLE))
         |      * ln(CAST(n_types AS DOUBLE)) AS DECIMAL(24,9)) AS xy,
         |    CAST(ln(CAST(n_tokens AS DOUBLE))
         |      * ln(CAST(n_tokens AS DOUBLE)) AS DECIMAL(24,9)) AS xx
         |  FROM per),
         |mom AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |    CAST(sum(xy) AS DOUBLE) AS sxy,
         |    CAST(sum(xx) AS DOUBLE) AS sxx
         |  FROM terms)
         |SELECT n_docs,
         |  (n_docs * sxy - sx * sy) / (n_docs * sxx - sx * sx) AS beta,
         |  (sy - ((n_docs * sxy - sx * sy)
         |      / (n_docs * sxx - sx * sx)) * sx) / n_docs AS ln_k
         |FROM mom""".stripMargin,

    // TextOps.zipfFit twin: determinate (ctf desc, term) ranks, one ln
    // per factor, per-term DECIMAL(24,9) rounding before the sums,
    // identical closed-form OLS over the four cast sums.
    "txt_zipf_fit" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS term
         |  FROM documents),
         |ctf AS (
         |  SELECT term, count(*) AS ctf FROM t GROUP BY 1),
         |ranked AS (
         |  SELECT ctf, CAST(ROW_NUMBER() OVER (
         |    ORDER BY ctf DESC, term) AS BIGINT) AS rank
         |  FROM ctf),
         |terms AS (
         |  SELECT
         |    CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(24,9)) AS x,
         |    CAST(ln(CAST(ctf AS DOUBLE)) AS DECIMAL(24,9)) AS y,
         |    CAST(ln(CAST(rank AS DOUBLE)) * ln(CAST(ctf AS DOUBLE))
         |      AS DECIMAL(24,9)) AS xy,
         |    CAST(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))
         |      AS DECIMAL(24,9)) AS xx
         |  FROM ranked),
         |mom AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_terms,
         |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |    CAST(sum(xy) AS DOUBLE) AS sxy,
         |    CAST(sum(xx) AS DOUBLE) AS sxx
         |  FROM terms)
         |SELECT n_terms,
         |  (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)
         |    AS slope,
         |  (sy - ((n_terms * sxy - sx * sy)
         |      / (n_terms * sxx - sx * sx)) * sx) / n_terms
         |    AS intercept
         |FROM mom""".stripMargin,

    // SimilarityOps.dimTruncationAudit twin: the brute recipe twice —
    // full-dim truth vs the first-16-components slice — joined on
    // (query, neighbor) and reduced to per-query recall@5.
    "emb_dim_truncation" ->
      """WITH emb AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ef
        |  FROM embeddings),
        |fscored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id,
        |    round(list_sum(list_transform(range(1, len(q.ef) + 1),
        |        i -> q.ef[i] * c.ef[i]))
        |      / (sqrt(list_sum(list_transform(q.ef, x -> x * x)))
        |        * sqrt(list_sum(list_transform(c.ef, x -> x * x)))), 6)
        |      AS cs
        |  FROM emb q CROSS JOIN emb c
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ft AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rank
        |    FROM fscored) WHERE rank <= 5),
        |te AS (SELECT vec_id, ef[1:16] AS et FROM emb),
        |tscored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id,
        |    round(list_sum(list_transform(range(1, len(q.et) + 1),
        |        i -> q.et[i] * c.et[i]))
        |      / (sqrt(list_sum(list_transform(q.et, x -> x * x)))
        |        * sqrt(list_sum(list_transform(c.et, x -> x * x)))), 6)
        |      AS cs
        |  FROM te q CROSS JOIN te c
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |tt AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rank
        |    FROM tscored) WHERE rank <= 5)
        |SELECT f.query_id,
        |  CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / 5 AS recall
        |FROM ft f LEFT JOIN tt t
        |  ON f.query_id = t.query_id AND f.vec_id = t.vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // SimilarityOps.annRecallAudit twin: the emb_topk_brute and
    // emb_topk_ivf_seeded recipes verbatim (shared cast/norm CTE,
    // same 1e-6 rounding and tie-breaks), joined on (query, neighbor)
    // and reduced to per-query recall@5.
    "emb_recall_audit" ->
      """WITH emb AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |bscored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id,
        |    round(list_sum(list_transform(range(1, len(q.e) + 1),
        |        i -> q.e[i] * c.e[i])) / (q.nrm * c.nrm), 6) AS cs
        |  FROM emb q CROSS JOIN emb c
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |bt AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rank
        |    FROM bscored) WHERE rank <= 5),
        |cent AS (
        |  SELECT vec_id AS cell, e AS ce, nrm AS cnrm
        |  FROM emb WHERE vec_id < 10),
        |sims AS (
        |  SELECT v.vec_id, c.cell,
        |    list_sum(list_transform(range(1, len(v.e) + 1),
        |      i -> v.e[i] * c.ce[i])) / (v.nrm * c.cnrm) AS sim
        |  FROM emb v CROSS JOIN cent c),
        |assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY sim DESC, cell) AS rn
        |    FROM sims) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cell FROM (
        |    SELECT vec_id, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY sim DESC, cell) AS rn
        |    FROM sims WHERE vec_id < 10) WHERE rn <= 3),
        |icand AS (
        |  SELECT p.query_id, a.vec_id
        |  FROM probes p JOIN assign a ON p.cell = a.cell
        |  WHERE a.vec_id <> p.query_id),
        |iscored AS (
        |  SELECT c.query_id, c.vec_id,
        |    round(list_sum(list_transform(range(1, len(q.e) + 1),
        |        i -> q.e[i] * v.e[i])) / (q.nrm * v.nrm), 6) AS cs
        |  FROM icand c JOIN emb q ON c.query_id = q.vec_id
        |  JOIN emb v ON c.vec_id = v.vec_id),
        |it AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rank
        |    FROM iscored) WHERE rank <= 5)
        |SELECT b.query_id,
        |  CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / 5 AS recall
        |FROM bt b LEFT JOIN it i
        |  ON b.query_id = i.query_id AND b.vec_id = i.vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // GraphOps.clusteringCoeff twin: the oriented-closure triangle
    // total + wedge arithmetic, one exact 3·T / W ratio.
    "graph_clustering_coeff" ->
      s"""WITH ${coEdgesCtes(2)},
         |deg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM e2
         |    UNION ALL SELECT b AS node FROM e2)
         |  GROUP BY 1),
         |oriented AS (
         |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
         |           THEN a ELSE b END AS u,
         |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
         |           THEN b ELSE a END AS v
         |  FROM e2
         |  JOIN deg da ON da.node = a
         |  JOIN deg db ON db.node = b),
         |tt AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
         |  FROM oriented w1 JOIN oriented w2 ON w1.v = w2.u
         |  WHERE EXISTS (SELECT 1 FROM oriented w3
         |                WHERE w3.u = w1.u AND w3.v = w2.v)),
         |st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         |    CAST(sum(deg) // 2 AS BIGINT) AS n_edges,
         |    CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
         |  FROM deg)
         |SELECT n_nodes, n_edges, n_wedges, n_triangles,
         |  3.0 * n_triangles / n_wedges AS global_clustering
         |FROM st CROSS JOIN tt""".stripMargin,

    // DedupOps.dedupRateReport twin: the survivors oracle's recursive
    // label closure, sliced per language with pure integer counts.
    "dedup_rate_report" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
         |  UNION SELECT doc_b, doc_a FROM jpairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src)
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN l.cluster_id IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered,
         |  CAST(sum(CASE WHEN l.cluster_id IS NOT NULL
         |      AND l.cluster_id <> d.doc_id
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  CAST(sum(CASE WHEN l.cluster_id IS NOT NULL
         |      AND l.cluster_id <> d.doc_id
         |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_rate
         |FROM documents d
         |LEFT JOIN lab l ON d.doc_id = l.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // EventOps.seasonalAnomaly twin: same detrended cells, the
    // hour-of-day component removed, then the exact-lower-median MAD
    // fence (the ev_anomaly_mad rank formula).
    "ev_seasonal_anomaly" ->
      """WITH hourly AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |trend AS (
        |  SELECT day, sum(c) AS dsum, count(*) AS dcnt
        |  FROM hourly GROUP BY 1),
        |wt AS (
        |  SELECT h.day, h.hod, h.c,
        |    CAST(h.c - CAST(t.dsum AS DOUBLE) / t.dcnt
        |      AS DECIMAL(24,9)) AS r
        |  FROM hourly h JOIN trend t USING (day)),
        |seas AS (
        |  SELECT hod, CAST(sum(r) AS DOUBLE) / count(*) AS seasonal
        |  FROM wt GROUP BY 1),
        |resid AS (
        |  SELECT day, hod, c, CAST(r AS DOUBLE) - seasonal AS resid
        |  FROM wt JOIN seas USING (hod)),
        |m1 AS (
        |  SELECT resid AS med FROM (
        |    SELECT resid, ROW_NUMBER() OVER (ORDER BY resid) AS rn,
        |      COUNT(*) OVER () AS cnt
        |    FROM resid)
        |  WHERE rn = GREATEST(1, (50 * cnt + 99) // 100)),
        |dv AS (
        |  SELECT day, hod, c, resid, abs(resid - med) AS dev
        |  FROM resid CROSS JOIN m1),
        |m2 AS (
        |  SELECT dev AS mad FROM (
        |    SELECT dev, ROW_NUMBER() OVER (ORDER BY dev) AS rn,
        |      COUNT(*) OVER () AS cnt
        |    FROM dv)
        |  WHERE rn = GREATEST(1, (50 * cnt + 99) // 100))
        |SELECT day, hod, c AS n_events, resid
        |FROM dv CROSS JOIN m2 WHERE dev > 4.4478 * mad
        |ORDER BY day, hod""".stripMargin,

    // GraphOps.componentsIncremental twin: a FULL recompute — the
    // recursive least-label closure over base ∪ delta trade edges.
    // Equality with the engine's incremental fold is the min-label
    // algebraic identity the operator rests on, checked end to end.
    "graph_components_incremental" ->
      """WITH RECURSIVE tpe AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT src, dst FROM tpe UNION SELECT dst, src FROM tpe),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        |  SELECT src AS node, least(src, min(dst)) AS component_id
        |  FROM reach GROUP BY src)
        |SELECT component_id, CAST(count(*) AS BIGINT) AS n_members
        |FROM lab GROUP BY 1
        |ORDER BY n_members DESC, component_id""".stripMargin,

    // GraphOps.neighborhoodFunction twin: bounded recursive min-hop
    // closure from the SAME sampled sources (node % 8 = 0, cap 3) —
    // exact audited pair counts; the sketch estimate never crosses the
    // gate, only its engine-side bound flag (TRUE here).
    "graph_anf" ->
      s"""WITH RECURSIVE ${coEdgesCtes(2)},
         |nadj AS (
         |  SELECT a AS src, b AS dst FROM e2
         |  UNION ALL SELECT b, a FROM e2),
         |nseeds AS (
         |  SELECT DISTINCT src AS node FROM nadj WHERE src % 8 = 0),
         |nreach(srcu, node, dd) AS (
         |  SELECT node, node, 0 FROM nseeds
         |  UNION
         |  SELECT r.srcu, e.dst, r.dd + 1
         |  FROM nreach r JOIN nadj e ON e.src = r.node
         |  WHERE r.dd < 3),
         |nmd AS (
         |  SELECT srcu, node, min(dd) AS dist FROM nreach GROUP BY 1, 2),
         |rr AS (SELECT unnest([1, 2, 3]) AS r)
         |SELECT CAST(rr.r AS BIGINT) AS r, ns.n_sources,
         |  CAST(count(*) AS BIGINT) AS pairs_exact,
         |  TRUE AS within_bound
         |FROM rr JOIN nmd ON nmd.dist <= rr.r
         |CROSS JOIN (
         |  SELECT CAST(count(*) AS BIGINT) AS n_sources FROM nseeds) ns
         |GROUP BY 1, 2 ORDER BY r""".stripMargin,

    // GraphOps.anfDiameter twin: the graph_anf sampled-closure BFS,
    // then the integer 10·p ≥ 9·P effective-diameter rule; est_agrees
    // is the pinned-predicate contract (the sketch must name the same
    // radius — TRUE by the audited-bound argument, deterministic
    // because the HLL seed is fixed).
    "graph_anf_diameter" ->
      s"""WITH RECURSIVE ${coEdgesCtes(2)},
         |nadj AS (
         |  SELECT a AS src, b AS dst FROM e2
         |  UNION ALL SELECT b, a FROM e2),
         |nseeds AS (
         |  SELECT DISTINCT src AS node FROM nadj WHERE src % 8 = 0),
         |nreach(srcu, node, dd) AS (
         |  SELECT node, node, 0 FROM nseeds
         |  UNION
         |  SELECT r.srcu, e.dst, r.dd + 1
         |  FROM nreach r JOIN nadj e ON e.src = r.node
         |  WHERE r.dd < 3),
         |nmd AS (
         |  SELECT srcu, node, min(dd) AS dist FROM nreach GROUP BY 1, 2),
         |rr AS (SELECT unnest([1, 2, 3]) AS r),
         |pc AS (
         |  SELECT rr.r AS r, CAST(count(*) AS BIGINT) AS pe
         |  FROM rr JOIN nmd ON nmd.dist <= rr.r GROUP BY 1),
         |hz AS (SELECT pe AS pe_max FROM pc WHERE r = 3),
         |fl AS (
         |  SELECT pc.r, pc.pe,
         |    CAST(pc.pe AS DOUBLE) / CAST(h.pe_max AS DOUBLE) AS frac,
         |    pc.pe * 10 >= h.pe_max * 9 AS covers90
         |  FROM pc, hz h),
         |ed AS (SELECT min(r) AS re FROM fl WHERE covers90)
         |SELECT CAST(fl.r AS BIGINT) AS r, fl.pe AS pairs_exact,
         |  fl.frac AS frac,
         |  fl.r = ed.re AS is_effective_diameter,
         |  TRUE AS est_agrees
         |FROM fl, ed ORDER BY r""".stripMargin,

    // GraphOps.assortativity twin: exact integer moment sums over the
    // directed edge list, cast once to double, identical Pearson
    // expression (the r_correlation discipline).
    "graph_assortativity" ->
      s"""WITH ${coEdgesCtes(2)},
         |ddeg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2)
         |  GROUP BY 1),
         |dadj AS (
         |  SELECT a AS src, b AS dst FROM e2
         |  UNION ALL SELECT b, a FROM e2),
         |mom AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_dir_edges,
         |    CAST(sum(x.deg) AS DOUBLE) AS sx,
         |    CAST(sum(y.deg) AS DOUBLE) AS sy,
         |    CAST(sum(x.deg * y.deg) AS DOUBLE) AS sxy,
         |    CAST(sum(x.deg * x.deg) AS DOUBLE) AS sxx,
         |    CAST(sum(y.deg * y.deg) AS DOUBLE) AS syy
         |  FROM dadj e JOIN ddeg x ON e.src = x.node
         |  JOIN ddeg y ON e.dst = y.node)
         |SELECT n_dir_edges,
         |  (n_dir_edges * sxy - sx * sy)
         |    / sqrt((n_dir_edges * sxx - sx * sx)
         |      * (n_dir_edges * syy - sy * sy)) AS assortativity
         |FROM mom""".stripMargin,

    // GraphOps.labelPropagation twin: 4 unrolled synchronous LPA
    // rounds over the thresholded co-purchase graph (the engine's loop
    // uses the SAME depth), then the community-size census.
    "graph_label_prop" ->
      s"""WITH ${coEdgesCtes(2)},
         |${lpaCtes(4)}
         |SELECT community_size,
         |  CAST(count(*) AS BIGINT) AS n_communities
         |FROM (
         |  SELECT lab, CAST(count(*) AS BIGINT) AS community_size
         |  FROM lp4 GROUP BY 1)
         |GROUP BY 1 ORDER BY community_size""".stripMargin,

    // GraphOps.modularity twin: Newman–Girvan Q of the same 4-round
    // LPA partition — every input an exact integer count, each
    // community term the identical double expression rounded onto
    // DECIMAL(24,9) so the cross-community sum is associative.
    "graph_modularity" ->
      s"""WITH ${coEdgesCtes(2)},
         |${lpaCtes(4)},
         |mm AS (SELECT count(*) AS m FROM e2),
         |ldeg AS (
         |  SELECT node, count(*) AS deg FROM ladj GROUP BY 1),
         |ldc AS (
         |  SELECT l.lab, sum(d.deg) AS dc
         |  FROM ldeg d JOIN lp4 l ON d.node = l.node GROUP BY 1),
         |lmc AS (
         |  SELECT la.lab AS lab, count(*) AS mc
         |  FROM e2 JOIN lp4 la ON e2.a = la.node
         |  JOIN lp4 lb ON e2.b = lb.node
         |  WHERE la.lab = lb.lab GROUP BY 1),
         |lterms AS (
         |  SELECT m, CAST(
         |      CAST(COALESCE(mc, 0) AS DOUBLE) / m
         |        - (CAST(dc AS DOUBLE) / (m * 2))
         |          * (CAST(dc AS DOUBLE) / (m * 2))
         |    AS DECIMAL(24,9)) AS term
         |  FROM ldc LEFT JOIN lmc USING (lab) CROSS JOIN mm)
         |SELECT CAST(count(*) AS BIGINT) AS n_communities,
         |  CAST(max(m) AS BIGINT) AS m_edges,
         |  CAST(sum(term) AS DOUBLE) AS modularity
         |FROM lterms""".stripMargin,
    // GraphOps.components twin: recursive transitive closure over the
    // thresholded co-purchase graph; label = least reachable part id —
    // exactly the fixpoint the engine's min-label propagation (pointer
    // jumping) converges to. Pure integer mins, engine-exact.
    "graph_components" ->
      s"""WITH RECURSIVE ${coEdgesCtes(2)},
         |edges AS (
         |  SELECT a AS src, b AS dst FROM e2
         |  UNION SELECT b, a FROM e2),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (
         |  SELECT src AS part, least(src, min(dst)) AS component_id
         |  FROM reach GROUP BY src)
         |SELECT component_id, CAST(count(*) AS BIGINT) AS n_members
         |FROM lab GROUP BY 1
         |ORDER BY n_members DESC, component_id""".stripMargin,

    // GraphOps.kcore twin: 16 unrolled simultaneous-peel rounds (the
    // engine's loop uses the SAME depth cap, so the determinate peel
    // sequence matches whether or not the fixpoint lands inside it);
    // pure integer degree counts.
    "graph_kcore" ->
      s"""WITH ${coEdgesCtes(2)},
         |pe0 AS (
         |  SELECT a AS src, b AS dst FROM e2
         |  UNION ALL SELECT b, a FROM e2),
         |${kcorePeelCtes(3, 16)}
         |SELECT src AS part, CAST(count(*) AS BIGINT) AS core_degree
         |FROM pe16 GROUP BY 1 ORDER BY part""".stripMargin,

    // GraphOps.adamicAdar twin: same non-hub centers (2 ≤ deg ≤ 64),
    // each 1/ln(deg) contribution rounded onto DECIMAL(24,9) so the
    // per-pair sum is exact integer arithmetic in both engines; known
    // edges leave by anti-join; (score, u, v) top-30.
    "graph_adamic_adar" ->
      s"""WITH ${coEdgesCtes(2)},
         |deg AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2)
         |  GROUP BY 1),
         |adj AS (
         |  SELECT a AS w, b AS nb FROM e2
         |  UNION ALL SELECT b, a FROM e2),
         |centers AS (
         |  SELECT node AS w,
         |    CAST(1.0 / ln(CAST(deg AS DOUBLE)) AS DECIMAL(24,9))
         |      AS contrib
         |  FROM deg WHERE deg >= 2 AND deg <= 64),
         |wed AS (
         |  SELECT x.nb AS u, y.nb AS v, c.contrib
         |  FROM adj x JOIN adj y ON x.w = y.w AND x.nb < y.nb
         |  JOIN centers c ON c.w = x.w),
         |sc AS (
         |  SELECT u, v, sum(contrib) AS score_dec,
         |    CAST(count(*) AS BIGINT) AS common_neighbors
         |  FROM wed GROUP BY 1, 2)
         |SELECT u, v, common_neighbors,
         |  CAST(score_dec AS DOUBLE) AS aa_score
         |FROM sc LEFT JOIN e2 ON sc.u = e2.a AND sc.v = e2.b
         |WHERE e2.a IS NULL
         |ORDER BY score_dec DESC, u, v LIMIT 30""".stripMargin,

    // GraphOps.jaccardNeighbors twin: same wedge-join common counts,
    // degrees, union expansion, and the single exact-integer division.
    "graph_jaccard_neighbors" ->
      s"""WITH ${coEdgesCtes(2)},
         |deg AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2)
         |  GROUP BY 1),
         |adj AS (
         |  SELECT a AS w, b AS nb FROM e2
         |  UNION ALL SELECT b, a FROM e2),
         |cm AS (
         |  SELECT x.nb AS u, y.nb AS v,
         |    CAST(count(*) AS BIGINT) AS common_neighbors
         |  FROM adj x JOIN adj y ON x.w = y.w AND x.nb < y.nb
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT u, v, common_neighbors, du.deg AS deg_u,
         |    dv.deg AS deg_v,
         |    CAST(common_neighbors AS DOUBLE)
         |      / CAST(du.deg + dv.deg - common_neighbors AS DOUBLE)
         |      AS jaccard
         |  FROM cm JOIN deg du ON cm.u = du.node
         |  JOIN deg dv ON cm.v = dv.node)
         |SELECT u, v, common_neighbors, deg_u, deg_v, jaccard
         |FROM sc LEFT JOIN e2 ON sc.u = e2.a AND sc.v = e2.b
         |WHERE e2.a IS NULL
         |ORDER BY jaccard DESC, u, v LIMIT 30""".stripMargin,
    // Analytics.minCostSupplier twin (TPC-H Q2 shape): correlated MIN
    // decorrelated as a per-(part, supplier) DECIMAL-exact aggregate +
    // rank-1 window with (offer, suppkey) tiebreak.
    "r_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS offer
        |  FROM lineitem GROUP BY 1, 2),
        |rs AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |best AS (
        |  SELECT l_partkey, offer, s_acctbal, s_name, n_name,
        |    ROW_NUMBER() OVER (PARTITION BY l_partkey
        |                       ORDER BY offer, l_suppkey) AS rn
        |  FROM offers JOIN rs ON l_suppkey = s_suppkey)
        |SELECT s_acctbal AS acctbal, s_name AS supp_name,
        |  n_name AS nation, p_partkey AS partkey, p_name AS part_name,
        |  CAST(offer AS DOUBLE) AS offer
        |FROM best JOIN part ON l_partkey = p_partkey
        |WHERE rn = 1 AND p_size = 10
        |ORDER BY acctbal DESC, nation, supp_name, partkey
        |LIMIT 100""".stripMargin,

    // Analytics.priorityWaitingOrders twin (TPC-H Q4 shape): EXISTS
    // decorrelated as a per-order any-late HAVING over the quarter.
    "r_priority_waiting" ->
      """SELECT o_orderpriority AS priority, count(*) AS order_count
        |FROM (
        |  SELECT o_orderkey, o_orderpriority
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY 1, 2
        |  HAVING max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |    THEN 1 ELSE 0 END) = 1) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // GraphOps.personalizedPageRank twin: the pagerank CTE chain with a
    // seed-conditional teleport base (seeds = NATION_0 customers that
    // traded); same scaled-integer bit-exactness contract.
    "graph_ppr_seeded" ->
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (
         |  SELECT c AS src, p AS dst FROM pairs
         |  UNION ALL SELECT p AS src, c AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |nodes AS (SELECT src AS node FROM deg),
         |seeds AS (
         |  SELECT DISTINCT c_custkey * 2 AS node
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_0'
         |    AND c_custkey * 2 IN (SELECT node FROM nodes)),
         |ks AS (SELECT count(*) AS k FROM seeds),
         |based AS (
         |  SELECT n.node,
         |    CASE WHEN s.node IS NOT NULL
         |      THEN CAST(floor((1.0 - 0.85) / ks.k * 1e12) AS BIGINT)
         |      ELSE 0 END AS base
         |  FROM nodes n
         |  LEFT JOIN seeds s ON s.node = n.node
         |  CROSS JOIN ks),
         |pr0 AS (
         |  SELECT b.node,
         |    CASE WHEN b.base > 0
         |      THEN CAST(floor(1.0 / ks.k * 1e12) AS BIGINT)
         |      ELSE 0 END AS r
         |  FROM based b CROSS JOIN ks),
         |$pprSteps
         |SELECT node,
         |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         |    AS kind,
         |  CAST(r AS DOUBLE) / 1e12 AS ppr
         |FROM pr10 ORDER BY r DESC, node LIMIT 20""".stripMargin,

    // GraphOps.hopHistogram twin: bounded recursive closure, min hop
    // count per node = BFS depth inside the shared 20-hop cap.
    "graph_hop_histogram" ->
      """WITH RECURSIVE tpe AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT src, dst FROM tpe UNION SELECT dst, src FROM tpe),
        |seeds AS (
        |  SELECT DISTINCT c_custkey * 2 AS node FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_0'
        |    AND c_custkey * 2 IN (SELECT src FROM edges)),
        |reach(node, dd) AS (
        |  SELECT node, 0 FROM seeds
        |  UNION
        |  SELECT e.dst, r.dd + 1 FROM reach r JOIN edges e
        |    ON e.src = r.node
        |  WHERE r.dd < 20),
        |lab AS (SELECT node, min(dd) AS distance FROM reach GROUP BY 1)
        |SELECT CAST(distance AS BIGINT) AS distance,
        |  CAST(sum(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_customers,
        |  CAST(sum(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_suppliers
        |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin,

    // GraphOps.butterflies twin: same repeat-business edges, same
    // customer-pivot wedges, pure integer counting — per supplier pair
    // C(w,2) to each supplier, (w-1) to each common customer.
    "graph_butterflies" ->
      """WITH tp AS (
        |  SELECT o_custkey AS c, l_suppkey AS sp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT o_orderkey) >= 2),
        |wedges AS (
        |  SELECT x.c AS c, x.sp AS s1, y.sp AS s2
        |  FROM tp x JOIN tp y ON x.c = y.c AND x.sp < y.sp),
        |pw AS (
        |  SELECT s1, s2, CAST(count(*) AS BIGINT) AS w
        |  FROM wedges GROUP BY 1, 2 HAVING count(*) >= 2),
        |sc AS (
        |  SELECT sp, CAST(sum(w * (w - 1) // 2) AS BIGINT) AS nb FROM (
        |    SELECT unnest([s1, s2]) AS sp, w FROM pw)
        |  GROUP BY 1),
        |cc AS (
        |  SELECT c, CAST(sum(w - 1) AS BIGINT) AS nb
        |  FROM wedges JOIN pw USING (s1, s2) GROUP BY 1)
        |SELECT node, kind, n_butterflies FROM (
        |  SELECT sp * 2 + 1 AS node, 'supplier' AS kind,
        |    nb AS n_butterflies FROM sc
        |  UNION ALL
        |  SELECT c * 2, 'customer', nb FROM cc)
        |WHERE n_butterflies > 0
        |ORDER BY n_butterflies DESC, node LIMIT 20""".stripMargin,

    // SimilarityOps.mmrRerank twin: the brute top-10 slate re-ranked by
    // 5 unrolled greedy MMR rounds. Every number entering the argmax is
    // a rounded-1e-6 cosine, and the 0.7/0.3 weights are literals in
    // both engines, so the greedy picks are bit-exact.
    "emb_mmr_rerank" -> {
      val steps = (2 to 5).map { i =>
        s"""m$i AS (
           |  SELECT c.query_id, c.vec_id, c.rel,
           |    0.7 * c.rel - 0.3 * coalesce(mx.ms, 0.0) AS mmr
           |  FROM cand c
           |  LEFT JOIN (
           |    SELECT s.query_id, cs.ca AS vec_id, max(cs.sim) AS ms
           |    FROM acc${i - 1} s JOIN csim cs
           |      ON cs.query_id = s.query_id AND cs.cb = s.vec_id
           |    GROUP BY 1, 2) mx
           |    ON mx.query_id = c.query_id AND mx.vec_id = c.vec_id
           |  WHERE NOT EXISTS (SELECT 1 FROM acc${i - 1} s2
           |    WHERE s2.query_id = c.query_id AND s2.vec_id = c.vec_id)),
           |sel$i AS (
           |  SELECT query_id, vec_id, rel, mmr, $i AS mmr_rank FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY mmr DESC, vec_id) AS rn FROM m$i)
           |  WHERE rn = 1),
           |acc$i AS (
           |  SELECT * FROM acc${i - 1} UNION ALL SELECT * FROM sel$i)"""
      }.mkString(",\n")
      s"""WITH n AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm
         |  FROM n WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.query_id, c.vec_id,
         |    round(list_sum(list_transform(range(1, len(q.q_emb) + 1),
         |        i -> q.q_emb[i] * c.emb[i])) / (q.q_nrm * c.nrm), 6)
         |      AS rel
         |  FROM q CROSS JOIN n c WHERE c.vec_id <> q.query_id),
         |cand AS (
         |  SELECT query_id, vec_id, rel FROM (
         |    SELECT query_id, vec_id, rel,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY rel DESC, vec_id) AS rank
         |    FROM scored) WHERE rank <= 10),
         |csim AS (
         |  SELECT a.query_id, a.vec_id AS ca, b.vec_id AS cb,
         |    round(list_sum(list_transform(range(1, len(na.emb) + 1),
         |        i -> na.emb[i] * nb.emb[i])) / (na.nrm * nb.nrm), 6)
         |      AS sim
         |  FROM cand a
         |  JOIN cand b ON a.query_id = b.query_id
         |    AND a.vec_id <> b.vec_id
         |  JOIN n na ON na.vec_id = a.vec_id
         |  JOIN n nb ON nb.vec_id = b.vec_id),
         |sel1 AS (
         |  SELECT query_id, vec_id, rel, 0.7 * rel - 0.3 * 0.0 AS mmr,
         |    1 AS mmr_rank
         |  FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rel DESC, vec_id) AS rn FROM cand)
         |  WHERE rn = 1),
         |acc1 AS (SELECT * FROM sel1),
         |$steps
         |SELECT query_id, CAST(mmr_rank AS BIGINT) AS mmr_rank,
         |  vec_id AS neighbor_id, rel AS cosine_sim, mmr AS mmr_score
         |FROM acc5 ORDER BY query_id, mmr_rank""".stripMargin
    },

    // TextOps.pmiCollocations twin: identical integer counts, one
    // double ratio in the same association order, DECIMAL(20,8) score.
    "txt_pmi_collocations" -> {
      val toks = "(SELECT " + toksSql("lower(text)") +
        " AS t FROM documents)"
      s"""WITH toksf AS (SELECT t FROM $toks),
         |uni AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(t) AS term FROM toksf) GROUP BY 1),
         |tot AS (
         |  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS nt,
         |    (SELECT CAST(sum(len(t) - 1) AS BIGINT) FROM toksf
         |     WHERE len(t) >= 2) AS nb),
         |pairs AS (
         |  SELECT p.a AS w1, p.b AS w2, CAST(count(*) AS BIGINT)
         |    AS n_pair
         |  FROM (
         |    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         |      i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
         |    FROM toksf WHERE len(t) >= 2)
         |  GROUP BY 1, 2 HAVING count(*) >= 5)
         |SELECT w1, w2, n_pair,
         |  CAST(CAST(ln((CAST(n_pair AS DOUBLE) * tot.nt * tot.nt)
         |      / (CAST(tot.nb AS DOUBLE) * ca.c * cb.c))
         |    AS DECIMAL(20,8)) AS DOUBLE) AS pmi
         |FROM pairs
         |JOIN uni ca ON ca.term = w1
         |JOIN uni cb ON cb.term = w2
         |CROSS JOIN tot
         |ORDER BY CAST(ln((CAST(n_pair AS DOUBLE) * tot.nt * tot.nt)
         |    / (CAST(tot.nb AS DOUBLE) * ca.c * cb.c))
         |  AS DECIMAL(20,8)) DESC, w1, w2
         |LIMIT 30""".stripMargin
    },

    // GraphOps.triangleCounts twin: same degree orientation ((deg, id)-
    // smaller endpoint first), wedge join closed by an EXISTS — pure
    // integer counting, each triangle credited to all three corners.
    "graph_triangles" ->
      s"""WITH ${coEdgesCtes(2)},
         |deg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM e2
         |    UNION ALL SELECT b AS node FROM e2)
         |  GROUP BY 1),
         |oriented AS (
         |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
         |           THEN a ELSE b END AS u,
         |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
         |           THEN b ELSE a END AS v
         |  FROM e2
         |  JOIN deg da ON da.node = a
         |  JOIN deg db ON db.node = b),
         |tri AS (
         |  SELECT w1.u, w1.v, w2.v AS w
         |  FROM oriented w1 JOIN oriented w2 ON w1.v = w2.u
         |  WHERE EXISTS (SELECT 1 FROM oriented w3
         |                WHERE w3.u = w1.u AND w3.v = w2.v))
         |SELECT part, count(*) AS n_triangles FROM (
         |  SELECT unnest([u, v, w]) AS part FROM tri)
         |GROUP BY 1 ORDER BY n_triangles DESC, part LIMIT 20""".stripMargin,

    // TextOps.rrfFusion twin: the bm25 CTE chain + a TF-IDF retriever
    // (same DECIMAL(20,8) contribution discipline), fused per query by
    // rrf = 1/(60+rank_a) + 1/(60+rank_b) over the two top-10 lists —
    // only RANKS cross the fusion, so the combined ordering is exact.
    "txt_rrf_fusion" -> {
      val toks = "(SELECT doc_id, " + toksSql("lower(text)") +
        " AS t FROM documents)"
      s"""WITH q(query_id, term) AS (
         |  VALUES (1, 'hash'), (1, 'join'), (1, 'merge'),
         |         (2, 'vector'), (2, 'scan'), (2, 'filter'),
         |         (3, 'customer'), (3, 'order'), (3, 'data')),
         |dl AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS len FROM $toks),
         |st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len) AS BIGINT) AS total_len FROM dl),
         |tft AS (
         |  SELECT x.doc_id, x.term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS term FROM $toks) x
         |  WHERE x.term IN (SELECT DISTINCT term FROM q)
         |  GROUP BY 1, 2),
         |dft AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df
         |  FROM tft GROUP BY 1),
         |bsc AS (
         |  SELECT q.query_id, tft.doc_id,
         |    sum(CAST(
         |      ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) *
         |      (tft.tf * (1.2 + 1.0) / (tft.tf + 1.2 * (1.0 - 0.75 +
         |        0.75 * (CAST(dl.len AS DOUBLE)
         |          / (CAST(st.total_len AS DOUBLE) / st.n_docs)))))
         |      AS DECIMAL(20,8))) AS score_dec
         |  FROM tft
         |  JOIN dft USING (term)
         |  JOIN q USING (term)
         |  JOIN dl ON tft.doc_id = dl.doc_id
         |  CROSS JOIN st
         |  GROUP BY 1, 2),
         |tsc AS (
         |  SELECT q.query_id, tft.doc_id,
         |    sum(CAST(tft.tf * ln(CAST(st.n_docs AS DOUBLE) / dft.df)
         |      AS DECIMAL(20,8))) AS score_dec
         |  FROM tft
         |  JOIN dft USING (term)
         |  JOIN q USING (term)
         |  CROSS JOIN st
         |  GROUP BY 1, 2),
         |fa AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT query_id, doc_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY score_dec DESC, doc_id)
         |      AS rank
         |    FROM bsc) WHERE rank <= 10),
         |fb AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT query_id, doc_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY score_dec DESC, doc_id)
         |      AS rank
         |    FROM tsc) WHERE rank <= 10),
         |fu AS (
         |  SELECT coalesce(fa.query_id, fb.query_id) AS query_id,
         |    coalesce(fa.doc_id, fb.doc_id) AS doc_id,
         |    CAST(fa.rank AS BIGINT) AS rank_bm25,
         |    CAST(fb.rank AS BIGINT) AS rank_tfidf,
         |    coalesce(1.0 / (60 + fa.rank), 0.0)
         |      + coalesce(1.0 / (60 + fb.rank), 0.0) AS rrf
         |  FROM fa FULL OUTER JOIN fb
         |    ON fa.query_id = fb.query_id AND fa.doc_id = fb.doc_id)
         |SELECT CAST(query_id AS BIGINT) AS query_id,
         |  CAST(rank AS BIGINT) AS rank, doc_id, rank_bm25, rank_tfidf,
         |  rrf
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rrf DESC, doc_id) AS rank
         |  FROM fu)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    }) ++ Map(

    // EventOps.attributionLastTouch twin: same dense per-user ordinal,
    // same preceding-touch window max, same ordinal join-back — the
    // 24 h cutoff compares micros-exact double seconds in both engines.
    "ev_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |tagged AS (
        |  SELECT *, max(CASE WHEN event_type <> 'purchase' THEN rn END)
        |    OVER (PARTITION BY user_id ORDER BY rn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS touch_rn
        |  FROM ev),
        |touches AS (
        |  SELECT user_id, rn AS touch_rn, event_type AS touch_type,
        |    ts AS touch_ts
        |  FROM ev WHERE event_type <> 'purchase')
        |SELECT
        |  CASE WHEN t.touch_ts IS NOT NULL
        |    AND epoch(p.ts) - epoch(t.touch_ts) <= 86400.0
        |    THEN t.touch_type ELSE 'direct' END AS channel,
        |  count(*) AS n_conversions,
        |  CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS attributed_revenue
        |FROM tagged p LEFT JOIN touches t
        |  ON p.user_id = t.user_id AND p.touch_rn = t.touch_rn
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // EventOps.markovTransitions twin: identical (ts, event_id) lag
    // order; probability is one int/int double division.
    "ev_markov_transitions" ->
      """WITH bi AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type,
        |    event_type AS next_type
        |  FROM events),
        |cnt AS (
        |  SELECT prev_type, next_type, count(*) AS n
        |  FROM bi WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
        |FROM cnt ORDER BY prev_type, next_type""".stripMargin,

    // EventOps.acfHourly twin: BIGINT moment sums end to end; the same
    // guard-then-(sqrt·sqrt)-divide double tail.
    "ev_acf" ->
      """WITH hourly AS (
        |  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
        |    count(*) AS c
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT l.lag, count(*) AS n_pairs,
        |    sum(a.c) AS sx, sum(b.c) AS sy,
        |    sum(a.c * b.c) AS sxy,
        |    sum(a.c * a.c) AS sxx, sum(b.c * b.c) AS syy
        |  FROM hourly a
        |  CROSS JOIN (SELECT CAST(g AS BIGINT) AS lag
        |              FROM generate_series(1, 24) t(g)) l
        |  JOIN hourly b ON a.h + l.lag = b.h
        |  GROUP BY 1)
        |SELECT lag, n_pairs,
        |  CASE WHEN (n_pairs * sxx - sx * sx) > 0
        |    AND (n_pairs * syy - sy * sy) > 0
        |    THEN CAST(n_pairs * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
        |        * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))
        |  END AS acf
        |FROM m ORDER BY lag""".stripMargin,

    // EventOps.abTestZ twin: the same DECIMAL(18,2)-quantized exact
    // Σv/Σv² per (type, arm), then the identical double expression
    // shape for means, Welch variances, and z — bit-exact end to end.
    "ev_ab_ztest" ->
      """WITH g AS (
        |  SELECT event_type, user_id % 2 AS arm, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,2))) AS sv,
        |    sum(CAST(value AS DECIMAL(18,2))
        |      * CAST(value AS DECIMAL(18,2))) AS svv
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type,
        |    max(CASE WHEN arm = 0 THEN n END) AS n_a,
        |    max(CASE WHEN arm = 0 THEN sv END) AS sv_a,
        |    max(CASE WHEN arm = 0 THEN svv END) AS svv_a,
        |    max(CASE WHEN arm = 1 THEN n END) AS n_b,
        |    max(CASE WHEN arm = 1 THEN sv END) AS sv_b,
        |    max(CASE WHEN arm = 1 THEN svv END) AS svv_b
        |  FROM g GROUP BY 1),
        |zc AS (
        |  SELECT event_type, n_a, n_b,
        |    CAST(sv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
        |    CAST(sv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
        |    (CAST(sv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - CAST(sv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |    / sqrt(
        |      (CAST(svv_a AS DOUBLE)
        |        - CAST(sv_a AS DOUBLE) * CAST(sv_a AS DOUBLE)
        |          / CAST(n_a AS DOUBLE))
        |        / CAST(n_a - 1 AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      + (CAST(svv_b AS DOUBLE)
        |        - CAST(sv_b AS DOUBLE) * CAST(sv_b AS DOUBLE)
        |          / CAST(n_b AS DOUBLE))
        |        / CAST(n_b - 1 AS DOUBLE) / CAST(n_b AS DOUBLE)) AS z
        |  FROM w)
        |SELECT event_type, n_a, mean_a, n_b, mean_b, z,
        |  abs(z) > 1.96 AS significant
        |FROM zc ORDER BY event_type""".stripMargin,

    // EventOps.abPowerMde twin: the abTestZ exact-moment frame, then
    // the identical pooled-variance / MDE double expression shapes
    // (z constants 1.96 + 0.8416 hardcoded in both engines).
    "ev_ab_power" ->
      """WITH g AS (
        |  SELECT event_type, user_id % 2 AS arm, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,2))) AS sv,
        |    sum(CAST(value AS DECIMAL(18,2))
        |      * CAST(value AS DECIMAL(18,2))) AS svv
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type,
        |    max(CASE WHEN arm = 0 THEN n END) AS n_a,
        |    max(CASE WHEN arm = 0 THEN sv END) AS sv_a,
        |    max(CASE WHEN arm = 0 THEN svv END) AS svv_a,
        |    max(CASE WHEN arm = 1 THEN n END) AS n_b,
        |    max(CASE WHEN arm = 1 THEN sv END) AS sv_b,
        |    max(CASE WHEN arm = 1 THEN svv END) AS svv_b
        |  FROM g GROUP BY 1),
        |p AS (
        |  SELECT event_type, n_a, n_b,
        |    ((CAST(svv_a AS DOUBLE) - CAST(sv_a AS DOUBLE)
        |        * CAST(sv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |     + (CAST(svv_b AS DOUBLE) - CAST(sv_b AS DOUBLE)
        |        * CAST(sv_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |    / CAST(n_a + n_b - 2 AS DOUBLE) AS pooled_var,
        |    CAST(sv_a + sv_b AS DOUBLE)
        |      / CAST(n_a + n_b AS DOUBLE) AS grand_mean
        |  FROM w)
        |SELECT event_type, n_a, n_b, pooled_var,
        |  2.8016 * sqrt(pooled_var * (1.0 / CAST(n_a AS DOUBLE)
        |    + 1.0 / CAST(n_b AS DOUBLE))) AS mde_abs,
        |  2.8016 * sqrt(pooled_var * (1.0 / CAST(n_a AS DOUBLE)
        |    + 1.0 / CAST(n_b AS DOUBLE))) / grand_mean AS mde_rel
        |FROM p ORDER BY event_type""".stripMargin,

    // EventOps.abSrmCheck twin: distinct (type, user) frame, exact
    // per-arm counts, then the identical 1-df chi-square double shape.
    "ev_ab_srm" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
        |c AS (
        |  SELECT event_type,
        |    count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS users_a,
        |    count(CASE WHEN user_id % 2 = 1 THEN 1 END) AS users_b
        |  FROM u GROUP BY 1)
        |SELECT event_type, users_a, users_b,
        |  CAST(users_a - users_b AS DOUBLE)
        |    * CAST(users_a - users_b AS DOUBLE)
        |    / CAST(users_a + users_b AS DOUBLE) AS chi_sq,
        |  CAST(users_a - users_b AS DOUBLE)
        |    * CAST(users_a - users_b AS DOUBLE)
        |    / CAST(users_a + users_b AS DOUBLE) > 3.841 AS srm
        |FROM c ORDER BY event_type""".stripMargin,

    // EventOps.abCuped twin: same midpoint split (exact integer epoch
    // micros), same DECIMAL(18,2) per-user X/Y totals, same double
    // expression shapes for theta/mean_x, and the same DECIMAL(20,8)
    // quantization of the per-user adjusted metric before the
    // associative per-arm sum.
    "ev_ab_cuped" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(value AS DECIMAL(18,2)) AS q
        |  FROM events),
        |m AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |pu AS (
        |  SELECT user_id,
        |    CAST(COALESCE(sum(CASE WHEN us < mid THEN q END), 0)
        |      AS DECIMAL(18,2)) AS x,
        |    CAST(COALESCE(sum(CASE WHEN us >= mid THEN q END), 0)
        |      AS DECIMAL(18,2)) AS y
        |  FROM ev CROSS JOIN m GROUP BY 1),
        |st AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx FROM pu),
        |th AS (
        |  SELECT
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x
        |  FROM st),
        |adj AS (
        |  SELECT user_id % 2 AS arm, y, theta,
        |    CAST(CAST(y AS DOUBLE) - theta * (CAST(x AS DOUBLE) - mean_x)
        |      AS DECIMAL(20,8)) AS y_adj
        |  FROM pu CROSS JOIN th)
        |SELECT arm, count(*) AS n_users,
        |  CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_y,
        |  CAST(sum(y_adj) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS mean_y_cuped,
        |  max(theta) AS theta
        |FROM adj GROUP BY 1 ORDER BY arm""".stripMargin,

    // EventOps.survivalHazard twin: same integer day durations and
    // censoring, same reverse-cumulative risk window, hazard quantized
    // onto DECIMAL(20,10) before the associative running sum.
    "ev_survival_hazard" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type, value
        |  FROM events),
        |e AS (SELECT max(us) AS tend FROM ev),
        |pu AS (
        |  SELECT user_id, min(us) AS t0,
        |    min(CASE WHEN event_type = 'purchase' AND value > 180
        |      THEN us END) AS tp,
        |    max(tend) AS tend
        |  FROM ev CROSS JOIN e GROUP BY 1),
        |du AS (
        |  SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400000000
        |         ELSE (tend - t0) // 86400000000 END AS day,
        |    tp IS NOT NULL AS observed
        |  FROM pu),
        |bd AS (
        |  SELECT day, count(*) AS exits,
        |    count(CASE WHEN observed THEN 1 END) AS events
        |  FROM du GROUP BY 1),
        |rk AS (
        |  SELECT day, events,
        |    CAST(sum(exits) OVER (ORDER BY day DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_risk
        |  FROM bd),
        |hz AS (
        |  SELECT day, n_risk, events,
        |    CAST(events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard
        |  FROM rk WHERE events > 0)
        |SELECT day, n_risk, events, hazard,
        |  CAST(sum(CAST(hazard AS DECIMAL(20,10))) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS cum_hazard
        |FROM hz ORDER BY day""".stripMargin,

    // EventOps.theilSenTrend twin: same exact daily totals, pairwise
    // slope shape, and deterministic lower-median rank selections.
    "ev_theil_sen" ->
      """WITH dd AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS dref,
        |    sum(CAST(value AS DECIMAL(18,2))) AS xd
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT min(dref) AS d0 FROM dd),
        |x AS (
        |  SELECT event_type, dref - d0 AS day,
        |    CAST(CAST(xd AS DECIMAL(18,2)) AS DOUBLE) AS y
        |  FROM dd CROSS JOIN m),
        |p AS (
        |  SELECT a.event_type, a.day AS di, b.day AS dj,
        |    (b.y - a.y) / CAST(b.day - a.day AS DOUBLE) AS slope
        |  FROM x a JOIN x b ON a.event_type = b.event_type
        |    AND a.day < b.day),
        |ps AS (
        |  SELECT event_type, slope,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY slope, di, dj) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n_pairs
        |  FROM p),
        |sl AS (
        |  SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs, slope
        |  FROM ps WHERE rn = (n_pairs + 1) // 2),
        |rs AS (
        |  SELECT x.event_type, sl.n_pairs, sl.slope, x.day,
        |    x.y - sl.slope * CAST(x.day AS DOUBLE) AS r
        |  FROM x JOIN sl ON x.event_type = sl.event_type),
        |ri AS (
        |  SELECT event_type, n_pairs, slope, r,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY r, day) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n_days
        |  FROM rs)
        |SELECT event_type, CAST(n_days AS BIGINT) AS n_days, n_pairs,
        |  slope, r AS intercept
        |FROM ri WHERE rn = (n_days + 1) // 2
        |ORDER BY event_type""".stripMargin,

    // EventOps.ewmaDaily twin: same DECIMAL(18,2) daily totals, same
    // renormalized integer weights 2^(39-dk) (exact decimal products,
    // no per-term float), same single exponent-shift division by 2^40.
    "ev_ewma_daily" ->
      """WITH dd AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS dref,
        |    sum(CAST(value AS DECIMAL(18,2))) AS xd
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT min(dref) AS d0 FROM dd),
        |x AS (
        |  SELECT event_type, dref - d0 AS day,
        |    CAST(xd AS DECIMAL(18,2)) AS xq
        |  FROM dd CROSS JOIN m),
        |t AS (
        |  SELECT a.event_type, a.day, a.xq,
        |    CAST(b.xq AS DECIMAL(25,2)) * CAST(1::BIGINT
        |      << CAST(39 - (a.day - b.day) AS INTEGER)
        |      AS DECIMAL(12,0)) AS term
        |  FROM x a JOIN x b ON a.event_type = b.event_type
        |    AND b.day <= a.day AND a.day - b.day < 40)
        |SELECT event_type, day, CAST(xq AS DOUBLE) AS x_day,
        |  CAST(sum(term) AS DOUBLE) / 1099511627776.0 AS ewma
        |FROM t GROUP BY event_type, day, xq
        |ORDER BY event_type, day""".stripMargin,

    // EventOps.psiValueDrift twin: same exact-rank decile edges from
    // the baseline week, same 1e-4 floor, per-bin term quantized onto
    // DECIMAL(24,9) before the associative cross-bin sum.
    "ev_psi_drift" ->
      """WITH ev AS (
        |  SELECT epoch(ts) AS sec, value FROM events),
        |span AS (SELECT min(sec) AS lo, max(sec) AS hi FROM ev),
        |base AS (
        |  SELECT value FROM ev CROSS JOIN span
        |  WHERE sec < lo + 604800.0),
        |cur AS (
        |  SELECT value FROM ev CROSS JOIN span
        |  WHERE sec >= hi - 604800.0),
        |ranked AS (
        |  SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rn,
        |    COUNT(*) OVER () AS cnt
        |  FROM base),
        |bp AS (
        |  SELECT
        |    max(CASE WHEN rn = GREATEST(1, (10 * cnt + 99) // 100)
        |      THEN value END) AS b0,
        |    max(CASE WHEN rn = GREATEST(1, (20 * cnt + 99) // 100)
        |      THEN value END) AS b1,
        |    max(CASE WHEN rn = GREATEST(1, (30 * cnt + 99) // 100)
        |      THEN value END) AS b2,
        |    max(CASE WHEN rn = GREATEST(1, (40 * cnt + 99) // 100)
        |      THEN value END) AS b3,
        |    max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100)
        |      THEN value END) AS b4,
        |    max(CASE WHEN rn = GREATEST(1, (60 * cnt + 99) // 100)
        |      THEN value END) AS b5,
        |    max(CASE WHEN rn = GREATEST(1, (70 * cnt + 99) // 100)
        |      THEN value END) AS b6,
        |    max(CASE WHEN rn = GREATEST(1, (80 * cnt + 99) // 100)
        |      THEN value END) AS b7,
        |    max(CASE WHEN rn = GREATEST(1, (90 * cnt + 99) // 100)
        |      THEN value END) AS b8
        |  FROM ranked),
        |bb AS (
        |  SELECT CASE WHEN value <= b0 THEN 0 WHEN value <= b1 THEN 1
        |    WHEN value <= b2 THEN 2 WHEN value <= b3 THEN 3
        |    WHEN value <= b4 THEN 4 WHEN value <= b5 THEN 5
        |    WHEN value <= b6 THEN 6 WHEN value <= b7 THEN 7
        |    WHEN value <= b8 THEN 8 ELSE 9 END AS bin
        |  FROM base CROSS JOIN bp),
        |cb AS (
        |  SELECT CASE WHEN value <= b0 THEN 0 WHEN value <= b1 THEN 1
        |    WHEN value <= b2 THEN 2 WHEN value <= b3 THEN 3
        |    WHEN value <= b4 THEN 4 WHEN value <= b5 THEN 5
        |    WHEN value <= b6 THEN 6 WHEN value <= b7 THEN 7
        |    WHEN value <= b8 THEN 8 ELSE 9 END AS bin
        |  FROM cur CROSS JOIN bp),
        |bins AS (
        |  SELECT CAST(g AS BIGINT) AS bin
        |  FROM generate_series(0, 9) t(g)),
        |joined AS (
        |  SELECT bins.bin,
        |    coalesce(nb.n, 0) AS n_base, coalesce(nc.n, 0) AS n_cur
        |  FROM bins
        |  LEFT JOIN (SELECT bin, count(*) AS n FROM bb GROUP BY 1) nb
        |    ON bins.bin = nb.bin
        |  LEFT JOIN (SELECT bin, count(*) AS n FROM cb GROUP BY 1) nc
        |    ON bins.bin = nc.bin),
        |tots AS (
        |  SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM joined),
        |terms AS (
        |  SELECT bin, n_base, n_cur,
        |    greatest(CAST(n_base AS DOUBLE) / tb, 0.0001) AS p,
        |    greatest(CAST(n_cur AS DOUBLE) / tc, 0.0001) AS q
        |  FROM joined CROSS JOIN tots),
        |td AS (
        |  SELECT bin, n_base, n_cur, p, q,
        |    CAST((p - q) * ln(p / q) AS DECIMAL(24,9)) AS contrib_dec
        |  FROM terms)
        |SELECT bin, n_base, n_cur, p, q,
        |  CAST(contrib_dec AS DOUBLE) AS contrib,
        |  CAST(sum(contrib_dec) OVER () AS DOUBLE) AS psi
        |FROM td ORDER BY bin""".stripMargin,

    // TextOps.giniTokens twin: BIGINT rank identity end to end, one
    // double division pair at the surface.
    "txt_gini_tokens" ->
      s"""WITH per AS (
         |  SELECT doc_id, lang,
         |    CAST(len(${toksSql("text")}) AS BIGINT) AS x
         |  FROM documents),
         |ranked AS (
         |  SELECT lang, x, CAST(ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY x, doc_id) AS BIGINT) AS i
         |  FROM per),
         |agg AS (
         |  SELECT lang, count(*) AS n_docs, sum(x) AS total_tokens,
         |    sum(i * x) AS swx
         |  FROM ranked GROUP BY 1)
         |SELECT lang, n_docs,
         |  CAST(total_tokens AS BIGINT) AS total_tokens,
         |  CASE WHEN total_tokens > 0
         |    THEN CAST(2 * swx - (n_docs + 1) * total_tokens AS DOUBLE)
         |      / CAST(n_docs * total_tokens AS DOUBLE)
         |  END AS gini
         |FROM agg ORDER BY lang""".stripMargin,

    // TextOps.ksSplitDrift twin: integer window cumsums (associative —
    // segment-tree vs sequential evaluation agree), one ECDF division
    // per side, argmax by (gap DESC, value).
    "txt_ks_drift" ->
      s"""WITH per AS (
         |  SELECT CAST(len(${toksSql("text")}) AS BIGINT) AS v,
         |    CASE WHEN CAST(concat('0x', substr(md5(text), 1, 8))
         |        AS BIGINT) % 100 < 10
         |      THEN 'test' ELSE 'train' END AS split
         |  FROM documents),
         |byval AS (
         |  SELECT v,
         |    sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS a,
         |    sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS b
         |  FROM per GROUP BY 1),
         |ecdf AS (
         |  SELECT v,
         |    sum(a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS ca,
         |    sum(b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS cb,
         |    sum(a) OVER () AS na, sum(b) OVER () AS nb
         |  FROM byval),
         |gaps AS (
         |  SELECT na, nb, v,
         |    abs(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
         |      AS gap,
         |    ROW_NUMBER() OVER (ORDER BY abs(CAST(ca AS DOUBLE) / na
         |      - CAST(cb AS DOUBLE) / nb) DESC, v) AS rn
         |  FROM ecdf)
         |SELECT CAST(na AS BIGINT) AS n_train,
         |  CAST(nb AS BIGINT) AS n_test, gap AS ks_stat,
         |  v AS ks_at_value
         |FROM gaps WHERE rn = 1""".stripMargin,

    // TextOps.chisqLangLength twin: full R×C grid incl. zero-observed
    // cells; per-cell double chain quantized onto DECIMAL(24,9) before
    // the associative χ² total.
    "txt_chisq_lang_length" ->
      """WITH b AS (
        |  SELECT lang,
        |    CASE WHEN n_chars < 200 THEN 'short'
        |      WHEN n_chars < 400 THEN 'medium'
        |      ELSE 'long' END AS bucket
        |  FROM documents),
        |counted AS (
        |  SELECT lang, bucket, count(*) AS obs FROM b GROUP BY 1, 2),
        |rt AS (SELECT lang, sum(obs) AS rt FROM counted GROUP BY 1),
        |ct AS (SELECT bucket, sum(obs) AS ct FROM counted GROUP BY 1),
        |tot AS (SELECT sum(obs) AS n FROM counted),
        |cells AS (
        |  SELECT rt.lang, ct.bucket,
        |    coalesce(c.obs, 0) AS observed
        |  FROM (SELECT lang FROM rt) rt
        |  CROSS JOIN (SELECT bucket FROM ct) ct
        |  LEFT JOIN counted c
        |    ON rt.lang = c.lang AND ct.bucket = c.bucket),
        |terms AS (
        |  SELECT cells.lang, cells.bucket, observed,
        |    CAST(rt.rt * ct.ct AS DOUBLE) / tot.n AS expected
        |  FROM cells
        |  JOIN rt ON cells.lang = rt.lang
        |  JOIN ct ON cells.bucket = ct.bucket
        |  CROSS JOIN tot),
        |td AS (
        |  SELECT lang, bucket, observed, expected,
        |    CAST((observed - expected) * (observed - expected)
        |      / expected AS DECIMAL(24,9)) AS contrib_dec
        |  FROM terms)
        |SELECT lang, bucket, observed, expected,
        |  CAST(contrib_dec AS DOUBLE) AS contrib,
        |  CAST(sum(contrib_dec) OVER () AS DOUBLE) AS chi2
        |FROM td ORDER BY lang, bucket""".stripMargin,

    // Relational.skylineParts twin: the quadratic NOT EXISTS dominance
    // spec — the engine's sort-order identity must agree exactly.
    "r_skyline" ->
      """SELECT p_partkey, p_name, p_retailprice,
        |  CAST(p_size AS BIGINT) AS p_size
        |FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice
        |    AND b.p_size <= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice
        |      OR b.p_size < a.p_size))
        |ORDER BY p_retailprice, p_partkey""".stripMargin,

    // GraphOps.hits twin: 4 unrolled half-round pairs of the same
    // scaled-integer iterate (see hitsSteps).
    "graph_hits" ->
      s"""WITH e AS (
         |  SELECT DISTINCT o_custkey AS c, l_suppkey AS p
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |h0 AS (SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS hub
         |  FROM e),
         |$hitsSteps,
         |ta AS (
         |  SELECT 'authority' AS kind,
         |    CAST(ROW_NUMBER() OVER (ORDER BY auth DESC, p) AS BIGINT)
         |      AS rank,
         |    p * 2 + 1 AS node, CAST(auth AS DOUBLE) / 1e6 AS score
         |  FROM a4),
         |th AS (
         |  SELECT 'hub' AS kind,
         |    CAST(ROW_NUMBER() OVER (ORDER BY hub DESC, c) AS BIGINT)
         |      AS rank,
         |    c * 2 AS node, CAST(hub AS DOUBLE) / 1e6 AS score
         |  FROM h4)
         |SELECT * FROM (
         |  SELECT * FROM ta WHERE rank <= 10
         |  UNION ALL SELECT * FROM th WHERE rank <= 10)
         |ORDER BY kind, rank""".stripMargin,

    // SimilarityOps.kcenterCoreset twin: 7 unrolled farthest-first
    // rounds of the same round-6 cosine, coalesce(-1) NaN guard, and
    // (max_sim ASC, vec_id) argmin.
    "emb_kcenter_coreset" -> {
      def simSql(p: String, c: String): String =
        s"round(list_sum(list_transform(range(1, len($p.emb) + 1), " +
          s"i -> $p.emb[i] * $c.emb[i])) / ($p.nrm * $c.nrm), 6)"
      val steps = (2 to 8).map { i =>
        s"""sel$i AS (
           |  SELECT vec_id, max_sim FROM (
           |    SELECT *, ROW_NUMBER() OVER (ORDER BY max_sim ASC,
           |      vec_id) AS rn
           |    FROM st${i - 1}) WHERE rn = 1),
           |st$i AS (
           |  SELECT p.vec_id, p.emb, p.nrm,
           |    greatest(p.max_sim,
           |      coalesce(${simSql("p", "c")}, -1.0)) AS max_sim
           |  FROM st${i - 1} p
           |  JOIN n c ON c.vec_id = (SELECT vec_id FROM sel$i)
           |  WHERE p.vec_id <> c.vec_id)"""
      }.mkString(",\n")
      val picks = (2 to 8).map { i =>
        s"SELECT CAST($i AS BIGINT) AS k_rank, vec_id, " +
          s"max_sim AS pick_sim FROM sel$i"
      }.mkString("\n  UNION ALL ")
      s"""WITH n AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         |  FROM embeddings),
         |c1 AS (
         |  SELECT * FROM n
         |  WHERE vec_id = (SELECT min(vec_id) FROM n)),
         |st1 AS (
         |  SELECT p.vec_id, p.emb, p.nrm,
         |    coalesce(${simSql("p", "c")}, -1.0) AS max_sim
         |  FROM n p CROSS JOIN c1 c WHERE p.vec_id <> c.vec_id),
         |$steps
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS k_rank,
         |    (SELECT min(vec_id) FROM n) AS vec_id,
         |    CAST(NULL AS DOUBLE) AS pick_sim
         |  UNION ALL $picks)
         |ORDER BY k_rank""".stripMargin
    },

    // GraphOps.sssp twin: 8 unrolled full Bellman–Ford relaxation
    // rounds. The engine relaxes only from the previous round's improved
    // frontier, but a non-improved source contributes the same candidate
    // it contributed last round (already folded into the min), so the
    // round-i state is identical to full relaxation — and the shared
    // round cap makes the comparison exact whether or not the fixpoint
    // lands inside it (the k-core/BFS discipline). All-integer min-plus:
    // no rounding surface anywhere.
    "graph_sssp" -> {
      val rounds = (1 to 8).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT node, min(cost) AS cost FROM (
           |    SELECT node, cost FROM d${i - 1}
           |    UNION ALL
           |    SELECT e.dst AS node, d.cost + e.w AS cost
           |    FROM d${i - 1} d JOIN edges e ON e.src = d.node
           |  ) GROUP BY 1)"""
      }.mkString(",\n")
      s"""WITH pw AS (
         |  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p,
         |    greatest(1, min(abs(datediff('day', o_orderdate, l_shipdate))))
         |      AS w
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1, 2),
         |edges AS MATERIALIZED (
         |  SELECT c AS src, p AS dst, w FROM pw
         |  UNION ALL SELECT p AS src, c AS dst, w FROM pw),
         |d0 AS (
         |  SELECT DISTINCT c_custkey * 2 AS node, CAST(0 AS BIGINT) AS cost
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_0'
         |    AND c_custkey * 2 IN (SELECT src FROM edges)),
         |$rounds
         |SELECT cost // 50 AS cost_band,
         |  CAST(sum(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_customers,
         |  CAST(sum(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_suppliers,
         |  min(cost) AS min_cost, max(cost) AS max_cost
         |FROM d8 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // DedupOps.editVerifiedPairs twin: the exact-Jaccard pair truth the
    // LSH path reproduces, re-ranked by plain Levenshtein on the same
    // 200-char prefixes (the engine's bounded form returns the exact
    // distance whenever it is <= the bound, so the <= filter twins it).
    "dedup_edit_verify" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("lower(text)")} AS t,
         |    substr(text, 1, 200) AS pre
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, shingle FROM (
         |    SELECT doc_id, unnest(list_transform(
         |      generate_series(1, len(t) - 2),
         |      i -> array_to_string(t[i:i+2], ' '))) AS shingle
         |    FROM toks WHERE len(t) >= 3)),
         |pairforming AS (
         |  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= 2),
         |idx AS (
         |  SELECT * FROM sh
         |  WHERE shingle IN (SELECT shingle FROM pairforming)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM idx a JOIN idx b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |verified AS (
         |  SELECT doc_a, doc_b FROM pairs
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE shared * 100 >= 60 * (sa.n_sh + sb.n_sh - shared))
         |SELECT doc_a, doc_b,
         |  CAST(levenshtein(ta.pre, tb.pre) AS BIGINT) AS edit_dist,
         |  CAST(1 AS DOUBLE) - CAST(levenshtein(ta.pre, tb.pre)
         |      AS DOUBLE)
         |    / greatest(length(ta.pre), length(tb.pre)) AS edit_sim
         |FROM verified
         |JOIN toks ta ON doc_a = ta.doc_id
         |JOIN toks tb ON doc_b = tb.doc_id
         |WHERE levenshtein(ta.pre, tb.pre) <= 16
         |ORDER BY doc_a, doc_b""".stripMargin,

    // DedupOps.simhashAudit twin: both registered detectors' pair sets
    // (the shared CTE fragments), full-outer joined and counted.
    "dedup_simhash_audit" ->
      s"""WITH $simhashPairsCtes,
         |$ngramPairsCtes,
         |sp AS (
         |  SELECT doc_a, doc_b FROM cand WHERE hamming <= 3),
         |fo AS (
         |  SELECT sp.doc_a IS NOT NULL AS in_s,
         |    j.doc_a IS NOT NULL AS in_e
         |  FROM sp FULL OUTER JOIN jpairs j
         |    ON sp.doc_a = j.doc_a AND sp.doc_b = j.doc_b),
         |agg AS (
         |  SELECT
         |    sum(CASE WHEN in_s THEN 1 ELSE 0 END) AS n_simhash,
         |    sum(CASE WHEN in_e THEN 1 ELSE 0 END) AS n_exact,
         |    sum(CASE WHEN in_s AND in_e THEN 1 ELSE 0 END) AS tp,
         |    sum(CASE WHEN in_s AND NOT in_e THEN 1 ELSE 0 END) AS fp,
         |    sum(CASE WHEN NOT in_s AND in_e THEN 1 ELSE 0 END) AS fn
         |  FROM fo)
         |SELECT CAST(n_simhash AS BIGINT) AS n_simhash,
         |  CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |  CAST(fn AS BIGINT) AS fn,
         |  CASE WHEN tp + fp > 0
         |    THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
         |  CASE WHEN tp + fn > 0
         |    THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall
         |FROM agg""".stripMargin,

    // Relational.pitJoin twin: the same union-sort as-of pick —
    // version-at-equal-ts wins via (ts, is_v DESC, version), zero-width
    // versions collapse to the later one.
    "r_pit_join" ->
      """WITH v AS (
        |  SELECT o_custkey AS key, o_orderstatus AS status,
        |    CAST(o_orderdate AS TIMESTAMP) AS ts,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS version
        |  FROM orders),
        |p AS (
        |  SELECT o_custkey AS key, CAST(l_shipdate AS TIMESTAMP) AS ts,
        |    l_quantity AS qty
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |u AS (
        |  SELECT key, ts, 1 AS is_v, version, status,
        |    CAST(NULL AS DOUBLE) AS qty
        |  FROM v
        |  UNION ALL
        |  SELECT key, ts, 0 AS is_v, 0 AS version,
        |    CAST(NULL AS VARCHAR) AS status, qty
        |  FROM p),
        |wnd AS (
        |  SELECT *, last_value(CASE WHEN is_v = 1 THEN status END
        |      IGNORE NULLS)
        |    OVER (PARTITION BY key ORDER BY ts, is_v DESC, version
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS as_of_status
        |  FROM u)
        |SELECT as_of_status AS status, count(*) AS n_lines,
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM wnd WHERE is_v = 0
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin)

  /** GraphOps.ktrussFromEdges twin: `rounds` unrolled simultaneous
    * edge-peel CTEs — each recomputes every surviving edge's triangle
    * support (common-neighbor count over the surviving set) and drops
    * all edges under k−2 at once. MATERIALIZED for the same
    * doubly-referenced-chain reason as [[kcorePeelCtes]]. Edges with
    * zero support vanish from the inner support join — correct, since
    * 0 < k−2 for every k ≥ 3.
    */
  private def ktrussPeelCtes(k: Int, rounds: Int): String =
    (1 to rounds).map { i =>
      s"""tadj$i AS MATERIALIZED (
         |  SELECT a AS w, b AS nb FROM te${i - 1}
         |  UNION ALL SELECT b, a FROM te${i - 1}),
         |tsup$i AS MATERIALIZED (
         |  SELECT e.a, e.b, count(*) AS sup
         |  FROM te${i - 1} e
         |  JOIN tadj$i x ON x.w = e.a
         |  JOIN tadj$i y ON y.w = e.b AND y.nb = x.nb
         |  GROUP BY 1, 2),
         |te$i AS MATERIALIZED (
         |  SELECT e.a, e.b FROM te${i - 1} e
         |  JOIN tsup$i s ON s.a = e.a AND s.b = e.b
         |  WHERE s.sup >= ${k - 2})"""
    }.mkString(",\n")

  val round9: Map[String, String] = Map(
    // Relational.equiwidthHist twin: integer cents, one ceil-div width,
    // integer div bucketing, empty buckets via the range grid.
    "r_equiwidth_hist" ->
      """WITH c AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT) AS cents
        |  FROM orders),
        |span AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c),
        |counts AS (
        |  SELECT (cents - lo) // ((hi - lo + 10) // 10) AS bucket,
        |    count(*) AS n_rows
        |  FROM c, span GROUP BY 1)
        |SELECT g.bucket,
        |  CAST(coalesce(counts.n_rows, 0) AS BIGINT) AS n_rows,
        |  CAST(lo + g.bucket * ((hi - lo + 10) // 10) AS DOUBLE) / 100
        |    AS bin_lo,
        |  CAST(lo + (g.bucket + 1) * ((hi - lo + 10) // 10) - 1
        |    AS DOUBLE) / 100 AS bin_hi
        |FROM (SELECT unnest(range(0, 10)) AS bucket) g
        |CROSS JOIN span
        |LEFT JOIN counts ON counts.bucket = g.bucket
        |ORDER BY g.bucket""".stripMargin,

    // EventOps.paretoCover twin: global desc-sort + cumulative window
    // (fine single-node), identical integer ceil targets; min rank
    // where the cumsum crosses is tie-order independent.
    "ev_pareto_cover" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
        |      AS x
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(x) AS BIGINT) AS tm, count(*) AS tu FROM per),
        |ranked AS (
        |  SELECT x,
        |    ROW_NUMBER() OVER (ORDER BY x DESC, user_id) AS r,
        |    sum(x) OVER (ORDER BY x DESC, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM per),
        |p(pct) AS (VALUES (50), (80), (90)),
        |-- tm > 0 guard: with zero total mass the ParetoCover aggregate
        |-- emits n_users = 0 with 0.0 shares (its documented zero-target
        |-- branch); an unguarded min(r) WHERE cum >= 0 would pick rank 1
        |-- and divide by tm = 0 — a silent gate mismatch on an all-zero
        |-- fixture slice.
        |hit AS (
        |  SELECT p.pct, min(r) AS n_users
        |  FROM p, tot, ranked
        |  WHERE tm > 0 AND cum >= (pct * tm + 99) // 100
        |  GROUP BY 1)
        |SELECT CAST(p.pct AS BIGINT) AS pct,
        |  CAST(coalesce(h.n_users, 0) AS BIGINT) AS n_users,
        |  CASE WHEN h.n_users IS NOT NULL
        |    THEN CAST(h.n_users AS DOUBLE) / tu ELSE 0.0 END
        |    AS user_share,
        |  CASE WHEN h.n_users IS NOT NULL
        |    THEN CAST((SELECT cum FROM ranked WHERE r = h.n_users)
        |      AS DOUBLE) / tm
        |    ELSE 0.0 END AS mass_share
        |FROM p CROSS JOIN tot LEFT JOIN hit h ON p.pct = h.pct
        |ORDER BY pct""".stripMargin,

    // EventOps.timeToConvert twin: BIGINT micro latencies, the
    // ev_value_quantiles integer-rank pick, one division per surface.
    "ev_time_to_convert" ->
      """WITH per AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_us,
        |    min(CASE WHEN event_type = 'purchase' AND value > 180
        |      THEN epoch_us(ts) END) AS conv_us
        |  FROM events GROUP BY 1),
        |lats AS (
        |  SELECT conv_us - first_us AS lat FROM per
        |  WHERE conv_us IS NOT NULL),
        |r AS (
        |  SELECT lat, ROW_NUMBER() OVER (ORDER BY lat) AS rn,
        |    COUNT(*) OVER () AS cnt
        |  FROM lats),
        |q AS (
        |  SELECT
        |    max(CASE WHEN rn = GREATEST(1, (25 * cnt + 99) // 100)
        |      THEN lat END) AS q25,
        |    max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100)
        |      THEN lat END) AS q50,
        |    max(CASE WHEN rn = GREATEST(1, (75 * cnt + 99) // 100)
        |      THEN lat END) AS q75,
        |    max(CASE WHEN rn = GREATEST(1, (90 * cnt + 99) // 100)
        |      THEN lat END) AS q90
        |  FROM r),
        |tot AS (
        |  SELECT count(*) AS n_users, count(conv_us) AS n_converted
        |  FROM per)
        |SELECT n_users, n_converted,
        |  CAST(n_converted AS DOUBLE) / n_users AS conversion_rate,
        |  CAST(q25 AS DOUBLE) / 1e6 AS p25_sec,
        |  CAST(q50 AS DOUBLE) / 1e6 AS p50_sec,
        |  CAST(q75 AS DOUBLE) / 1e6 AS p75_sec,
        |  CAST(q90 AS DOUBLE) / 1e6 AS p90_sec
        |FROM tot CROSS JOIN q""".stripMargin,

    // EventOps.dauWauMau twin: the distinct (user, day) frame fanned
    // into the trailing windows, exact distinct counts, one division.
    "ev_dau_wau_mau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |days AS (SELECT DISTINCT day AS day_g FROM ud),
        |dau AS (
        |  SELECT day AS day_g, count(DISTINCT user_id) AS dau
        |  FROM ud GROUP BY 1),
        |wau AS (
        |  SELECT g.day_g, count(DISTINCT u.user_id) AS wau
        |  FROM days g JOIN ud u
        |    ON g.day_g - u.day >= 0 AND g.day_g - u.day < 7
        |  GROUP BY 1),
        |mau AS (
        |  SELECT g.day_g, count(DISTINCT u.user_id) AS mau
        |  FROM days g JOIN ud u
        |    ON g.day_g - u.day >= 0 AND g.day_g - u.day < 30
        |  GROUP BY 1)
        |SELECT dau.day_g AS day, dau.dau, wau.wau, mau.mau,
        |  CAST(dau.dau AS DOUBLE) / mau.mau AS stickiness
        |FROM dau JOIN wau ON dau.day_g = wau.day_g
        |JOIN mau ON dau.day_g = mau.day_g
        |ORDER BY day""".stripMargin,

    // EventOps.dauWauMauSketch twin (the ev_sliding_distinct audit
    // discipline): exact dau/wau/mau on every 3rd calendar day, TRUE
    // bound flags where audited, NULLs elsewhere — the HLL estimates
    // never cross the compare.
    "ev_dau_wau_mau_sketch" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |obs AS (SELECT DISTINCT day FROM ud),
        |ex AS (
        |  SELECT day + u.off AS day_g,
        |    count(DISTINCT CASE WHEN u.off = 0 THEN user_id END)
        |      AS exact_dau,
        |    count(DISTINCT CASE WHEN u.off < 7 THEN user_id END)
        |      AS exact_wau,
        |    count(DISTINCT user_id) AS exact_mau
        |  FROM ud CROSS JOIN
        |    (SELECT unnest(generate_series(0, 29)) AS off) u
        |  WHERE (day + u.off) % 3 = 0
        |  GROUP BY 1)
        |SELECT o.day, ex.exact_dau, ex.exact_wau, ex.exact_mau,
        |  CASE WHEN ex.exact_dau IS NOT NULL THEN TRUE END AS dau_within,
        |  CASE WHEN ex.exact_wau IS NOT NULL THEN TRUE END AS wau_within,
        |  CASE WHEN ex.exact_mau IS NOT NULL THEN TRUE END AS mau_within
        |FROM obs o LEFT JOIN ex ON o.day = ex.day_g
        |ORDER BY o.day""".stripMargin,

    // EventOps.newVsReturning twin: first-seen min per user joined back,
    // one day-keyed count; integer counts, one double division.
    "ev_new_returning" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1)
        |SELECT ud.day, count(*) AS n_active,
        |  CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new,
        |  CAST(count(*) - sum(CASE WHEN ud.day = f.first_day
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
        |  CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS new_share
        |FROM ud JOIN f ON ud.user_id = f.user_id
        |GROUP BY 1 ORDER BY ud.day""".stripMargin,

    // EventOps.churnWeekly twin: the distinct (user, week) frame
    // left-joined against itself shifted one week; integer counts.
    "ev_churn_weekly" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 // 7 AS week
        |  FROM events),
        |mx AS (SELECT max(week) AS max_week FROM uw)
        |SELECT uw.week, count(*) AS n_active,
        |  CAST(sum(CASE WHEN n.user_id IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_churned,
        |  CAST(sum(CASE WHEN n.user_id IS NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS churn_rate
        |FROM uw
        |LEFT JOIN uw n
        |  ON n.user_id = uw.user_id AND n.week = uw.week + 1
        |CROSS JOIN mx
        |WHERE uw.week < mx.max_week
        |GROUP BY 1 ORDER BY uw.week""".stripMargin,

    // EventOps.interarrival twin: gaps from each (type, user)'s SORTED
    // timestamp multiset (order-determinate under duplicate ts), exact
    // ceil-rank quantiles (the ExactQuantiles contract).
    "ev_interarrival" ->
      """WITH per AS (
        |  SELECT event_type, user_id,
        |    list_sort(list(epoch_us(ts))) AS tss
        |  FROM events GROUP BY 1, 2),
        |gaps AS (
        |  SELECT event_type,
        |    unnest(list_transform(range(2, len(tss) + 1),
        |      i -> tss[i] - tss[i-1])) AS gap
        |  FROM per),
        |r AS (
        |  SELECT event_type, gap,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap)
        |      AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM gaps)
        |SELECT event_type, CAST(max(cnt) AS BIGINT) AS n_gaps,
        |  CAST(max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100)
        |    THEN gap END) AS DOUBLE) / 1e6 AS p50_sec,
        |  CAST(max(CASE WHEN rn = GREATEST(1, (90 * cnt + 99) // 100)
        |    THEN gap END) AS DOUBLE) / 1e6 AS p90_sec
        |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin,

    // EmbPipeline.stageSummary twin: DuckDB re-counts the parquet each
    // stage STAGED (the corpus_pipeline_stages discipline for the
    // vector pipeline) — a mismatch means the pipeline's report
    // diverged from what it wrote.
    "emb_pipeline_stages" ->
      s"""SELECT '1_total' AS stage, count(*) AS n_rows FROM embeddings
         |UNION ALL SELECT '2_valid', count(*)
         |  FROM read_parquet('$embStageDir/valid/*.parquet')
         |UNION ALL SELECT '3_semdedup', count(*)
         |  FROM read_parquet('$embStageDir/survivors/*.parquet')
         |UNION ALL SELECT '4_sample', count(*)
         |  FROM read_parquet('$embStageDir/sample/*.parquet')
         |UNION ALL SELECT '5_export_int8', count(*)
         |  FROM read_parquet('$embStageDir/export_int8/*.parquet')
         |ORDER BY stage""".stripMargin,

    // EventOps.percentileCont twin: both engines implement the ANSI
    // percentile_cont linear interpolation at h = (n−1)·p — Spark's
    // exact `percentile` aggregate vs DuckDB's quantile_cont.
    "ev_percentile_cont" ->
      """SELECT event_type, count(*) AS n_events,
        |  quantile_cont(value, 0.25) AS p25_cont,
        |  quantile_cont(value, 0.5) AS p50_cont,
        |  quantile_cont(value, 0.9) AS p90_cont
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    // EventOps.userEntropy twin: per-(user, type) shares, −p·ln p
    // rounded onto DECIMAL(24,9) before the ≤|types|-term sum, floor
    // bucketing on the identical double.
    "ev_user_entropy" ->
      """WITH ut AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |sh AS (
        |  SELECT user_id, c,
        |    sum(c) OVER (PARTITION BY user_id) AS n
        |  FROM ut),
        |per AS (
        |  SELECT user_id,
        |    sum(CAST((-(c / n)) * ln(c / n) AS DECIMAL(24,9))) AS h
        |  FROM sh GROUP BY 1)
        |SELECT CAST(floor(CAST(h AS DOUBLE) * 64) AS BIGINT) AS bucket,
        |  count(*) AS n_users,
        |  CAST(sum(h) AS DOUBLE) / count(*) AS avg_entropy
        |FROM per GROUP BY 1 ORDER BY bucket""".stripMargin,

    // TextOps.mattr twin: identical 1-based window slices, integer
    // distinct counts, one double division.
    "txt_mattr" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, ${toksSql("lower(text)")} AS ws
         |  FROM documents),
         |per AS (
         |  SELECT doc_id, lang, CAST(len(ws) AS BIGINT) AS n_tokens, ws
         |  FROM t WHERE len(ws) >= 1)
         |SELECT doc_id, lang, n_tokens,
         |  CASE WHEN n_tokens <= 50
         |    THEN CAST(len(list_distinct(ws)) AS BIGINT) / n_tokens
         |    ELSE CAST(list_sum(list_transform(
         |        range(1, CAST(len(ws) - 50 + 2 AS INTEGER)),
         |        i -> len(list_distinct(list_slice(ws, i, i + 49)))))
         |      AS BIGINT) / (50 * (n_tokens - 50 + 1))
         |  END AS mattr
         |FROM per ORDER BY doc_id""".stripMargin,

    // EventOps.streaks twin: the textbook day − row_number() island key
    // over each user's distinct active days; pure integer counts.
    "ev_streaks" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM ud),
        |st AS (
        |  SELECT user_id, day - rn AS isl, count(*) AS len
        |  FROM r GROUP BY 1, 2)
        |SELECT len AS streak_len, count(*) AS n_streaks,
        |  count(DISTINCT user_id) AS n_users
        |FROM st GROUP BY 1 ORDER BY streak_len""".stripMargin,

    // TextOps.vocabCoverage twin: same determinate (ctf desc, term)
    // rank, integer conditional sums, one double division per point.
    "txt_vocab_coverage" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS term
         |  FROM documents),
         |ctf AS (SELECT term, count(*) AS ctf FROM t GROUP BY 1),
         |ranked AS (
         |  SELECT ctf, ROW_NUMBER() OVER (ORDER BY ctf DESC, term)
         |    AS rank
         |  FROM ctf),
         |m AS (
         |  SELECT CAST(sum(ctf) AS BIGINT) AS total,
         |    CAST(sum(CASE WHEN rank <= 100 THEN ctf ELSE 0 END)
         |      AS BIGINT) AS c100,
         |    CAST(sum(CASE WHEN rank <= 1000 THEN ctf ELSE 0 END)
         |      AS BIGINT) AS c1000,
         |    CAST(sum(CASE WHEN rank <= 10000 THEN ctf ELSE 0 END)
         |      AS BIGINT) AS c10000
         |  FROM ranked)
         |SELECT CAST(100 AS BIGINT) AS n_top, c100 AS covered_tokens,
         |  total AS total_tokens,
         |  CAST(c100 AS DOUBLE) / total AS coverage FROM m
         |UNION ALL
         |SELECT CAST(1000 AS BIGINT), c1000, total,
         |  CAST(c1000 AS DOUBLE) / total FROM m
         |UNION ALL
         |SELECT CAST(10000 AS BIGINT), c10000, total,
         |  CAST(c10000 AS DOUBLE) / total FROM m
         |ORDER BY n_top""".stripMargin,

    // SimilarityOps.normProfile twin: per-component integer-nanos
    // quantization (floor(x²·1e9)), BIGINT row-local sums, one double
    // division + sqrt, exact ceil-rank quartiles.
    "emb_norm_profile" ->
      """WITH n AS (
        |  SELECT sqrt(CAST(list_sum(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e9)
        |      AS BIGINT))) AS DOUBLE) / 1e9) AS nrm
        |  FROM embeddings),
        |r AS (
        |  SELECT nrm, ROW_NUMBER() OVER (ORDER BY nrm) AS rn,
        |    COUNT(*) OVER () AS cnt
        |  FROM n)
        |SELECT CAST(max(cnt) AS BIGINT) AS n_vecs,
        |  min(nrm) AS min_norm,
        |  max(CASE WHEN rn = GREATEST(1, (25 * cnt + 99) // 100)
        |    THEN nrm END) AS p25_norm,
        |  max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100)
        |    THEN nrm END) AS p50_norm,
        |  max(CASE WHEN rn = GREATEST(1, (75 * cnt + 99) // 100)
        |    THEN nrm END) AS p75_norm,
        |  max(nrm) AS max_norm
        |FROM r""".stripMargin,

    // GraphOps.componentSizes twin: the graph_components recursive
    // closure's histogram — integer counts over the component frame.
    "graph_component_sizes" ->
      s"""WITH RECURSIVE ${coEdgesCtes(2)},
         |edges AS (
         |  SELECT a AS src, b AS dst FROM e2
         |  UNION SELECT b, a FROM e2),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (
         |  SELECT src AS part, least(src, min(dst)) AS component_id
         |  FROM reach GROUP BY src),
         |comp AS (
         |  SELECT component_id, count(*) AS n_members
         |  FROM lab GROUP BY 1)
         |SELECT n_members AS size, count(*) AS n_components,
         |  CAST(n_members * count(*) AS BIGINT) AS n_nodes
         |FROM comp GROUP BY 1 ORDER BY size""".stripMargin,

    // TextOps.readability twin: three integer counts (shared tokenizer
    // + two fixed regexes), one double expression with the identical
    // parenthesization; int/int `/` is double division in both engines.
    "txt_readability" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, text, ${toksSql("lower(text)")} AS ws
         |  FROM documents),
         |per AS (
         |  SELECT doc_id, lang,
         |    CAST(len(ws) AS BIGINT) AS words,
         |    GREATEST(CAST(1 AS BIGINT),
         |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
         |      AS sentences,
         |    CAST(list_sum(list_transform(ws,
         |      w -> len(regexp_extract_all(w, '[aeiouy]+'))))
         |      AS BIGINT) AS syllables
         |  FROM t)
         |SELECT doc_id, lang, words, sentences, syllables,
         |  CAST(206.835 AS DOUBLE)
         |    - CAST(1.015 AS DOUBLE) * (words / sentences)
         |    - CAST(84.6 AS DOUBLE) * (syllables / words) AS flesch
         |FROM per WHERE words >= 1 ORDER BY doc_id""".stripMargin,

    // TextOps.jsDivergence twin: identical decomposition (shared-term
    // contributions + the two one-sided remainders via 1 − Σp_shared),
    // per-term DECIMAL(24,9) rounding before the sums, ln 2 pinned to
    // the same literal.
    "txt_js_divergence" ->
      s"""WITH t AS (
         |  SELECT lang, unnest(${toksSql("lower(text)")}) AS term
         |  FROM documents),
         |u AS (SELECT lang, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |tot AS (
         |  SELECT lang, CAST(sum(tf) AS BIGINT) AS n FROM u GROUP BY 1),
         |p AS (
         |  SELECT u.lang, u.term, u.tf / tot.n AS p
         |  FROM u JOIN tot ON u.lang = tot.lang),
         |pr AS (
         |  SELECT a.lang AS lang_a, b.lang AS lang_b,
         |    CAST(a.p * ln(CAST(2 AS DOUBLE) * a.p / (a.p + b.p))
         |      + b.p * ln(CAST(2 AS DOUBLE) * b.p / (a.p + b.p))
         |      AS DECIMAL(24,9)) AS c,
         |    CAST(a.p AS DECIMAL(24,9)) AS pa9,
         |    CAST(b.p AS DECIMAL(24,9)) AS pb9
         |  FROM p a JOIN p b ON a.term = b.term AND a.lang < b.lang),
         |m AS (
         |  SELECT lang_a, lang_b, count(*) AS n_shared_terms,
         |    sum(c) AS sc, sum(pa9) AS sp, sum(pb9) AS sq
         |  FROM pr GROUP BY 1, 2)
         |SELECT lang_a, lang_b, n_shared_terms,
         |  (CAST(sc AS DOUBLE)
         |    + CAST(1 - sp AS DOUBLE) * CAST(0.6931471805599453 AS DOUBLE)
         |    + CAST(1 - sq AS DOUBLE) * CAST(0.6931471805599453 AS DOUBLE))
         |    / 2 AS jsd
         |FROM m ORDER BY lang_a, lang_b""".stripMargin,

    // GraphOps.powerlawFit twin: degree histogram → integer CCDF suffix
    // counts (the rich-club grid trick) → the zipfFit OLS discipline.
    "graph_powerlaw_fit" ->
      s"""WITH ${coEdgesCtes(2)},
         |pldeg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2)
         |  GROUP BY 1),
         |pldh AS (SELECT deg, count(*) AS n FROM pldeg GROUP BY 1),
         |plcc AS (
         |  SELECT g.deg AS k, CAST(sum(pldh.n) AS BIGINT) AS cn
         |  FROM (SELECT deg FROM pldh) g
         |  JOIN pldh ON pldh.deg >= g.deg
         |  GROUP BY 1),
         |plterms AS (
         |  SELECT CAST(ln(CAST(k AS DOUBLE)) AS DECIMAL(24,9)) AS x,
         |    CAST(ln(CAST(cn AS DOUBLE)) AS DECIMAL(24,9)) AS y,
         |    CAST(ln(CAST(k AS DOUBLE)) * ln(CAST(cn AS DOUBLE))
         |      AS DECIMAL(24,9)) AS xy,
         |    CAST(ln(CAST(k AS DOUBLE)) * ln(CAST(k AS DOUBLE))
         |      AS DECIMAL(24,9)) AS xx
         |  FROM plcc),
         |plmom AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_points,
         |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |    CAST(sum(xy) AS DOUBLE) AS sxy,
         |    CAST(sum(xx) AS DOUBLE) AS sxx
         |  FROM plterms)
         |SELECT n_points,
         |  (n_points * sxy - sx * sy) / (n_points * sxx - sx * sx)
         |    AS slope,
         |  (sy - ((n_points * sxy - sx * sy)
         |      / (n_points * sxx - sx * sx)) * sx) / n_points
         |    AS intercept
         |FROM plmom""".stripMargin,

    // GraphOps.richClub twin: degree-domain histograms joined against
    // the threshold grid; integer counts, one double division per k.
    "graph_rich_club" ->
      s"""WITH ${coEdgesCtes(2)},
         |deg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2)
         |  GROUP BY 1),
         |dh AS (SELECT deg, count(*) AS n FROM deg GROUP BY 1),
         |em AS (
         |  SELECT least(x.deg, y.deg) AS m, count(*) AS ne
         |  FROM e2
         |  JOIN deg x ON x.node = e2.a
         |  JOIN deg y ON y.node = e2.b
         |  GROUP BY 1),
         |grid AS (SELECT deg AS k FROM dh),
         |nk AS (
         |  SELECT g.k, CAST(sum(dh.n) AS BIGINT) AS n_nodes
         |  FROM grid g JOIN dh ON dh.deg > g.k GROUP BY 1),
         |ek AS (
         |  SELECT g.k, CAST(sum(em.ne) AS BIGINT) AS n_edges
         |  FROM grid g JOIN em ON em.m > g.k GROUP BY 1)
         |SELECT g.k,
         |  CAST(coalesce(nk.n_nodes, 0) AS BIGINT) AS n_nodes,
         |  CAST(coalesce(ek.n_edges, 0) AS BIGINT) AS n_edges,
         |  CASE WHEN coalesce(nk.n_nodes, 0) >= 2
         |    THEN CAST(2 * coalesce(ek.n_edges, 0) AS DOUBLE)
         |      / CAST(coalesce(nk.n_nodes, 0)
         |        * (coalesce(nk.n_nodes, 0) - 1) AS DOUBLE)
         |  END AS phi
         |FROM grid g
         |LEFT JOIN nk ON nk.k = g.k
         |LEFT JOIN ek ON ek.k = g.k
         |ORDER BY g.k""".stripMargin,

    // TextOps.hapaxRatio twin: integer term frequencies, one division.
    "txt_hapax_ratio" ->
      s"""WITH tf AS (
         |  SELECT lang, term, count(*) AS tf FROM (
         |    SELECT lang, unnest(${toksSql("lower(text)")}) AS term
         |    FROM documents)
         |  GROUP BY 1, 2)
         |SELECT lang, count(*) AS vocab,
         |  CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS hapax,
         |  CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS hapax_ratio
         |FROM tf GROUP BY 1 ORDER BY lang""".stripMargin,

    // GraphOps.ktruss twin: the shared co-purchase edge CTEs, 8
    // unrolled support-peel rounds (the engine's maxRounds — identical
    // caps => bit-equality, the kcore discipline), final support
    // recounted on the surviving set.
    "graph_ktruss" ->
      s"""WITH ${coEdgesCtes(2)},
         |te0 AS MATERIALIZED (SELECT a, b FROM e2),
         |${ktrussPeelCtes(3, 8)},
         |tadjF AS MATERIALIZED (
         |  SELECT a AS w, b AS nb FROM te8
         |  UNION ALL SELECT b, a FROM te8),
         |tsupF AS (
         |  SELECT e.a, e.b, count(*) AS sup
         |  FROM te8 e
         |  JOIN tadjF x ON x.w = e.a
         |  JOIN tadjF y ON y.w = e.b AND y.nb = x.nb
         |  GROUP BY 1, 2)
         |SELECT e.a, e.b,
         |  CAST(coalesce(s.sup, 0) AS BIGINT) AS support
         |FROM te8 e LEFT JOIN tsupF s ON s.a = e.a AND s.b = e.b
         |ORDER BY e.a, e.b""".stripMargin,

    // TextOps.langIdConfusion twin: the txt_lang_id prediction chain
    // joined back to the labeled lang column; docs the classifier
    // omits (empty token list) count as predicted 'und'.
    "txt_langid_confusion" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${toksSql("lower(text)")}) AS word
         |  FROM documents),
         |lex(lex_lang, lex_word) AS (VALUES $lexValues),
         |hits AS (
         |  SELECT t.doc_id, l.lex_lang, count(l.lex_lang) AS hits
         |  FROM tok t LEFT JOIN lex l ON t.word = l.lex_word
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT doc_id, lex_lang, hits,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY hits DESC, lex_lang ASC NULLS LAST) AS rn
         |  FROM hits),
         |pred AS (
         |  SELECT doc_id,
         |    CASE WHEN hits > 0 THEN lex_lang ELSE 'und' END
         |      AS predicted_lang
         |  FROM r WHERE rn = 1),
         |grid AS (
         |  SELECT d.lang,
         |    coalesce(p.predicted_lang, 'und') AS predicted_lang,
         |    count(*) AS n_docs
         |  FROM documents d LEFT JOIN pred p ON d.doc_id = p.doc_id
         |  GROUP BY 1, 2)
         |SELECT lang, predicted_lang, n_docs,
         |  CAST(n_docs AS DOUBLE)
         |    / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE)
         |    AS row_share
         |FROM grid ORDER BY lang, predicted_lang""".stripMargin,

    // EventOps.forecastBacktest twin: integer-micros daily revenue,
    // BIGINT expanding moments (associative window sums), the SAME
    // double expression shape for the one prediction division chain.
    "ev_forecast_backtest" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    sum(CAST(floor(value * 1000000) AS BIGINT)) AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (
        |  SELECT day, y,
        |    count(*) OVER w AS n,
        |    sum(day) OVER w AS sx,
        |    sum(y) OVER w AS sy,
        |    sum(day * y) OVER w AS sxy,
        |    sum(day * day) OVER w AS sxx
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND 1 PRECEDING))
        |SELECT day, n AS n_prior,
        |  CAST(y AS DOUBLE) / 1e6 AS actual,
        |  ((CAST(sy AS DOUBLE)
        |      - (CAST(n * sxy - sx * sy AS DOUBLE)
        |         / CAST(n * sxx - sx * sx AS DOUBLE))
        |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |    + (CAST(n * sxy - sx * sy AS DOUBLE)
        |       / CAST(n * sxx - sx * sx AS DOUBLE))
        |      * CAST(day AS DOUBLE)) / 1e6 AS predicted,
        |  CAST(y AS DOUBLE) / 1e6
        |    - ((CAST(sy AS DOUBLE)
        |      - (CAST(n * sxy - sx * sy AS DOUBLE)
        |         / CAST(n * sxx - sx * sx AS DOUBLE))
        |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |    + (CAST(n * sxy - sx * sy AS DOUBLE)
        |       / CAST(n * sxx - sx * sx AS DOUBLE))
        |      * CAST(day AS DOUBLE)) / 1e6 AS residual
        |FROM m WHERE n >= 2 ORDER BY day""".stripMargin,

    // EventOps.ltvCohort twin: DECIMAL(18,2)-quantized purchase revenue
    // (the movingStats-proven double→decimal cast), integer epoch-week
    // math, associative decimal cumulative window, double surface.
    "ev_ltv_cohort" ->
      """WITH ev AS (
        |  SELECT user_id, ts,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END AS rev
        |  FROM events),
        |fs AS (SELECT user_id, min(ts) AS first_ts FROM ev GROUP BY 1),
        |cs AS (
        |  SELECT CAST(floor(date_diff('day', DATE '1970-01-01',
        |      CAST(first_ts AS DATE)) / 7) AS BIGINT) AS cohort_week,
        |    count(*) AS n_users
        |  FROM fs GROUP BY 1),
        |wk AS (
        |  SELECT
        |    CAST(floor(date_diff('day', DATE '1970-01-01',
        |      CAST(f.first_ts AS DATE)) / 7) AS BIGINT) AS cohort_week,
        |    CAST(floor(date_diff('day', DATE '1970-01-01',
        |        CAST(e.ts AS DATE)) / 7)
        |      - floor(date_diff('day', DATE '1970-01-01',
        |        CAST(f.first_ts AS DATE)) / 7) AS BIGINT) AS weeks_since,
        |    e.rev
        |  FROM ev e JOIN fs f ON e.user_id = f.user_id),
        |weekly AS (
        |  SELECT cohort_week, weeks_since, sum(rev) AS wk_rev
        |  FROM wk GROUP BY 1, 2),
        |cum AS (
        |  SELECT cohort_week, weeks_since,
        |    sum(wk_rev) OVER (PARTITION BY cohort_week
        |      ORDER BY weeks_since ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cum_rev
        |  FROM weekly)
        |SELECT c.cohort_week, c.weeks_since, s.n_users,
        |  CAST(c.cum_rev AS DOUBLE) AS cum_revenue,
        |  CAST(c.cum_rev AS DOUBLE) / s.n_users AS ltv_per_user
        |FROM cum c JOIN cs s ON c.cohort_week = s.cohort_week
        |ORDER BY c.cohort_week, c.weeks_since""".stripMargin,

    // EventOps.giniUserValue twin: integer micros end to end (one IEEE
    // multiply + floor, identical in both engines), the giniTokens rank
    // identity, BIGINT-cast sum surfaces (the HUGEINT lesson).
    "ev_gini_value" ->
      """WITH per AS (
        |  SELECT event_type, user_id,
        |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
        |      AS x
        |  FROM events GROUP BY 1, 2),
        |ranked AS (
        |  SELECT event_type, x,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY x, user_id) AS BIGINT) AS i
        |  FROM per),
        |agg AS (
        |  SELECT event_type, count(*) AS n_users,
        |    sum(x) AS total_micros, sum(i * x) AS swx
        |  FROM ranked GROUP BY 1)
        |SELECT event_type, n_users,
        |  CAST(total_micros AS BIGINT) AS total_micros,
        |  CASE WHEN total_micros > 0
        |    THEN CAST(2 * swx - (n_users + 1) * total_micros AS DOUBLE)
        |      / CAST(n_users * total_micros AS DOUBLE)
        |  END AS gini
        |FROM agg ORDER BY event_type""".stripMargin,

    // DedupOps.ngramNovelty twin: the shared shingle chain (no df cap —
    // novelty is linear, not quadratic), min-doc first occurrence,
    // BIGINT counts, one int/int division.
    "dedup_ngram_novelty" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("lower(text)")} AS t FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, shingle FROM (
         |    SELECT doc_id, unnest(list_transform(
         |      generate_series(1, len(t) - 2),
         |      i -> array_to_string(t[i:i+2], ' '))) AS shingle
         |    FROM toks WHERE len(t) >= 3)),
         |fd AS (SELECT shingle, min(doc_id) AS first_doc
         |  FROM sh GROUP BY 1),
         |per AS (
         |  SELECT s.doc_id, count(*) AS n_shingles,
         |    CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_novel
         |  FROM sh s JOIN fd f ON s.shingle = f.shingle GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
         |  CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel,
         |  CASE WHEN p.n_shingles > 0
         |    THEN CAST(p.n_novel AS DOUBLE) / p.n_shingles END AS novelty
         |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // DedupOps.minhashEstAudit twin: the estimate never crosses the
    // compare — the oracle recomputes exact J over the same candidate
    // pair set and states the bound promise as TRUE (the
    // r_approx_distinct_bound / txt_top_terms_cms precedent).
    "dedup_minhash_est_audit" ->
      s"""WITH $ngramPairsCtes
         |SELECT doc_a, doc_b,
         |  CAST(shared AS DOUBLE) / (size_a + size_b - shared) AS j_exact,
         |  TRUE AS within_bound
         |FROM jpairs ORDER BY doc_a, doc_b""".stripMargin,

    // EventOps.pathTopK twin: identical (ts, event_id) total order and
    // second-truncated 30-minute in-session gaps; integer counts.
    "ev_path_topk" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_type, sec,
        |    lag(event_type, 2) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
        |    lag(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
        |    lag(sec, 2) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS s1,
        |    lag(sec, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS s2
        |  FROM e),
        |tri AS (
        |  SELECT t1 || '>' || t2 || '>' || event_type AS path, user_id
        |  FROM w
        |  WHERE t1 IS NOT NULL AND s2 - s1 < 1800 AND sec - s2 < 1800)
        |SELECT path, count(*) AS n_occurrences,
        |  count(DISTINCT user_id) AS n_users
        |FROM tri GROUP BY 1
        |ORDER BY n_occurrences DESC, path LIMIT 25""".stripMargin,

    // EventOps.lorenzDeciles twin: SQL NTILE's integer semantics equal
    // Ranks.ntileOfRank's by construction; DECIMAL(18,2) money sums,
    // one double division per row at the surface.
    "ev_lorenz_deciles" ->
      """WITH rev AS (
        |  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS rev
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (
        |  SELECT user_id, rev,
        |    NTILE(10) OVER (ORDER BY rev, user_id) AS decile
        |  FROM rev),
        |d AS (
        |  SELECT decile, count(*) AS n_users, sum(rev) AS drev
        |  FROM t GROUP BY 1),
        |tot AS (SELECT sum(rev) AS total FROM rev)
        |SELECT CAST(decile AS BIGINT) AS decile, n_users,
        |  CAST(drev AS DOUBLE) AS decile_value,
        |  CAST(sum(drev) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(total AS DOUBLE) AS cum_share
        |FROM d, tot ORDER BY decile""".stripMargin,

    // TextOps.burrowsDelta twin: same top-30 (tf desc, term) selection,
    // DECIMAL(24,12)-quantized shares, exact decimal moments, var > 0
    // guard BEFORE sqrt, re-quantized |z_a − z_b| decimal sums.
    "txt_burrows_delta" ->
      s"""WITH tok AS (
         |  SELECT source, unnest(${toksSql("lower(text)")}) AS term
         |  FROM documents),
         |tops AS (
         |  SELECT term FROM (
         |    SELECT term,
         |      ROW_NUMBER() OVER (ORDER BY count(*) DESC, term) AS r
         |    FROM tok GROUP BY term) WHERE r <= 30),
         |ns AS (SELECT source, count(*) AS n_s FROM tok GROUP BY 1),
         |cnt AS (
         |  SELECT source, term, count(*) AS c
         |  FROM tok JOIN tops USING (term) GROUP BY 1, 2),
         |grid AS (SELECT ns.source, tops.term, ns.n_s FROM ns, tops),
         |f AS (
         |  SELECT g.source, g.term,
         |    CAST(CAST(coalesce(c.c, 0) AS DOUBLE) / CAST(g.n_s AS DOUBLE)
         |      AS DECIMAL(24,12)) AS fq
         |  FROM grid g LEFT JOIN cnt c
         |    ON g.source = c.source AND g.term = c.term),
         |stats AS (
         |  SELECT term, sum(fq) AS sf,
         |    sum(CAST(CAST(fq AS DOUBLE) * CAST(fq AS DOUBLE)
         |      AS DECIMAL(24,12))) AS sf2,
         |    count(*) AS k
         |  FROM f GROUP BY 1),
         |vr AS (
         |  SELECT term, CAST(sf AS DOUBLE) / CAST(k AS DOUBLE) AS mu,
         |    CAST(sf2 AS DOUBLE) / CAST(k AS DOUBLE)
         |      - (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE))
         |      * (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE)) AS vr
         |  FROM stats),
         |sig AS (
         |  SELECT term, mu, sqrt(vr) AS sigma FROM vr WHERE vr > 0),
         |z AS (
         |  SELECT f.source, f.term,
         |    CAST((CAST(fq AS DOUBLE) - mu) / sigma AS DECIMAL(24,12)) AS z
         |  FROM f JOIN sig USING (term))
         |SELECT a.source AS source_a, b.source AS source_b,
         |  count(*) AS n_terms,
         |  CAST(sum(abs(a.z - b.z)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS delta
         |FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    // EventOps.markovStationary twin: identical bigram chain, kept-and-
    // renormalized row-stochastic matrix, and 20 unrolled power steps —
    // each term one IEEE double product quantized onto DECIMAL(24,12)
    // before the per-column sum (the graph-superstep oracle discipline).
    "ev_markov_stationary" -> {
      val rounds = (1 to 20).map { i =>
        s"""v$i AS (
           |  SELECT p.next_type AS state,
           |    CAST(sum(CAST(CAST(v.v AS DOUBLE) * p.p AS DECIMAL(24,12)))
           |      AS DECIMAL(24,12)) AS v
           |  FROM v${i - 1} v JOIN p ON v.state = p.prev_type
           |  GROUP BY 1)"""
      }.mkString(",\n")
      s"""WITH b AS (
         |  SELECT user_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS prev_type
         |  FROM events),
         |c AS (
         |  SELECT prev_type, event_type AS next_type, count(*) AS n
         |  FROM b WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |states AS (SELECT DISTINCT prev_type AS state FROM c),
         |kept AS (
         |  SELECT c.* FROM c JOIN states s ON c.next_type = s.state),
         |tot AS (SELECT prev_type, sum(n) AS ni FROM kept GROUP BY 1),
         |p AS MATERIALIZED (
         |  SELECT k.prev_type, k.next_type,
         |    CAST(k.n AS DOUBLE) / CAST(t.ni AS DOUBLE) AS p
         |  FROM kept k JOIN tot t ON k.prev_type = t.prev_type),
         |nk AS (SELECT count(*) AS k FROM states),
         |v0 AS (
         |  SELECT state,
         |    CAST(CAST(1 AS DOUBLE) / CAST(nk.k AS DOUBLE)
         |      AS DECIMAL(24,12)) AS v
         |  FROM states, nk),
         |$rounds,
         |emp AS (
         |  SELECT event_type AS state, count(*) AS n_events
         |  FROM events GROUP BY 1),
         |etot AS (SELECT sum(n_events) AS total FROM emp)
         |SELECT v.state AS event_type,
         |  CAST(v.v AS DOUBLE) AS stationary,
         |  CAST(e.n_events AS DOUBLE) / CAST(t.total AS DOUBLE)
         |    AS empirical,
         |  CAST(v.v AS DOUBLE)
         |    - CAST(e.n_events AS DOUBLE) / CAST(t.total AS DOUBLE) AS gap
         |FROM v20 v JOIN emp e ON v.state = e.state, etot t
         |ORDER BY event_type""".stripMargin
    },

    // SimilarityOps.dimCovariance twin: 1-based DuckDB list indexing
    // shifted back to the engine's 0-based dims; identical 1e-9
    // scaled-integer term quantization, exact integer sums, identical
    // double formula shapes.
    "emb_dim_covariance" ->
      """WITH g AS (SELECT unnest(generate_series(1, 64)) AS idx),
        |pr AS (
        |  SELECT a.idx AS ii, b.idx AS jj FROM g a, g b
        |  WHERE a.idx <= b.idx),
        |t AS (
        |  SELECT p.ii, p.jj,
        |    CAST(floor(CAST(e.embedding[p.ii] AS DOUBLE)
        |      * CAST(e.embedding[p.jj] AS DOUBLE) * 1e9) AS BIGINT) AS pq,
        |    CAST(floor(CAST(e.embedding[p.ii] AS DOUBLE) * 1e9) AS BIGINT)
        |      AS xi,
        |    CAST(floor(CAST(e.embedding[p.jj] AS DOUBLE) * 1e9) AS BIGINT)
        |      AS xj
        |  FROM embeddings e, pr p),
        |sums AS (
        |  SELECT ii, jj, count(*) AS n,
        |    CAST(sum(pq) AS BIGINT) AS spq,
        |    CAST(sum(xi) AS BIGINT) AS sxi,
        |    CAST(sum(xj) AS BIGINT) AS sxj
        |  FROM t GROUP BY 1, 2),
        |cv AS (
        |  SELECT ii, jj, n,
        |    CAST(spq AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)
        |      - (CAST(sxi AS DOUBLE) / 1e9 / CAST(n AS DOUBLE))
        |      * (CAST(sxj AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)) AS cov
        |  FROM sums),
        |dg AS (SELECT ii AS dd, cov AS variance FROM cv WHERE ii = jj)
        |SELECT c.ii - 1 AS dim_i, c.jj - 1 AS dim_j, c.n, c.cov,
        |  CASE WHEN di.variance > 0 AND dj.variance > 0
        |    THEN c.cov / (sqrt(di.variance) * sqrt(dj.variance))
        |    END AS corr
        |FROM cv c JOIN dg di ON c.ii = di.dd JOIN dg dj ON c.jj = dj.dd
        |ORDER BY dim_i, dim_j""".stripMargin,

    // GraphOps.harmonicCentrality twin: the sssp-style maxHops-capped
    // min-plus closure keyed by (seed, node) equals the engine's
    // frontier BFS within the shared cap; identical landmark selection
    // and DECIMAL(18,12)-quantized 1/d terms.
    "graph_harmonic" -> {
      val rounds = (1 to 8).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT seed, node, min(dist) AS dist FROM (
           |    SELECT seed, node, dist FROM d${i - 1}
           |    UNION ALL
           |    SELECT d.seed, e.dst AS node, d.dist + 1 AS dist
           |    FROM d${i - 1} d JOIN edges e ON e.src = d.node
           |  ) GROUP BY 1, 2)"""
      }.mkString(",\n")
      s"""WITH pw AS (
         |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS MATERIALIZED (
         |  SELECT c AS src, p AS dst FROM pw
         |  UNION ALL SELECT p AS src, c AS dst FROM pw),
         |sd AS (
         |  SELECT o_custkey * 2 AS seed FROM orders GROUP BY o_custkey
         |  ORDER BY count(DISTINCT o_orderkey) DESC, o_custkey LIMIT 5),
         |d0 AS (SELECT seed, seed AS node, CAST(0 AS BIGINT) AS dist
         |  FROM sd),
         |$rounds
         |SELECT node,
         |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         |    AS kind,
         |  count(*) AS n_reached,
         |  CAST(sum(CAST(CAST(1 AS DOUBLE) / CAST(dist AS DOUBLE)
         |    AS DECIMAL(18,12))) AS DOUBLE) AS harmonic
         |FROM d8 WHERE dist > 0 GROUP BY 1
         |ORDER BY harmonic DESC, node LIMIT 20""".stripMargin
    },

    // SimilarityOps.pcaPower twin: the same scaled-integer covariance
    // core as emb_dim_covariance (1-based list indices shifted back),
    // then 50 unrolled power steps — per step one quantized-term matrix
    // product and a max-|component| rescale, exactly the engine's
    // DECIMAL(24,12) iteration.
    "emb_pca_power" -> {
      // every round CTE is MATERIALIZED: v$i reads w$i twice (once via
      // m$i), so default inlining would double the tree per round —
      // 2^15 expansion (the sssp-round lesson, measured as a hung gate)
      val rounds = (1 to 50).map { i =>
        s"""w$i AS MATERIALIZED (
           |  SELECT f.i,
           |    sum(CAST(f.cov * CAST(v.v AS DOUBLE) AS DECIMAL(24,12)))
           |      AS w
           |  FROM f JOIN v${i - 1} v ON f.j = v.dim GROUP BY 1),
           |m$i AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w$i),
           |v$i AS MATERIALIZED (
           |  SELECT w.i AS dim,
           |    CAST(CAST(w.w AS DOUBLE) / CAST(m.m AS DOUBLE)
           |      AS DECIMAL(24,12)) AS v
           |  FROM w$i w, m$i m)"""
      }.mkString(",\n")
      s"""WITH g AS (SELECT unnest(generate_series(1, 64)) AS idx),
         |pr AS (
         |  SELECT a.idx AS ii, b.idx AS jj FROM g a, g b
         |  WHERE a.idx <= b.idx),
         |t AS (
         |  SELECT p.ii, p.jj,
         |    CAST(floor(CAST(e.embedding[p.ii] AS DOUBLE)
         |      * CAST(e.embedding[p.jj] AS DOUBLE) * 1e9) AS BIGINT) AS pq,
         |    CAST(floor(CAST(e.embedding[p.ii] AS DOUBLE) * 1e9) AS BIGINT)
         |      AS xi,
         |    CAST(floor(CAST(e.embedding[p.jj] AS DOUBLE) * 1e9) AS BIGINT)
         |      AS xj
         |  FROM embeddings e, pr p),
         |sums AS (
         |  SELECT ii, jj, count(*) AS n,
         |    CAST(sum(pq) AS BIGINT) AS spq,
         |    CAST(sum(xi) AS BIGINT) AS sxi,
         |    CAST(sum(xj) AS BIGINT) AS sxj
         |  FROM t GROUP BY 1, 2),
         |cv AS (
         |  SELECT ii, jj,
         |    CAST(spq AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)
         |      - (CAST(sxi AS DOUBLE) / 1e9 / CAST(n AS DOUBLE))
         |      * (CAST(sxj AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)) AS cov
         |  FROM sums),
         |f AS MATERIALIZED (
         |  SELECT ii - 1 AS i, jj - 1 AS j, cov FROM cv
         |  UNION ALL
         |  SELECT jj - 1 AS i, ii - 1 AS j, cov FROM cv WHERE ii <> jj),
         |tr AS (
         |  SELECT sum(CAST(cov AS DECIMAL(24,12))) AS tr FROM cv
         |  WHERE ii = jj),
         |v0 AS (
         |  SELECT DISTINCT i AS dim,
         |    CAST(CAST(1 AS DOUBLE) / CAST(64 AS DOUBLE)
         |      AS DECIMAL(24,12)) AS v
         |  FROM f),
         |$rounds,
         |wf AS (
         |  SELECT f.i,
         |    sum(CAST(f.cov * CAST(v.v AS DOUBLE) AS DECIMAL(24,12))) AS w
         |  FROM f JOIN v50 v ON f.j = v.dim GROUP BY 1),
         |ray AS (
         |  SELECT
         |    sum(CAST(CAST(v.v AS DOUBLE) * CAST(w.w AS DOUBLE)
         |      AS DECIMAL(24,12))) AS num,
         |    sum(CAST(CAST(v.v AS DOUBLE) * CAST(v.v AS DOUBLE)
         |      AS DECIMAL(24,12))) AS den
         |  FROM v50 v JOIN wf w ON v.dim = w.i)
         |SELECT v.dim,
         |  CAST(v.v AS DOUBLE) / sqrt(CAST(den AS DOUBLE)) AS loading,
         |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS lambda,
         |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / CAST(tr AS DOUBLE)
         |    AS explained
         |FROM v50 v, ray, tr ORDER BY dim""".stripMargin
    },

    // SimilarityOps.silhouette twin: centroids recomputed in SQL from
    // the same exact integer component sums (the engine ships them as
    // double literals — identical values, shortest-repr round-trip);
    // squared-gap terms on the 1e-9 integer grain, s quantized onto
    // DECIMAL(10,6) before the per-label mean.
    "emb_silhouette" ->
      """WITH g AS (SELECT unnest(generate_series(1, 64)) AS idx),
        |comp AS (
        |  SELECT e.label, u.idx AS i,
        |    CAST(floor(CAST(e.embedding[u.idx] AS DOUBLE) * 1e9)
        |      AS BIGINT) AS xq
        |  FROM embeddings e, g u),
        |cent AS MATERIALIZED (
        |  SELECT label, i,
        |    CAST(sum(xq) AS DOUBLE) / 1e9 / CAST(count(*) AS DOUBLE) AS c
        |  FROM comp GROUP BY 1, 2),
        |d2 AS (
        |  SELECT e.vec_id, e.label AS own, c.label AS cand,
        |    sum(CAST(floor((CAST(e.embedding[c.i] AS DOUBLE) - c.c)
        |      * (CAST(e.embedding[c.i] AS DOUBLE) - c.c) * 1e9)
        |      AS BIGINT)) AS q
        |  FROM embeddings e CROSS JOIN cent c
        |  GROUP BY 1, 2, 3),
        |ab AS (
        |  SELECT vec_id, own,
        |    sqrt(CAST(max(CASE WHEN cand = own THEN q END) AS DOUBLE)
        |      / 1e9) AS a,
        |    sqrt(CAST(min(CASE WHEN cand <> own THEN q END) AS DOUBLE)
        |      / 1e9) AS b
        |  FROM d2 GROUP BY 1, 2),
        |sv AS (
        |  SELECT own AS label,
        |    CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
        |      ELSE CAST(0 AS DOUBLE) END AS sil
        |  FROM ab)
        |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vectors,
        |  CAST(sum(CAST(sil AS DECIMAL(10,6))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean_silhouette,
        |  CAST(sum(CASE WHEN sil < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_negative
        |FROM sv GROUP BY 1 ORDER BY label""".stripMargin,

    // GraphOps.degreeGini twin: the same degree-domain histogram rank
    // identity in HUGEINT (≡ the engine's DECIMAL(38,0) int128), the
    // identical double closed form.
    "graph_degree_gini" ->
      """WITH pw AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT c AS src, p AS dst FROM pw
        |  UNION ALL SELECT p AS src, c AS dst FROM pw),
        |deg AS (SELECT src AS node, count(*) AS dg FROM edges GROUP BY 1),
        |hist AS (SELECT dg, count(*) AS c FROM deg GROUP BY 1),
        |rk AS (
        |  SELECT dg, c,
        |    coalesce(sum(c) OVER (ORDER BY dg ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM hist),
        |t AS (
        |  SELECT CAST(dg AS HUGEINT)
        |      * (CAST(c AS HUGEINT) * CAST(below AS HUGEINT)
        |        + CASE WHEN c % 2 = 0
        |          THEN (CAST(c AS HUGEINT) // 2) * (CAST(c AS HUGEINT) + 1)
        |          ELSE CAST(c AS HUGEINT)
        |            * ((CAST(c AS HUGEINT) + 1) // 2) END) AS srd,
        |    CAST(dg AS HUGEINT) * CAST(c AS HUGEINT) AS sd,
        |    c AS cn
        |  FROM rk)
        |SELECT CAST(sum(cn) AS BIGINT) AS n_nodes,
        |  CAST(sum(sd) AS BIGINT) AS sum_degree,
        |  (CAST(2 AS DOUBLE) * CAST(sum(srd) AS DOUBLE))
        |    / (CAST(sum(cn) AS DOUBLE) * CAST(sum(sd) AS DOUBLE))
        |    - (CAST(sum(cn) AS DOUBLE) + 1.0) / CAST(sum(cn) AS DOUBLE)
        |    AS gini
        |FROM t""".stripMargin,

    // SimilarityOps.labelConfusion twin: the silhouette centroid core,
    // argmin via the (q, cand) rank — integer comparisons only.
    "emb_label_confusion" ->
      """WITH g AS (SELECT unnest(generate_series(1, 64)) AS idx),
        |comp AS (
        |  SELECT e.label, u.idx AS i,
        |    CAST(floor(CAST(e.embedding[u.idx] AS DOUBLE) * 1e9)
        |      AS BIGINT) AS xq
        |  FROM embeddings e, g u),
        |cent AS MATERIALIZED (
        |  SELECT label, i,
        |    CAST(sum(xq) AS DOUBLE) / 1e9 / CAST(count(*) AS DOUBLE) AS c
        |  FROM comp GROUP BY 1, 2),
        |d2 AS (
        |  SELECT e.vec_id, e.label AS own, c.label AS cand,
        |    sum(CAST(floor((CAST(e.embedding[c.i] AS DOUBLE) - c.c)
        |      * (CAST(e.embedding[c.i] AS DOUBLE) - c.c) * 1e9)
        |      AS BIGINT)) AS q
        |  FROM embeddings e CROSS JOIN cent c
        |  GROUP BY 1, 2, 3),
        |pick AS (
        |  SELECT vec_id, own, cand,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY q, cand)
        |      AS rn
        |  FROM d2),
        |p AS (SELECT own, cand FROM pick WHERE rn = 1),
        |tot AS (SELECT own, count(*) AS n_label FROM p GROUP BY 1)
        |SELECT CAST(p.own AS BIGINT) AS label,
        |  CAST(p.cand AS BIGINT) AS pred_label, count(*) AS n,
        |  CAST(count(*) AS DOUBLE) / CAST(max(t.n_label) AS DOUBLE)
        |    AS share
        |FROM p JOIN tot t ON p.own = t.own
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // EventOps.retentionFit twin: integer retained/eligible counts
    // (eligible = suffix sums of the horizon histogram via
    // generate_series — the same calendar-bounded fan as the engine's
    // explode(sequence)), zipfFit's DECIMAL(24,9) OLS factor grain.
    "ev_retention_fit" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS w0 FROM uw GROUP BY 1),
        |mx AS (SELECT max(wk) AS wmax FROM uw),
        |offs AS (
        |  SELECT u.wk - f.w0 AS k, count(DISTINCT u.user_id) AS retained
        |  FROM uw u JOIN f ON u.user_id = f.user_id
        |  WHERE u.wk - f.w0 >= 1 GROUP BY 1),
        |hor AS (
        |  SELECT (SELECT wmax FROM mx) - w0 AS horizon, count(*) AS nh
        |  FROM f GROUP BY 1),
        |elig AS (
        |  SELECT unnest(generate_series(1, CAST(horizon AS BIGINT)))
        |    AS k, nh
        |  FROM hor WHERE horizon >= 1),
        |eligk AS (
        |  SELECT k, CAST(sum(nh) AS BIGINT) AS eligible
        |  FROM elig GROUP BY 1),
        |pts AS (
        |  SELECT
        |    CAST(ln(CAST(o.k AS DOUBLE)) AS DECIMAL(24,9)) AS x,
        |    CAST(ln(CAST(o.retained AS DOUBLE)
        |      / CAST(e.eligible AS DOUBLE)) AS DECIMAL(24,9)) AS y,
        |    CAST(ln(CAST(o.k AS DOUBLE)) * ln(CAST(o.retained AS DOUBLE)
        |      / CAST(e.eligible AS DOUBLE)) AS DECIMAL(24,9)) AS xy,
        |    CAST(ln(CAST(o.k AS DOUBLE)) * ln(CAST(o.k AS DOUBLE))
        |      AS DECIMAL(24,9)) AS xx
        |  FROM offs o JOIN eligk e ON o.k = e.k
        |  WHERE o.retained > 0),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_points,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(xy) AS DOUBLE) AS sxy,
        |    CAST(sum(xx) AS DOUBLE) AS sxx
        |  FROM pts)
        |SELECT n_points,
        |  (n_points * sxy - sx * sy) / (n_points * sxx - sx * sx)
        |    AS slope,
        |  (sy - ((n_points * sxy - sx * sy)
        |      / (n_points * sxx - sx * sx)) * sx) / n_points
        |    AS intercept
        |FROM mom""".stripMargin,

    // EventOps.funnelWindowed twin: identical integer-micros stage
    // minima and window bounds; per-stage median via the shared
    // ceil-rank rule; one micros→seconds double division.
    "ev_funnel_windowed" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, min(us) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(us) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE event_type = 'click' AND us > t1
        |    AND us <= t1 + 86400000000 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(us) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE event_type = 'purchase' AND us > t2
        |    AND us <= t2 + 86400000000 GROUP BY 1),
        |g2 AS (
        |  SELECT t2 - t1 AS gap,
        |    ROW_NUMBER() OVER (ORDER BY t2 - t1) AS rn,
        |    COUNT(*) OVER () AS cnt
        |  FROM s2 JOIN s1 ON s2.user_id = s1.user_id),
        |g3 AS (
        |  SELECT t3 - t2 AS gap,
        |    ROW_NUMBER() OVER (ORDER BY t3 - t2) AS rn,
        |    COUNT(*) OVER () AS cnt
        |  FROM s3 JOIN s2 ON s3.user_id = s2.user_id)
        |SELECT '1_view' AS stage, count(*) AS n_users,
        |  CAST(NULL AS DOUBLE) AS p50_gap_sec FROM s1
        |UNION ALL
        |SELECT '2_click', coalesce(max(cnt), 0),
        |  CAST(max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100)
        |    THEN gap END) AS DOUBLE) / 1e6 FROM g2
        |UNION ALL
        |SELECT '3_purchase', coalesce(max(cnt), 0),
        |  CAST(max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100)
        |    THEN gap END) AS DOUBLE) / 1e6 FROM g3
        |ORDER BY stage""".stripMargin,

    // EventOps.movingCorr twin: decimal-quantized moment terms make the
    // windowed sums associative (segment-tree vs sequential evaluation
    // agree); identical Pearson closed form and variance guards.
    "ev_moving_corr" ->
      """WITH daily AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT) AS DECIMAL(12,0)) AS x,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |      AS DECIMAL(18,2)) AS y
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT day, x, y,
        |    CAST(x * y AS DECIMAL(30,2)) AS xy,
        |    CAST(x * x AS DECIMAL(24,0)) AS xx,
        |    CAST(y * y AS DECIMAL(36,4)) AS yy
        |  FROM daily),
        |m AS (
        |  SELECT day,
        |    CAST(count(*) OVER w AS BIGINT) AS n,
        |    CAST(sum(x) OVER w AS DOUBLE) AS sx,
        |    CAST(sum(y) OVER w AS DOUBLE) AS sy,
        |    CAST(sum(xy) OVER w AS DOUBLE) AS sxy,
        |    CAST(sum(xx) OVER w AS DOUBLE) AS sxx,
        |    CAST(sum(yy) OVER w AS DOUBLE) AS syy
        |  FROM t
        |  WINDOW w AS (ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, n AS n_days,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN (n * sxy - sx * sy)
        |      / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |  END AS corr
        |FROM m ORDER BY day""".stripMargin,

    // TextOps.rakeKeywords twin: same stopword delimiters (interpolated
    // from the shared Seq), gaps-and-islands phrase segmentation,
    // DECIMAL(24,12) word scores, associative phrase sums.
    "txt_rake_keywords" -> {
      val stops = ops.TextOps.rakeStops.map(w => s"'$w'").mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("lower(text)")} AS t FROM documents),
         |flat AS (
         |  SELECT doc_id, u.pos AS pos, u.w AS w FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
         |      i -> {'pos': i, 'w': t[i]})) AS u
         |    FROM toks)),
         |ns AS (SELECT * FROM flat WHERE w NOT IN ($stops)),
         |isl AS (
         |  SELECT doc_id, pos, w,
         |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS isl
         |  FROM ns),
         |ph AS MATERIALIZED (
         |  SELECT array_to_string(ws, ' ') AS phrase, ws FROM (
         |    SELECT doc_id, isl, list(w ORDER BY pos) AS ws
         |    FROM isl GROUP BY 1, 2)
         |  WHERE len(ws) <= 4),
         |wsc AS (
         |  SELECT w,
         |    CAST(CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |      AS DECIMAL(24,12)) AS score
         |  FROM (SELECT unnest(ws) AS w, len(ws) AS len FROM ph)
         |  GROUP BY 1),
         |occ AS (
         |  SELECT phrase, count(*) AS n_occurrences FROM ph GROUP BY 1),
         |dph AS (SELECT DISTINCT phrase, ws FROM ph),
         |psc AS (
         |  SELECT phrase, sum(score) AS sc FROM (
         |    SELECT phrase, unnest(ws) AS w FROM dph) m
         |  JOIN wsc USING (w) GROUP BY 1)
         |SELECT o.phrase, o.n_occurrences, CAST(sc AS DOUBLE) AS score
         |FROM occ o JOIN psc USING (phrase)
         |ORDER BY score DESC, phrase LIMIT 25""".stripMargin
    },

    // Relational.fdAudit twin: the same g3 counting, six UNION ALL
    // candidate blocks, one double division per row.
    "r_fd_audit" -> {
      def one(tbl: String, det: String, dep: String): String =
        s"""SELECT '$tbl' AS tbl, '$det' AS determinant,
           |  '$dep' AS dependent,
           |  CAST(sum(nx) AS BIGINT) AS n_rows,
           |  CAST(sum(nx - mx) AS BIGINT) AS n_violations,
           |  sum(nx - mx) = 0 AS fd_holds,
           |  CAST(sum(nx - mx) AS DOUBLE) / CAST(sum(nx) AS DOUBLE)
           |    AS g3_rate
           |FROM (
           |  SELECT sum(c) AS nx, max(c) AS mx FROM (
           |    SELECT $det, $dep, count(*) AS c FROM $tbl GROUP BY 1, 2
           |  ) GROUP BY $det)""".stripMargin
      Seq(
        one("customer", "c_custkey", "c_nationkey"),
        one("events", "user_id", "event_type"),
        one("lineitem", "l_orderkey", "l_suppkey"),
        one("lineitem", "l_partkey", "l_suppkey"),
        one("nation", "n_nationkey", "n_regionkey"),
        one("orders", "o_custkey", "o_orderpriority"))
        .mkString("", "\nUNION ALL\n",
          "\nORDER BY tbl, determinant, dependent")
    },

    // Multimodal.sizeQuantiles twin: octet_length of the UTF-8 payload,
    // the shared integer rank rule (rank = greatest(1, ceil(q·n/100))).
    "mm_size_quantiles" ->
      """WITH m AS (
        |  SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]
        |    AS kind,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents),
        |r AS (
        |  SELECT kind, nb,
        |    ROW_NUMBER() OVER (PARTITION BY kind ORDER BY nb) AS rn,
        |    COUNT(*) OVER (PARTITION BY kind) AS cnt
        |  FROM m)
        |SELECT kind, count(*) AS n_media,
        |  CAST(max(CASE WHEN rn = GREATEST(1, (25 * cnt + 99) // 100)
        |    THEN nb END) AS BIGINT) AS p25_bytes,
        |  CAST(max(CASE WHEN rn = GREATEST(1, (50 * cnt + 99) // 100)
        |    THEN nb END) AS BIGINT) AS p50_bytes,
        |  CAST(max(CASE WHEN rn = GREATEST(1, (75 * cnt + 99) // 100)
        |    THEN nb END) AS BIGINT) AS p75_bytes,
        |  CAST(max(CASE WHEN rn = GREATEST(1, (95 * cnt + 99) // 100)
        |    THEN nb END) AS BIGINT) AS p95_bytes
        |FROM r GROUP BY kind ORDER BY kind""".stripMargin)

  /** Shared CTE block for the round-12 directed-structure family: the
    * purchase-precedence top-5 digraph ([[graft.ops.GraphOps
    * .precedenceEdges]] twin — identical integer arithmetic and the
    * same (n DESC, b) window tie-break), its UNION-deduped transitive
    * closure (terminates on cycles because UNION discards repeats),
    * and SCC labels as min MUTUAL-reach id — the spec definition the
    * engine's FW-BW coloring provably computes.
    */
  private def sccCtes(maxBasket: Int = 50, topK: Int = 5): String =
    s"""pitems AS (
       |  SELECT l_orderkey AS okey, l_partkey AS part,
       |         min(l_linenumber) AS pos
       |  FROM lineitem GROUP BY 1, 2),
       |psized AS (
       |  SELECT okey, part, pos FROM (
       |    SELECT okey, part, pos, COUNT(*) OVER (PARTITION BY okey) AS bsz
       |    FROM pitems)
       |  WHERE bsz <= $maxBasket),
       |pdn AS (
       |  SELECT x.part AS a, y.part AS b, count(*) AS n
       |  FROM psized x JOIN psized y
       |    ON x.okey = y.okey AND x.pos < y.pos
       |  GROUP BY 1, 2),
       |pde AS (
       |  SELECT a, b FROM (
       |    SELECT a, b,
       |           row_number() OVER (PARTITION BY a ORDER BY n DESC, b) AS rk
       |    FROM pdn)
       |  WHERE rk <= $topK),
       |pnds AS (SELECT a AS node FROM pde UNION SELECT b FROM pde),
       |preach(src, dst) AS (
       |  SELECT a, b FROM pde
       |  UNION
       |  SELECT r.src, e.b FROM preach r JOIN pde e ON e.a = r.dst),
       |pmutual AS (
       |  SELECT r1.src AS u, r1.dst AS v
       |  FROM preach r1 JOIN preach r2
       |    ON r1.src = r2.dst AND r1.dst = r2.src
       |  UNION ALL SELECT node, node FROM pnds),
       |psccl AS (SELECT u AS node, min(v) AS scc_id FROM pmutual
       |  GROUP BY 1)""".stripMargin

  /** Round-12 additions: the directed-structure family. */
  val round12: Map[String, String] = Map(
    // GraphOps.scc twin: nontrivial SCCs (≥ 2 members) with internal
    // edge counts, scc_id = min member (min mutual-reach id).
    "graph_scc" ->
      s"""WITH RECURSIVE ${sccCtes()}
         |SELECT s.scc_id, s.n_members,
         |       coalesce(ie.n, CAST(0 AS BIGINT)) AS n_internal_edges
         |FROM (
         |  SELECT scc_id, CAST(count(*) AS BIGINT) AS n_members
         |  FROM psccl GROUP BY 1 HAVING count(*) >= 2) s
         |LEFT JOIN (
         |  SELECT sa.scc_id, CAST(count(*) AS BIGINT) AS n
         |  FROM pde
         |  JOIN psccl sa ON pde.a = sa.node
         |  JOIN psccl sb ON pde.b = sb.node
         |  WHERE sa.scc_id = sb.scc_id GROUP BY 1) ie USING (scc_id)
         |ORDER BY s.n_members DESC, s.scc_id""".stripMargin,

    // GraphOps.condensation twin: ordered SCC pairs with crossing-edge
    // counts — the contracted DAG.
    "graph_condensation" ->
      s"""WITH RECURSIVE ${sccCtes()}
         |SELECT sa.scc_id AS scc_a, sb.scc_id AS scc_b,
         |       CAST(count(*) AS BIGINT) AS n_edges
         |FROM pde
         |JOIN psccl sa ON pde.a = sa.node
         |JOIN psccl sb ON pde.b = sb.node
         |WHERE sa.scc_id <> sb.scc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // GraphOps.topoLayers twin: longest-path layer per SCC over the
    // condensation (UNION-deduped depth recursion — bounded by DAG
    // depth × SCC count), surfaced as the layer histogram.
    "graph_topo_layers" ->
      s"""WITH RECURSIVE ${sccCtes()},
         |pce AS (
         |  SELECT DISTINCT sa.scc_id AS ca, sb.scc_id AS cb
         |  FROM pde
         |  JOIN psccl sa ON pde.a = sa.node
         |  JOIN psccl sb ON pde.b = sb.node
         |  WHERE sa.scc_id <> sb.scc_id),
         |psccs AS (SELECT DISTINCT scc_id FROM psccl),
         |plp(scc_id, d) AS (
         |  SELECT scc_id, 0 FROM psccs s
         |  WHERE NOT EXISTS (SELECT 1 FROM pce WHERE cb = s.scc_id)
         |  UNION
         |  SELECT pce.cb, plp.d + 1 FROM plp JOIN pce ON pce.ca = plp.scc_id),
         |play AS (SELECT scc_id, max(d) AS layer FROM plp GROUP BY 1)
         |SELECT CAST(l.layer AS BIGINT) AS layer,
         |       CAST(count(*) AS BIGINT) AS n_sccs,
         |       CAST(sum(m.n) AS BIGINT) AS n_nodes
         |FROM play l
         |JOIN (SELECT scc_id, count(*) AS n FROM psccl GROUP BY 1) m
         |  USING (scc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  )

  /** One side of the year-split precedence construction for the
    * incremental-SCC oracle ([[graft.ops.GraphOps
    * .precedenceEdgesByYear]] twin): the SAME basket filter, pair
    * count, and (n DESC, b) top-k window as [[sccCtes]], evaluated
    * WITHIN the year subset (window functions run after WHERE, and an
    * order's year is constant, so the per-okey basket size is exact in
    * the subset). Emits `${p}de(a, b)`.
    */
  private def precSideCtes(p: String, pred: String,
      maxBasket: Int = 50, topK: Int = 5): String =
    s"""${p}sized AS (
       |  SELECT okey, part, pos FROM (
       |    SELECT i.okey, i.part, i.pos,
       |           COUNT(*) OVER (PARTITION BY i.okey) AS bsz
       |    FROM yitems i JOIN yoy USING (okey) WHERE $pred)
       |  WHERE bsz <= $maxBasket),
       |${p}dn AS (
       |  SELECT x.part AS a, y.part AS b, count(*) AS n
       |  FROM ${p}sized x JOIN ${p}sized y
       |    ON x.okey = y.okey AND x.pos < y.pos
       |  GROUP BY 1, 2),
       |${p}de AS (
       |  SELECT a, b FROM (
       |    SELECT a, b,
       |           row_number() OVER (PARTITION BY a ORDER BY n DESC, b)
       |             AS rk
       |    FROM ${p}dn)
       |  WHERE rk <= $topK)""".stripMargin

  /** Min-mutual-reach SCC labels over an edge CTE `${e}(a, b)` —
    * the [[sccCtes]] closure block, prefix-parameterized so the
    * incremental oracle can label the base and union graphs
    * independently. Emits `${p}sccl(node, scc_id)`.
    */
  private def sccLabelCtes(p: String, e: String): String =
    s"""${p}nds AS (SELECT a AS node FROM $e UNION SELECT b FROM $e),
       |${p}reach(src, dst) AS (
       |  SELECT a, b FROM $e
       |  UNION
       |  SELECT r.src, x.b FROM ${p}reach r JOIN $e x ON x.a = r.dst),
       |${p}mutual AS (
       |  SELECT r1.src AS u, r1.dst AS v
       |  FROM ${p}reach r1 JOIN ${p}reach r2
       |    ON r1.src = r2.dst AND r1.dst = r2.src
       |  UNION ALL SELECT node, node FROM ${p}nds),
       |${p}sccl AS (SELECT u AS node, min(v) AS scc_id FROM ${p}mutual
       |  GROUP BY 1)""".stripMargin

  /** Round-13 additions: incremental SCC maintenance (full-recompute
    * oracle) and the condensation-served reachability census.
    */
  val round13: Map[String, String] = Map(
    // GraphOps.sccIncrementalFace twin: a FULL recompute — SCC labels
    // of base ∪ delta (the strongest check of an incremental operator,
    // the componentsIncremental gate discipline), joined against the
    // base-only labels for the merge census.
    "graph_scc_incremental" ->
      s"""WITH RECURSIVE yitems AS (
         |  SELECT l_orderkey AS okey, l_partkey AS part,
         |         min(l_linenumber) AS pos
         |  FROM lineitem GROUP BY 1, 2),
         |yoy AS (
         |  SELECT o_orderkey AS okey,
         |         EXTRACT(year FROM o_orderdate) AS oy
         |  FROM orders),
         |${precSideCtes("b", "oy < 1998")},
         |${precSideCtes("d", "oy >= 1998")},
         |ude AS (SELECT a, b FROM bde UNION SELECT a, b FROM dde),
         |${sccLabelCtes("u", "ude")},
         |${sccLabelCtes("b", "bde")}
         |SELECT u.scc_id,
         |       CAST(count(*) AS BIGINT) AS n_members,
         |       CAST(count(DISTINCT b.scc_id) AS BIGINT) AS n_base_sccs,
         |       CAST(sum(CASE WHEN b.scc_id IS NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_new_nodes
         |FROM usccl u LEFT JOIN bsccl b USING (node)
         |GROUP BY 1 HAVING count(*) >= 2
         |ORDER BY n_members DESC, u.scc_id""".stripMargin,

    // GraphOps.topoLayersIncremental twin: the graph_topo_layers
    // longest-path recursion over the UNION (base ∪ delta) graph —
    // merged labels re-derived from scratch, never trusted.
    "graph_topo_layers_incremental" ->
      s"""WITH RECURSIVE yitems AS (
         |  SELECT l_orderkey AS okey, l_partkey AS part,
         |         min(l_linenumber) AS pos
         |  FROM lineitem GROUP BY 1, 2),
         |yoy AS (
         |  SELECT o_orderkey AS okey,
         |         EXTRACT(year FROM o_orderdate) AS oy
         |  FROM orders),
         |${precSideCtes("b", "oy < 1998")},
         |${precSideCtes("d", "oy >= 1998")},
         |ude AS (SELECT a, b FROM bde UNION SELECT a, b FROM dde),
         |${sccLabelCtes("u", "ude")},
         |uce AS (
         |  SELECT DISTINCT sa.scc_id AS ca, sb.scc_id AS cb
         |  FROM ude
         |  JOIN usccl sa ON ude.a = sa.node
         |  JOIN usccl sb ON ude.b = sb.node
         |  WHERE sa.scc_id <> sb.scc_id),
         |usccs AS (SELECT DISTINCT scc_id FROM usccl),
         |ulp(scc_id, dd) AS (
         |  SELECT scc_id, 0 FROM usccs s
         |  WHERE NOT EXISTS (SELECT 1 FROM uce WHERE cb = s.scc_id)
         |  UNION
         |  SELECT uce.cb, ulp.dd + 1 FROM ulp
         |  JOIN uce ON uce.ca = ulp.scc_id),
         |ulay AS (SELECT scc_id, max(dd) AS layer FROM ulp GROUP BY 1)
         |SELECT CAST(l.layer AS BIGINT) AS layer,
         |       CAST(count(*) AS BIGINT) AS n_sccs,
         |       CAST(sum(m.n) AS BIGINT) AS n_nodes
         |FROM ulay l
         |JOIN (SELECT scc_id, count(*) AS n FROM usccl GROUP BY 1) m
         |  USING (scc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // GraphOps.reachCensus twin: recursive descendant/ancestor
    // closures over the condensation from the nontrivial-SCC seed set
    // (bounded: seeds × SCCs pair mass), self excluded from counts.
    "graph_reach_census" ->
      s"""WITH RECURSIVE ${sccCtes()},
         |pce AS (
         |  SELECT DISTINCT sa.scc_id AS ca, sb.scc_id AS cb
         |  FROM pde
         |  JOIN psccl sa ON pde.a = sa.node
         |  JOIN psccl sb ON pde.b = sb.node
         |  WHERE sa.scc_id <> sb.scc_id),
         |psz AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS n
         |  FROM psccl GROUP BY 1),
         |pseeds AS (SELECT scc_id FROM psz WHERE n >= 2),
         |pdesc(seed, cur) AS (
         |  SELECT scc_id, scc_id FROM pseeds
         |  UNION
         |  SELECT dsc.seed, e.cb FROM pdesc dsc
         |  JOIN pce e ON e.ca = dsc.cur),
         |panc(seed, cur) AS (
         |  SELECT scc_id, scc_id FROM pseeds
         |  UNION
         |  SELECT an.seed, e.ca FROM panc an
         |  JOIN pce e ON e.cb = an.cur),
         |dagg AS (
         |  SELECT seed,
         |    CAST(sum(CASE WHEN cur <> seed THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_desc_sccs,
         |    CAST(sum(CASE WHEN cur <> seed THEN z.n ELSE 0 END)
         |      AS BIGINT) AS n_desc_nodes
         |  FROM pdesc JOIN psz z ON z.scc_id = pdesc.cur GROUP BY 1),
         |aagg AS (
         |  SELECT seed,
         |    CAST(sum(CASE WHEN cur <> seed THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_anc_sccs,
         |    CAST(sum(CASE WHEN cur <> seed THEN z.n ELSE 0 END)
         |      AS BIGINT) AS n_anc_nodes
         |  FROM panc JOIN psz z ON z.scc_id = panc.cur GROUP BY 1)
         |SELECT s.scc_id, z.n AS n_members,
         |       d.n_desc_sccs, d.n_desc_nodes,
         |       a.n_anc_sccs, a.n_anc_nodes
         |FROM pseeds s
         |JOIN psz z ON z.scc_id = s.scc_id
         |JOIN dagg d ON d.seed = s.scc_id
         |JOIN aagg a ON a.seed = s.scc_id
         |ORDER BY s.scc_id""".stripMargin,
  )

  /** Engine-variant aliases: queries whose plan differs but whose result
    * is proven bit-identical to an already-oracled query share its SQL
    * truth (one oracle, two driver-gated engine shapes).
    */
  val aliased: Map[String, String] = Map(
    "ev_cusum_partitioned" -> extended("ev_cusum_changepoint"),
    // bucketing is pure layout: the scaled-integer supersteps make the
    // bucketed loop bit-identical to the plain one, so one SQL truth
    "graph_pagerank_bucketed" -> round6("graph_pagerank"),
    // same argument for the personalized variant: the base column
    // rides the bucketed node table but every superstep computes the
    // identical integer expression, so the plain PPR's unrolled-CTE
    // oracle is the shared truth (bit-parity spec-pinned)
    "graph_ppr_bucketed" -> round8("graph_ppr_seeded"))
}
