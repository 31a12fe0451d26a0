package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Everything is built-in `functions._` (codegen'd, one narrow pass per
  * doc) — no UDFs. Ratios are integer-over-integer double divisions, which
  * are exactly rounded IEEE ops and therefore engine-reproducible; sums of
  * doubles are avoided everywhere (not associative ⇒ not reproducible).
  *
  * Scale: all per-document ops are embarrassingly parallel (no shuffle).
  * The language-ID lexicon join broadcasts a ~25-row table. The only
  * shuffled op is the per-language argmax (one narrow groupBy on doc_id).
  */
object TextOps {

  /** Whitespace tokens of `text` (empty text ⇒ empty array, not [""]). */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** THE content-hash bucket: first 8 md5 hex chars of the raw text as
    * a LONG, mod `mod`. Every sampling/splitting operator
    * ([[trainTestSplit]], [[sampleStratified]], [[mixtureSampleFrom]],
    * [[weightedSampleFrom]], [[curriculum]], [[ksSplitDrift]]) derives
    * its buckets HERE — one definition, so the engine-side splits can
    * never silently drift apart from each other (their DuckDB twins
    * each restate the same formula). Content-keyed, stateless,
    * engine-portable (md5 everywhere; no seeded rand()).
    */
  private[graft] def contentBucket(mod: Long): Column =
    conv(substring(md5(col("text")), 1, 8), 16, 10).cast(LongType) % mod

  /** Whitespace token count per document. */
  def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"))
      .orderBy("doc_id")

  /** Per-language corpus length profile — exact p50/p90/p99 of document
    * character length from ONE shared count-map per language
    * ([[graft.functions.ExactQuantiles]]). Lengths are a value-bounded
    * integer domain, the aggregate's best case: state collapses to the
    * distinct-length count no matter how many documents — the shape that
    * holds at a 100 TB corpus where the tail percentile drives context-
    * window and packing decisions.
    */
  def lengthQuantiles(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ExactQuantiles.exactQuantiles
    Tables.documents(s, d)
      .select(col("lang"), col("n_chars").cast("double").as("len"))
      .groupBy("lang")
      .agg(exactQuantiles(col("len"), Seq(50, 90, 99), 100).as("qs"))
      .select(col("lang"),
        col("qs").getItem(0).as("len_p50"),
        col("qs").getItem(1).as("len_p90"),
        col("qs").getItem(2).as("len_p99"))
      .orderBy("lang")
  }

  /** BPE-ish subword proxy count: runs of letters, runs of digits, or a
    * single non-space symbol — the standard pre-tokenizer shape. Uses a
    * regex with identical semantics in Java regex and RE2 (oracle parity).
    */
  def subwordCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .cast(LongType).as("n_subwords"))
      .orderBy("doc_id")

  /** Per-document quality signals: length, token stats, punctuation /
    * alphabetic / stopword ratios, plus a composite keep/drop flag — the
    * filters an LLM-corpus pipeline runs before training.
    */
  def qualityScore(s: SparkSession, d: String): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t).cast(LongType)
    val nChars = length(col("text")).cast(LongType)
    val nPunct = nChars - length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", ""))
    val nAlpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
    val stopRe = "\\b(the|a|of|to|in|and|is|it|that|for)\\b"
    val nStop = size(regexp_extract_all(lower(col("text")), lit(stopRe), lit(0)))
      .cast(LongType)
    Tables.documents(s, d).select(
        col("doc_id"),
        nChars.as("n_chars"),
        nTok.as("n_tokens"),
        (nChars.cast("double") / greatest(nTok, lit(1L))).as("mean_token_len"),
        (nPunct.cast("double") / greatest(nChars, lit(1L))).as("punct_ratio"),
        (nAlpha.cast("double") / greatest(nChars, lit(1L))).as("alpha_ratio"),
        (nStop.cast("double") / greatest(nTok, lit(1L))).as("stopword_ratio"))
      .withColumn("keep",
        (col("n_tokens") >= 5) && (col("n_tokens") <= 100000) &&
        (col("mean_token_len") >= 2.0) && (col("mean_token_len") <= 15.0) &&
        (col("alpha_ratio") >= 0.5))
      .orderBy("doc_id")
  }

  /** Tiny per-language stopword lexicon for the n-gram/stopword language-ID
    * heuristic. Deliberately small and hardcoded: at scale this is a
    * broadcast dimension, never a shuffle side.
    */
  val lexicon: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "and", "en" -> "of", "en" -> "to", "en" -> "is",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que", "es" -> "y",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "ist", "de" -> "nicht",
    "fr" -> "le", "fr" -> "les", "fr" -> "et", "fr" -> "des", "fr" -> "est",
    "zh" -> "de5", "zh" -> "shi4", "zh" -> "le5", "zh" -> "bu4", "zh" -> "zai4")

  /** Language-ID: explode tokens, join the broadcast lexicon, count hits
    * per (doc, lang), argmax with deterministic tiebreak. Docs with
    * tokens but no lexicon hits classify as 'und'; docs with EMPTY text
    * are omitted from the output entirely (explode of an empty array —
    * the oracle SQL mirrors this). Scale shape: narrow explode →
    * broadcast join → one groupBy shuffle keyed by doc_id.
    */
  def languageId(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lex = broadcast(lexicon.toDF("lex_lang", "word"))
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val hits = docs
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("word"))
      .join(lex, Seq("word"), "left")
      .groupBy("doc_id", "lex_lang")
      .agg(count(col("lex_lang")).as("hits"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("hits").desc, col("lex_lang").asc_nulls_last)
    hits.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"),
        when(col("hits") > 0, col("lex_lang")).otherwise("und")
          .as("predicted_lang"),
        col("hits"))
      .orderBy("doc_id")
  }

  /** Per-language hapax ratio — the share of each language's vocabulary
    * seen exactly once in the corpus (hapax legomena): the classic
    * lexical-richness/data-sparsity number beside [[zipfFit]] and
    * [[heapsFit]] on the corpus datasheet (a high hapax share predicts
    * tokenizer OOV pressure and poor n-gram LM coverage for that
    * slice). Exactness: all counts integer, the ratio ONE int/int
    * double division. Scale: one term-keyed map-side-combined
    * aggregate, then a languages-sized rollup.
    */
  def hapaxRatio(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("tf"))
      .groupBy("lang")
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("lang"), col("vocab"), col("hapax"),
        (col("hapax").cast("double") / col("vocab")).as("hapax_ratio"))
      .orderBy("lang")

  /** Language-ID confusion matrix — the eval harness for [[languageId]]
    * against the corpus's labeled `lang` column: per (true lang,
    * predicted lang) cell, the doc count and the row share (recall on
    * the diagonal, leakage off it). The "how good is my cheap
    * classifier, per language" readout a pipeline owner checks before
    * trusting a heuristic gate — a classifier that is 95% right on
    * English and 40% on Chinese is exactly what a corpus-wide accuracy
    * number hides. Docs [[languageId]] omits (empty text) count as
    * predicted 'und' — every labeled doc appears in exactly one cell.
    *
    * Exactness: integer counts; the share is ONE int/int double
    * division per cell. Scale: rides [[languageId]]'s shape (narrow
    * explode → broadcast lexicon → doc-keyed aggregate), then a
    * languages²-bounded grid; the share window runs over that grid,
    * never rows.
    */
  def langIdConfusion(s: SparkSession, d: String): DataFrame = {
    val pred = languageId(s, d).select("doc_id", "predicted_lang")
    Tables.documents(s, d).select("doc_id", "lang")
      .join(pred, Seq("doc_id"), "left")
      .select(col("lang"),
        coalesce(col("predicted_lang"), lit("und")).as("predicted_lang"))
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_share", col("n_docs").cast("double")
        / sum(col("n_docs")).over(Window.partitionBy("lang"))
          .cast("double"))
      .orderBy("lang", "predicted_lang")
  }

  /** PII patterns, written to the common subset of Java regex and RE2 (no
    * lookaround, no backreferences) so the oracle engine matches
    * identically: emails, IPv4s, international `+`-prefixed and
    * US-dashed phone numbers.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val phoneRe = "\\+[0-9]{7,15}|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Redacted form of a text column — the composable building block
    * (works on batch and streaming frames alike).
    */
  def redactText(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** The composite keep/drop predicate of [[qualityScore]] as a
    * standalone stateless Column — usable as a streaming filter.
    */
  def qualityKeep(c: Column): Column = {
    val nTok = size(tokens(c)).cast(LongType)
    val nChars = length(c).cast(LongType)
    val meanTokLen = nChars.cast("double") / greatest(nTok, lit(1L))
    val nAlpha = length(regexp_replace(c, "[^A-Za-z]", ""))
    val alphaRatio = nAlpha.cast("double") / greatest(nChars, lit(1L))
    (nTok >= 5L) && (nTok <= 100000L) &&
      (meanTokLen >= 2.0) && (meanTokLen <= 15.0) && (alphaRatio >= 0.5)
  }

  /** PII scrub — the redaction pass an LLM corpus runs before training:
    * emails, IPv4 addresses, and phone numbers replaced with typed
    * placeholder tokens, with per-document match counts (counted on the
    * original text). Narrow per-doc pass, embarrassingly parallel.
    */
  def piiRedact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
          .cast(LongType).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(ipv4Re), lit(0)))
          .cast(LongType).as("n_ips"),
        size(regexp_extract_all(col("text"), lit(phoneRe), lit(0)))
          .cast(LongType).as("n_phones"),
        redactText(col("text")).as("redacted"))
      .orderBy("doc_id")

  /** Deterministic content-hash train/test split: bucket 0..99 from the
    * first 8 md5 hex chars of the raw text, `bucket < testPct` → test.
    * Content-keyed (not id-keyed) so byte-identical duplicates always land
    * in the same split — no train/test leakage through dups. Stateless and
    * embarrassingly parallel: any worker, any engine, any rerun assigns
    * the same row the same way (md5 is engine-portable, unlike seeded
    * `rand()`).
    */
  def trainTestSplit(s: SparkSession, d: String, testPct: Int = 10): DataFrame =
    Tables.documents(s, d).select(
        col("doc_id"),
        contentBucket(100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < testPct, "test").otherwise("train"))
      .orderBy("doc_id")

  /** Deterministic stratified sampling: per-language sampling rates
    * applied via the same content-hash buckets as [[trainTestSplit]] —
    * stateless, reproducible on any engine/executor/rerun, and
    * duplicate-consistent (identical texts sample together). The shape a
    * corpus-balancing pass uses to downweight overrepresented languages.
    * Rates are percentages; strata not listed keep `defaultPct`.
    */
  def sampleStratified(s: SparkSession, d: String,
      rates: Map[String, Int] = Map("en" -> 20),
      defaultPct: Int = 50): DataFrame = {
    val bucket =
      contentBucket(100)
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (lang, pct)) =>
      when(col("lang") === lang, pct).otherwise(acc)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .filter(col("bucket") < rate)
      .orderBy("doc_id")
  }

  /** Corpus vocabulary top-k: term → total occurrences and document
    * frequency, the first statistic a corpus audit pulls. One explode +
    * one term-keyed shuffle; `countDistinct(doc_id)` expands to a
    * two-phase distinct aggregate (no per-term set materialized).
    */
  def topTerms(s: SparkSession, d: String, k: Int = 50): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("term"))
      .limit(k)

  /** Per-document (doc_id, term, tf) — the shared base of the weighting
    * ops below. One explode + one (doc_id, term)-keyed shuffle.
    */
  private def docTermTf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** Top-k TF-IDF terms per document: tf · ln(N/df), the classic salience
    * weighting a corpus audit / keyword extractor runs. The score is
    * surfaced (and ranked) as DECIMAL(20,8): Spark's `log` evaluates via
    * `StrictMath.log` (fdlibm) which differs from other engines' libm by
    * 1 ulp on some inputs (measured), so the raw double is NOT
    * engine-reproducible — the 8-decimal rounding absorbs the ulp while
    * keeping the ranking exact and deterministic (ties break on term).
    *
    * Scale: term df is a second aggregate over the (already reduced)
    * doc-term table, re-joined term-keyed; N arrives as a broadcast
    * 1-row frame (no driver action, no literal bake-in); the per-doc
    * top-k is a window with a rank filter Spark executes as a group
    * limit (no per-doc materialization).
    */
  def tfidfTop(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    val tf = docTermTf(s, d)
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df_, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        (col("tf") * log(col("n_docs").cast("double") / col("df")))
          .cast("decimal(20,8)"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      // surface as double: DECIMAL(20,8) → double is exact-input
      // correctly-rounded on both engines (scaled int < 2^53), and the
      // gate's pandas compare only sorts/hashes primitive dtypes
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf").cast("double").as("tfidf"))
      .orderBy("doc_id", "term")
  }

  /** BM25 top-k retrieval (Robertson–Spärck Jones; the Okapi BM25
    * ranking function, k1 = 1.2, b = 0.75) for a fixed literal query
    * set — the retrieval face a training-data pipeline uses for
    * decontamination probes and eval-set leakage checks, and the
    * lexical twin of the embedding ANN family. score(q, d) =
    * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen)), with
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Reproducibility: every float factor (avglen, idf, the tf
    * normalization) is an identical left-associated IEEE expression on
    * both engines; each per-(query, doc, term) product rounds onto
    * DECIMAL(20,8) (absorbing ln's 1-ulp libm spread — the [[lmScore]]
    * discipline) and the per-doc score is the exact decimal sum, so the
    * (score desc, doc_id) ranking is engine-identical.
    *
    * Scale: two corpus passes — a slim length pass for the N/avglen
    * statistics and a tokenize+explode pass that is immediately
    * semi-joined to the (broadcast, bounded) query vocabulary — so
    * every downstream shuffle is keyed by query terms only;
    * corpus-sized work never survives past the first projection.
    * Deliberately NOT one cached pass: executor-caching the token
    * arrays to share them was measured slower than a second columnar
    * scan (see [[graft.ops.DedupOps.dupSpansFromTokens]]'s identical
    * trade). Top-k per query is a |queries|-partition window over the
    * hit set.
    */
  /** The fixed retrieval query set shared by [[bm25TopK]],
    * [[queryTfidfTopK]], and [[rrfFusion]] (mirrored verbatim in their
    * oracle VALUES lists).
    */
  private def retrievalQueries(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      1L -> Seq("hash", "join", "merge"),
      2L -> Seq("vector", "scan", "filter"),
      3L -> Seq("customer", "order", "data"))
      .flatMap { case (q, ts) => ts.map(q -> _) }
      .toDF("query_id", "term")
  }

  def bm25TopK(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val qdf = retrievalQueries(s)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), tokens(lower(col("text"))).as("t"))
      .select(col("doc_id"), col("t"),
        size(col("t")).cast(LongType).as("len"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("len")).as("total_len"))
    val tfq = toks
      .select(col("doc_id"), col("len"), explode(col("t")).as("term"))
      .join(broadcast(qdf.select("term").distinct()), Seq("term"),
        "left_semi")
      .groupBy("doc_id", "len", "term").agg(count(lit(1)).as("tf"))
    // df as a window over the hit set — not a groupBy + join back, which
    // would re-run the corpus explode + semi-join a second time; the
    // window shuffles only the (bounded) query-term hit rows
    val scored = tfq
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy("term")))
      .join(broadcast(qdf), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avglen",
        col("total_len").cast("double") / col("n_docs"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5))))
      .withColumn("tfc",
        col("tf") * (lit(1.2) + lit(1.0))
          / (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75)
            + lit(0.75) * (col("len").cast("double") / col("avglen")))))
      .withColumn("contrib", (col("idf") * col("tfc")).cast("decimal(20,8)"))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score_dec"),
        count(lit(1)).as("n_terms_hit"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_dec").desc, col("doc_id"))
    perDoc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("doc_id"), col("score_dec").cast("double").as("bm25"),
        col("n_terms_hit"))
      .orderBy("query_id", "rank")
  }

  /** The second retriever for [[rrfFusion]]: plain TF-IDF query scoring
    * (score = Σ_t∈q tf·ln(n_docs/df_t)) over the same query set, same
    * decimal-contribution discipline as [[bm25TopK]] (each double
    * product rounds onto DECIMAL(20,8) so the per-doc sum is exact and
    * the (score desc, doc_id) ranking engine-identical).
    */
  private[graft] def queryTfidfTopK(s: SparkSession, d: String,
      k: Int = 10): DataFrame = {
    val qdf = retrievalQueries(s)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), tokens(lower(col("text"))).as("t"))
    val stats = toks.agg(count(lit(1)).as("n_docs"))
    val tfq = toks
      .select(col("doc_id"), explode(col("t")).as("term"))
      .join(broadcast(qdf.select("term").distinct()), Seq("term"),
        "left_semi")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val scored = tfq
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .join(broadcast(qdf), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        (col("tf") * log(col("n_docs").cast("double") / col("df")))
          .cast("decimal(20,8)"))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score_dec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_dec").desc, col("doc_id"))
    perDoc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("doc_id"), col("score_dec").cast("double").as("tfidf"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009): fuse the
    * [[bm25TopK]] and [[queryTfidfTopK]] rankings per query with
    * rrf(d) = Σ_retrievers 1/(c + rank_r(d)), docs outside a
    * retriever's top-k contributing nothing — the standard way to
    * combine lexical + alternative retrievers without score
    * calibration, because only RANKS cross the fusion boundary. The
    * fused score is the sum of exactly two correctly-rounded double
    * divisions in a fixed order — engine-identical, so the (rrf desc,
    * doc_id) ranking is oracle-exact.
    *
    * Scale shape: each retriever reduces the corpus to ≤ k rows per
    * query BEFORE the fusion join — the full-outer join and re-rank
    * touch O(queries·k) rows, never the corpus. At 100 TB the
    * retrievers are the cost; fusion is free.
    */
  def rrfFusion(s: SparkSession, d: String, k: Int = 10,
      c: Int = 60): DataFrame = {
    val a = bm25TopK(s, d, k)
      .select(col("query_id"), col("doc_id"), col("rank").as("rank_bm25"))
    val b = queryTfidfTopK(s, d, k)
      .select(col("query_id"), col("doc_id"), col("rank").as("rank_tfidf"))
    val fused = a.join(b, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        col("rank_bm25"), col("rank_tfidf"),
        (coalesce(lit(1.0) / (lit(c.toLong) + col("rank_bm25")), lit(0.0))
          + coalesce(lit(1.0) / (lit(c.toLong) + col("rank_tfidf")),
            lit(0.0))).as("rrf"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("doc_id"), col("rank_bm25"), col("rank_tfidf"), col("rrf"))
      .orderBy("query_id", "rank")
  }

  /** BPE merge-pair statistics (Sennrich et al. 2016 §3.2, the counting
    * step of byte-pair-encoding tokenizer training — the part that IS
    * distributed at corpus scale; the merge loop itself is a driver-side
    * iteration over this table): top adjacent character pairs across the
    * corpus, each word's pair counts weighted by the word's corpus
    * frequency. Pure integer counting — engine-exact by construction.
    *
    * Scale: the corpus reduces to its VOCABULARY first (one word-keyed
    * shuffle; the canonical BPE-training trick — pair extraction then
    * runs over |vocab| rows, not |tokens|), pairs explode row-locally
    * (|word|−1 per word), one pair-keyed aggregate, one top-k.
    */
  def bpePairs(s: SparkSession, d: String, k: Int = 50): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(explode(tokens(lower(col("text")))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wf"))
      .filter(length(col("word")) >= 2)
    vocab
      .select(col("wf"), explode(transform(
          sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("wf")).as("n_occurrences"),
        count(lit(1)).as("n_vocab_words"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(k)
  }

  /** BPE merge LOOP (Sennrich et al. 2016 §3.2 — the iterative half of
    * tokenizer training; [[bpePairs]] is its distributed counting step):
    * `merges` rounds of (count adjacent symbol pairs over the vocabulary,
    * weighted by word frequency) → (merge the most frequent pair
    * everywhere, greedy left-to-right non-overlapping) → repeat, emitting
    * the ordered merge table a BPE tokenizer is defined by.
    *
    * Representation: each word's symbol sequence is ONE string with every
    * symbol wrapped in `<…>` sentinels (vocabulary restricted to
    * `^[a-z]+$`, so the sentinels cannot collide). Applying a merge is
    * then a single literal `replace('<a><b>' → '<ab>')` — and because
    * `replace` consumes matches left-to-right without rescanning
    * replaced output, it IS the greedy non-overlapping merge semantics
    * of the reference implementation (`'<a><a><a>'` merges once, not
    * twice; engine-identical in Spark and DuckDB). Pair counting
    * re-derives the symbol array per round via `regexp_extract_all` —
    * a row-local codegen'd pass over the (vocabulary-sized, never
    * corpus-sized) table.
    *
    * Scale: the corpus reduces to its vocabulary ONCE; each round is one
    * narrow pass + one pair-keyed aggregate + a single-row top-1 to the
    * driver (the merge decision — bounded driver state, the CC/PageRank
    * loop discipline; the full driver footprint is the k-row merge
    * list), with lineage truncated per round by localCheckpoint. Pure
    * integer counts and string ops ⇒ engine-exact, oracle-verified
    * against unrolled k-step CTEs.
    */
  def bpeMerges(s: SparkSession, d: String, merges: Int = 8): DataFrame =
    bpeArtifact(s, d, merges)._1

  /** Read-or-train the persisted BPE artifact: (merge table, final
    * vocabulary representations), fingerprint-guarded by the
    * `documents` input ([[graft.CorpusPipeline]]'s labels-artifact
    * discipline, walked portably via [[graft.sources.Fingerprint]]).
    * One tokenizer is TRAINED ONCE; [[bpeMerges]] surfaces its merge
    * table and [[bpeEncode]] applies its vocabulary — without this,
    * encode re-ran the whole 8-round driver-paced loop a second time
    * per pipeline pass for the same trained state. Unreadable/missing
    * artifacts and degenerate (None) fingerprints recompute, never
    * fail or reuse stale state.
    */
  private def bpeArtifact(s: SparkSession, d: String,
      merges: Int): (DataFrame, DataFrame) = {
    // full-path-hashed key (Sinks.namespaced) under the configurable
    // staging root — same-basename datasets must not share an artifact
    // dir (see EventOps.sketchPartials)
    val outDir = graft.sources.Sinks.namespaced(
      s"${graft.sources.Artifact.stagingRoot(s)}/graft_bpe_stages/" +
        s"${new java.io.File(d).getName}_m$merges", d)
    val frames = graft.sources.Artifact.readOrCompute(s, outDir,
      "bpe.fingerprint", Seq(s"$d/documents.parquet"),
      Seq("merges", "final_vocab")) { () =>
      val (mergesDf, finalVocab) = bpeTrain(s, bpeVocab(s, d), merges)
      Map("merges" -> mergesDf, "final_vocab" -> finalVocab)
    }
    (frames("merges").orderBy("step"), frames("final_vocab"))
  }

  /** The training vocabulary: pure-alphabetic multi-char words with
    * corpus frequencies (the sentinel representation relies on the
    * `^[a-z]+$` restriction).
    */
  private def bpeVocab(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(lower(col("text")))).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("wf"))

  /** [[bpeMerges]] core over an explicit (word, wf) vocabulary — the
    * spec drives it with Sennrich's worked example.
    */
  private[graft] def bpeMergesFrom(s: SparkSession, vocabIn: DataFrame,
      merges: Int): DataFrame = bpeTrain(s, vocabIn, merges)._1

  /** The BPE training loop: returns (ordered merge table, final
    * vocabulary with each word's post-merge symbol representation) —
    * the second half is what [[bpeEncode]] applies back to the corpus.
    */
  /** Merge rounds executed since JVM start — test observability for the
    * artifact contract (encode-after-train must add ZERO rounds).
    */
  private[graft] val trainRounds =
    new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def bpeTrain(s: SparkSession, vocabIn: DataFrame,
      merges: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    // the loop state is VOCABULARY-sized (collapsed from the corpus) —
    // at fixture scale that is a few-MB table, and 32-partition rounds
    // pay 8× scheduling overhead for no parallelism; at 100 TB the same
    // line becomes repartition(vocabRows / targetPartitionRows)
    var vocab = vocabIn
      .select(col("word"), col("wf"),
        regexp_replace(col("word"), "(.)", "<$1>").as("repr"))
      .coalesce(4)
      .localCheckpoint()
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (step <- 1 to merges if !exhausted) {
      trainRounds.incrementAndGet()
      val syms = vocab.select(col("wf"),
          expr("regexp_extract_all(repr, '<([^<>]*)>', 1)").as("syms"))
        .filter(size(col("syms")) >= 2)
      val top = syms.select(col("wf"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("a"),
              element_at(col("syms"), (i + 1).cast("int")).as("b"))))
            .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wf")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect() // ONE row — the round's merge decision
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((step, a, b, c))
        // symbols are ^[a-z]+$ — safe inside a SQL string literal
        vocab = vocab.select(col("word"), col("wf"),
            expr(s"replace(repr, '<$a><$b>', '<$a$b>')").as("repr"))
          .localCheckpoint()
      }
    }
    val mergesDf = out.toSeq
      .map { case (st, a, b, c) => (st, a, b, a + b, c) }
      .toDF("step", "left_sym", "right_sym", "merged", "n_occurrences")
      .orderBy("step")
    (mergesDf, vocab)
  }

  /** Apply the trained BPE back to the corpus (the encode half of
    * tokenizer training): per document, how many subwords the first
    * `merges` merges leave — n_words, n_subwords, and their ratio
    * (fertility under THIS corpus's own trained merges, vs
    * [[fertility]]'s fixed pre-tokenizer proxy). The corpus-side
    * application is a broadcast JOIN against the trained vocabulary's
    * final representations — encoding never re-runs the merge loop
    * per document, which is the point of training on the vocabulary:
    * |vocab| merge applications, corpus-many lookups. Words outside
    * the training restriction (`^[a-z]+$`, len ≥ 2) are out of scope
    * on both sides, so every counted word has a trained representation.
    * At 100 TB the vocabulary outgrows a broadcast and the lookup
    * becomes an ordinary vocab-keyed shuffle join — shape unchanged.
    */
  def bpeEncode(s: SparkSession, d: String, merges: Int = 8): DataFrame = {
    // the trained state comes from the persisted artifact — encode
    // NEVER re-runs the merge loop (spec-pinned via trainRounds)
    val (_, finalVocab) = bpeArtifact(s, d, merges)
    val sub = finalVocab.select(col("word"),
      size(expr("regexp_extract_all(repr, '<([^<>]*)>', 1)"))
        .cast(LongType).as("n_sub"))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) >= 2)
      .join(broadcast(sub), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).cast(LongType).as("n_subwords"))
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        (col("n_subwords").cast("double") / col("n_words"))
          .as("bpe_fertility"))
      .orderBy("doc_id")
  }

  /** PMI collocations (Church & Hanks 1990): the top adjacent word
    * pairs by pointwise mutual information — ln(p(a,b) / (p(a)·p(b)))
    * with bigram probabilities over the corpus bigram count and unigram
    * probabilities over the token count — the classic collocation /
    * multi-word-expression detector (a high-PMI pair co-occurs far more
    * than its parts' frequencies predict). `minCount` kills the
    * low-evidence noise PMI is notorious for (a hapax pair maxes the
    * score). All counts are integers; the score is one double ratio
    * ((c_ab·N_t·N_t) / (N_b·c_a·c_b), identical association order in
    * both engines) through one `ln`, rounded onto DECIMAL(20,8) for the
    * ranking (the [[bm25TopK]] discipline — absorbs ln's libm spread).
    * Scale shape: one corpus pass each for unigrams and bigram pairs,
    * the (pair)-keyed aggregate is the only fact-sized shuffle, totals
    * broadcast as 1-row frames.
    */
  def pmiCollocations(s: SparkSession, d: String, minCount: Int = 5,
      k: Int = 30): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(tokens(lower(col("text"))).as("t"))
    val uni = toks.select(explode(col("t")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum(col("c")).as("nt")).crossJoin(
      toks.filter(size(col("t")) >= 2)
        .select((size(col("t")) - 1).cast(LongType).as("nb_doc"))
        .agg(sum(col("nb_doc")).as("nb")))
    val pairs = toks.filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("a"),
          element_at(col("t"), (i + 1).cast("int")).as("b")))).as("p"))
      .select(col("p.a").as("w1"), col("p.b").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    pairs
      .join(uni.select(col("term").as("w1"), col("c").as("ca")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("c").as("cb")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi_dec",
        log((col("n_pair").cast("double") * col("nt") * col("nt"))
          / (col("nb").cast("double") * col("ca") * col("cb")))
          .cast("decimal(20,8)"))
      .orderBy(col("pmi_dec").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("n_pair"),
        col("pmi_dec").cast("double").as("pmi"))
  }

  /** Token-level Shannon entropy per document — the lexical-diversity
    * quality signal (a low-entropy page is repetitive boilerplate; the
    * distributional cousin of [[graft.ops.CorpusOps.repetitionRatio]]):
    * H = −Σ_t (tf/n)·ln(tf/n) over the doc's own token distribution.
    * Each per-(doc, term) contribution tf·ln(tf/n) rounds onto
    * DECIMAL(24,9) (the [[lmScore]] discipline — absorbs ln's 1-ulp
    * libm spread, makes the per-doc sum exact/associative); the final
    * −sum/n is one exactly-rounded division. One corpus scan, one
    * (doc, term)-keyed aggregate — no corpus-wide state at all.
    */
  def tokenEntropy(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = Window.partitionBy("doc_id")
    tf
      .withColumn("n", sum(col("tf")).over(n))
      .withColumn("contrib",
        (col("tf") * log(col("tf").cast("double") / col("n")))
          .cast("decimal(24,9)"))
      .groupBy("doc_id")
      .agg(max(col("n")).cast(LongType).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("contrib")).as("sum_c"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (-col("sum_c").cast("double") / col("n_tokens")).as("entropy"))
      .orderBy("doc_id")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    * the corpus-wide word co-occurrence graph — an undirected edge
    * between every DISTINCT adjacent token pair — surfacing the top-k
    * central terms. Composes [[graft.ops.GraphOps.pageRankFrom]]
    * verbatim (same scaled-integer supersteps, so the ranking is
    * engine-exact; see its contract), which is the point: the graph
    * core is key-type-agnostic and ranks word strings exactly as it
    * ranks trade-partner ids. Edge extraction is one row-local
    * adjacent-pair explode + one distinct — the co-occurrence graph is
    * VOCABULARY-sized (like [[bpePairs]]' table), not corpus-sized.
    */
  def textRank(s: SparkSession, d: String, k: Int = 25): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(tokens(lower(col("text"))).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("a"),
          element_at(col("t"), (i + 1).cast("int")).as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
    // totalNodes=false: edges are the both-directions union, so every
    // node has in-degree ≥ 1 and the per-round total-nodes left join
    // is structurally a no-op (the pageRank round-13 argument)
    graft.ops.GraphOps.pageRankFrom(edges, totalNodes = false)
      .orderBy(col("r").desc, col("node"))
      .limit(k)
      .select(col("node").as("term"),
        (col("r").cast("double") / lit(1e12)).as("textrank"))
  }

  /** Unigram language-model score per document: mean token log-probability
    * under the corpus's own MLE unigram distribution — the cheap
    * perplexity proxy used to quality-rank corpora (low mean logprob ⇒
    * unusual/garbled text). p(t) = ctf_t / T over the whole corpus.
    *
    * Reproducibility: each per-term contribution tf·ln(p) is rounded to a
    * DECIMAL(24,9) — the per-doc sum is then EXACT (decimal addition is
    * associative; double addition is not, and a shuffled double sum
    * would differ run-to-run). 9 fractional digits keeps the scaled sum
    * far under 2^53 so the final to-double surfacing is exact-input
    * correctly-rounded on both engines.
    *
    * Scale: two aggregates and one term-keyed join, same shape as
    * [[tfidfTop]]; the corpus distribution (distinct terms) is the only
    * state and it is a reduced table, never a per-token one.
    */
  def lmScore(s: SparkSession, d: String): DataFrame =
    lmPerDoc(s, d)
      .select(col("doc_id"), col("n_tokens"),
        (col("sum_lp").cast("double") / col("n_tokens"))
          .as("avg_logprob"))
      .orderBy("doc_id")

  /** [[lmScore]] internals: per-doc token count and EXACT decimal logprob
    * sum (pre-division) — kept separate so downstream aggregates
    * ([[ccnetBuckets]]) can keep summing the associative decimal instead
    * of re-rounding the double quotient (a double→decimal recast is NOT
    * engine-portable: the rounding of a near-midpoint double differs).
    */
  private[graft] def lmPerDoc(s: SparkSession, d: String): DataFrame = {
    val tf = docTermTf(s, d)
    val ctf = tf.groupBy("term").agg(sum(col("tf")).as("ctf"))
    val tTotal = tf.agg(sum(col("tf")).as("t_total"))
    tf.join(ctf, "term")
      .crossJoin(broadcast(tTotal))
      .withColumn("lp",
        (col("tf") * log(col("ctf").cast("double") / col("t_total")))
          .cast("decimal(24,9)"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"), sum(col("lp")).as("sum_lp"))
  }

  /** Bigram LM quality score (round 7 — the n-gram upgrade of
    * [[lmScore]]'s unigram proxy; CCNet's actual filter is an n-gram LM
    * perplexity): mean add-one-smoothed bigram log-probability per
    * document, p(cur|prev) = (c(prev,cur) + 1) / (c(prev,·) + |V|),
    * with |V| the corpus unigram vocabulary. Per-(doc, prev, cur)
    * contributions tf·ln(p) round onto DECIMAL(24,9) (the established
    * discipline — associative per-doc sums, engine-identical division
    * inputs since every count is an integer). Documents with fewer than
    * two tokens have no bigram evidence and are absent, exactly as
    * zero-token docs are absent from [[lmScore]].
    *
    * Scale: one adjacent-pair explode of the corpus (row-local), two
    * bigram-keyed aggregates (the model), one broadcast scalar (|V|),
    * one (prev,cur)-keyed join back — the [[lmScore]] shape one n-gram
    * order up; the model tables are vocabulary²-bounded in principle
    * but OBSERVED-bigram-bounded in fact (≤ corpus positions).
    */
  def lmScoreBigram(s: SparkSession, d: String): DataFrame =
    lmBigramPerDoc(s, d)
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_lp").cast("double") / col("n_bigrams"))
          .as("avg_logprob"))
      .orderBy("doc_id")

  /** [[lmScoreBigram]] internals (pre-division decimal sums, the
    * [[lmPerDoc]] pattern) so [[ccnetBucketsBigram]] keeps summing the
    * associative decimal.
    */
  private[graft] def lmBigramPerDoc(s: SparkSession, d: String): DataFrame = {
    val big = docBigrams(s, d)
    val cb = big.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
    val cp = big.groupBy("prev").agg(count(lit(1)).as("cp"))
    val v = Tables.documents(s, d)
      .select(explode(tokens(lower(col("text")))).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    big.groupBy("doc_id", "prev", "cur").agg(count(lit(1)).as("tf"))
      .join(cb, Seq("prev", "cur"))
      .join(cp, Seq("prev"))
      .crossJoin(broadcast(v))
      .withColumn("lp",
        (col("tf") * log((col("cb") + lit(1.0)) / (col("cp") + col("v"))))
          .cast("decimal(24,9)"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"), sum(col("lp")).as("sum_lp"))
  }

  /** Zipf's-law fit of the corpus rank–frequency curve (Zipf 1949;
    * Piantadosi 2014 review): OLS slope/intercept of ln(freq) against
    * ln(rank) — the one-line distribution fingerprint a corpus
    * datasheet reports (natural language sits near slope −1; a corpus
    * drifting toward 0 is template/boilerplate-heavy, far below −1 is
    * vocabulary-collapsed). Ranks are integers from the determinate
    * (ctf desc, term asc) ordering; x = ln(rank) and y = ln(ctf) are
    * single correctly-rounded `ln`s of integers, so identical in both
    * engines up to the known 1-ulp libm spread — each of x, y, x·y,
    * x² therefore rounds onto DECIMAL(24,9) BEFORE summing (the
    * windowed-sum discipline: decimal sums are associative and the
    * 1-ulp inputs survive the 1e-9 grain), and the closed-form
    * slope/intercept is one identical double expression over the four
    * cast sums.
    *
    * Scale shape: one corpus term count (the [[topTerms]] aggregate),
    * then the DISTRIBUTED global rank ([[Ranks.globalRank]] — the
    * range-sort + zipWithIndex-offset scheme): a web-scale vocabulary
    * is 10⁸–10⁹ distinct terms, itself data-sized, so the naive single
    * `ORDER BY` window's one-task sort (the round-9 `weak` flag) is
    * replaced by a rank whose window groups are bounded by partition
    * size. Ranks are bit-identical ((ctf desc, term) is total), then
    * one single-row reduce.
    */
  def zipfFit(s: SparkSession, d: String): DataFrame = {
    val ctf = docTermTf(s, d)
      .groupBy("term").agg(sum(col("tf")).as("ctf"))
    val ranked = Ranks.globalRank(ctf,
      Seq(col("ctf").desc, col("term")), "rank")
    val terms = ranked.select(
      log(col("rank").cast("double")).cast("decimal(24,9)").as("x"),
      log(col("ctf").cast("double")).cast("decimal(24,9)").as("y"),
      (log(col("rank").cast("double")) * log(col("ctf").cast("double")))
        .cast("decimal(24,9)").as("xy"),
      (log(col("rank").cast("double")) * log(col("rank").cast("double")))
        .cast("decimal(24,9)").as("xx"))
    terms.agg(count(lit(1)).as("n_terms"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("xy")).cast("double").as("sxy"),
        sum(col("xx")).cast("double").as("sxx"))
      .select(col("n_terms"),
        ((col("n_terms") * col("sxy") - col("sx") * col("sy"))
          / (col("n_terms") * col("sxx") - col("sx") * col("sx")))
          .as("slope"),
        ((col("sy") - ((col("n_terms") * col("sxy")
              - col("sx") * col("sy"))
            / (col("n_terms") * col("sxx") - col("sx") * col("sx")))
            * col("sx")) / col("n_terms"))
          .as("intercept"))
  }

  /** Flesch reading-ease per document (Flesch 1948; Kincaid et al.
    * 1975 recalibration) — the readability column of a corpus
    * datasheet and a standard quality-filter feature beside the Gopher
    * /C4 rules: 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), with syllables approximated as vowel-
    * group runs (`[aeiouy]+`) — the classic heuristic; exact
    * syllabification needs a dictionary, and the FEATURE contract is
    * deterministic counting, not linguistics.
    *
    * Exactness: words/sentences/syllables are integer counts from the
    * shared tokenizer and two fixed regexes (identical engines); the
    * score is ONE double expression over three ints with the identical
    * parenthesization in the oracle (int/int `/` is double division in
    * BOTH engines). Empty-sentence docs clamp to 1 sentence
    * (`greatest`) — a text with no terminal punctuation is one
    * sentence, not a division by zero. Scale: entirely row-local — no
    * shuffle at all before the output sort.
    */
  def readability(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        tokens(lower(col("text"))).as("ws"), col("text"))
      .select(col("doc_id"), col("lang"),
        size(col("ws")).cast("long").as("words"),
        greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
            .cast("long")).as("sentences"),
        // compiled vowel-run scan (one codegen'd pass; the
        // transform/regexp HOF chain is its spec twin — a maximal
        // [aeiouy]+ run is exactly one regex match, so the integers
        // are identical; VowelRunSumSpec pins it)
        graft.functions.VowelRunSum.vowelRunSumCompiled(col("ws"))
          .as("syllables"))
      .filter(col("words") >= 1)
    per.select(col("doc_id"), col("lang"), col("words"),
        col("sentences"), col("syllables"),
        (lit(206.835) - lit(1.015) * (col("words") / col("sentences"))
          - lit(84.6) * (col("syllables") / col("words"))).as("flesch"))
      .orderBy("doc_id")
  }

  /** MATTR — moving-average type-token ratio (Covington & McFall
    * 2010), the length-independent lexical-diversity score: mean over
    * all W-token sliding windows of (distinct types in window)/W,
    * falling back to plain TTR for documents shorter than the window.
    * Plain TTR decays mechanically with length (Heaps' law), so
    * cross-document comparisons need the windowed form — the
    * datasheet's diversity column beside [[heapsFit]]'s β and
    * [[hapaxRatio]].
    *
    * Exactness: every window's distinct count is an integer from the
    * shared tokenizer (`array_distinct` over 1-based slices — both
    * engines slice identically); the summed counts stay integer and
    * ONE int/int double division produces the score. Scale: entirely
    * row-local (O(len·W) per document, bounded by document length —
    * the same budget as the shingle builds); no shuffle before the
    * output sort.
    */
  def mattr(s: SparkSession, d: String, w: Int = 50): DataFrame = {
    val per = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        tokens(lower(col("text"))).as("ws"))
      .select(col("doc_id"), col("lang"),
        size(col("ws")).cast("long").as("n_tokens"), col("ws"))
      .filter(col("n_tokens") >= 1)
    per.select(col("doc_id"), col("lang"), col("n_tokens"),
        when(col("n_tokens") <= w,
          size(array_distinct(col("ws"))) / col("n_tokens"))
          .otherwise(
            // compiled sliding count-map (O(len), one codegen'd pass)
            // — the transform/slice/array_distinct HOF chain is its
            // spec twin (O(len·w) interpreted; MattrWindowSumSpec pins
            // the integer equivalence)
            graft.functions.MattrWindowSum
              .mattrWindowSumCompiled(col("ws"), w)
              / (lit(w) * (col("n_tokens") - w + 1)))
          .as("mattr"))
      .orderBy("doc_id")
  }

  /** Top-N vocabulary coverage curve — the tokenizer-sizing readout:
    * what share of all corpus tokens the N most frequent terms cover,
    * at N ∈ {100, 1000, 10000}. The curve is how a vocabulary budget
    * is chosen (and the OOV rate it implies is 1 − coverage); it pairs
    * with [[zipfFit]]'s slope (a steeper Zipf means a smaller N covers
    * more).
    *
    * Exactness: ranks come from the same determinate (ctf desc, term)
    * order as [[zipfFit]]; covered/total are integer sums; coverage is
    * ONE int/int double division per grid point. Scale: one corpus
    * term count, then the DISTRIBUTED global rank ([[Ranks
    * .globalRank]] — vocabulary is data-sized at web scale) and ONE
    * conditional-sum aggregate; the grid never fans anything out.
    */
  def vocabCoverage(s: SparkSession, d: String,
      grid: Seq[Int] = Seq(100, 1000, 10000)): DataFrame = {
    val ctf = docTermTf(s, d)
      .groupBy("term").agg(sum(col("tf")).as("ctf"))
    val ranked = Ranks.globalRank(ctf,
      Seq(col("ctf").desc, col("term")), "rank")
    val agg = ranked.agg(
      sum(col("ctf")).as("total"),
      grid.map(n => sum(when(col("rank") <= n, col("ctf"))
        .otherwise(0L)).as(s"c$n")): _*)
    agg.select(explode(array(grid.map(n =>
        struct(lit(n.toLong).as("n_top"), col(s"c$n").as("covered"))): _*))
        .as("g"), col("total"))
      .select(col("g.n_top").as("n_top"),
        col("g.covered").as("covered_tokens"),
        col("total").as("total_tokens"),
        (col("g.covered").cast("double") / col("total")).as("coverage"))
      .orderBy("n_top")
  }

  /** Pairwise Jensen–Shannon divergence between the languages' unigram
    * distributions (Lin 1991) — the symmetric, bounded (≤ ln 2)
    * corpus-comparison number beside [[chisqLangLength]]'s independence
    * test and [[ksSplitDrift]]'s two-sample statistic: "how far apart
    * are two languages' token distributions?", and the same machinery
    * a datasheet uses to compare corpus SNAPSHOTS. Computed in nats.
    *
    * Decomposition that avoids a full-outer join: terms in only one
    * distribution contribute p·ln 2, so JSD = [Σ_shared (p·ln(2p/(p+q))
    * + q·ln(2q/(p+q))) + (1−Σ_shared p)·ln 2 + (1−Σ_shared q)·ln 2]/2 —
    * everything comes from the INNER join on term plus the per-language
    * totals. ln 2 is pinned to the literal 0.6931471805599453 in both
    * engines (no libm call on a constant).
    *
    * Exactness: p, q are int/int double divisions; each shared-term
    * contribution and each p/q rounds onto DECIMAL(24,9) BEFORE the
    * associative sums (the windowed-sum discipline — the 1-ulp libm
    * spread on `ln` survives the 1e-9 grain); the final combination is
    * one double expression over the cast sums. Scale: one (lang, term)
    * aggregate, a term-keyed equi-self-join (langs² pair fan-out of the
    * VOCABULARY frame, never facts), one pair-keyed reduce.
    */
  def jsDivergence(s: SparkSession, d: String): DataFrame = {
    val ln2 = lit(0.6931471805599453)
    val u = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("tf"))
    val tot = u.groupBy("lang").agg(sum(col("tf")).as("n"))
    val p = u.join(broadcast(tot), Seq("lang"))
      .select(col("lang"), col("term"),
        (col("tf") / col("n")).as("p"))
    val pairs = p.as("a").join(p.as("b"),
      col("a.term") === col("b.term") && col("a.lang") < col("b.lang"))
      .select(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"),
        col("a.p").as("pa"), col("b.p").as("pb"))
    pairs
      .select(col("lang_a"), col("lang_b"),
        (col("pa") * log(lit(2.0) * col("pa") / (col("pa") + col("pb")))
          + col("pb") * log(lit(2.0) * col("pb") / (col("pa") + col("pb"))))
          .cast("decimal(24,9)").as("c"),
        col("pa").cast("decimal(24,9)").as("pa9"),
        col("pb").cast("decimal(24,9)").as("pb9"))
      .groupBy("lang_a", "lang_b")
      .agg(count(lit(1)).as("n_shared_terms"),
        sum(col("c")).as("sc"),
        sum(col("pa9")).as("sp"), sum(col("pb9")).as("sq"))
      .select(col("lang_a"), col("lang_b"), col("n_shared_terms"),
        ((col("sc").cast("double")
          + (lit(1).cast("decimal(24,9)") - col("sp")).cast("double") * ln2
          + (lit(1).cast("decimal(24,9)") - col("sq")).cast("double") * ln2)
          / 2).as("jsd"))
      .orderBy("lang_a", "lang_b")
  }

  /** Heaps'-law fit of per-document vocabulary growth (Heaps 1978;
    * [[zipfFit]]'s companion — the two laws are duals): OLS of
    * ln(distinct types) against ln(tokens) across documents, giving
    * V(n) ≈ K·n^β. Natural prose sits at β ≈ 0.4–0.6; β drifting
    * toward 1 means near-zero repetition (id-like/garbage text),
    * toward 0 means template spam — the same datasheet page as the
    * Zipf slope, answering "does vocabulary grow the way real text's
    * does?". Identical numeric discipline to [[zipfFit]]: integer
    * (tokens, types) per doc (one row-local pass — `size` and
    * `array_distinct`, no shuffle), each OLS factor rounded onto
    * DECIMAL(24,9) before the associative sums, closed-form
    * slope/intercept over the four cast sums. Output is
    * (n_docs, beta, ln_k).
    */
  def heapsFit(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d)
      .select(tokens(lower(col("text"))).as("t"))
      .select(size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("n_types"))
      .filter(col("n_tokens") >= 1)
    val terms = per.select(
      log(col("n_tokens").cast("double")).cast("decimal(24,9)").as("x"),
      log(col("n_types").cast("double")).cast("decimal(24,9)").as("y"),
      (log(col("n_tokens").cast("double"))
        * log(col("n_types").cast("double")))
        .cast("decimal(24,9)").as("xy"),
      (log(col("n_tokens").cast("double"))
        * log(col("n_tokens").cast("double")))
        .cast("decimal(24,9)").as("xx"))
    terms.agg(count(lit(1)).as("n_docs"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("xy")).cast("double").as("sxy"),
        sum(col("xx")).cast("double").as("sxx"))
      .select(col("n_docs"),
        ((col("n_docs") * col("sxy") - col("sx") * col("sy"))
          / (col("n_docs") * col("sxx") - col("sx") * col("sx")))
          .as("beta"),
        ((col("sy") - ((col("n_docs") * col("sxy")
              - col("sx") * col("sy"))
            / (col("n_docs") * col("sxx") - col("sx") * col("sx")))
            * col("sx")) / col("n_docs"))
          .as("ln_k"))
  }

  /** Adjacent (prev, cur) token-pair positions per document — the
    * bigram frame [[lmBigramPerDoc]] and [[knPerDoc]] share: one
    * row-local explode of the corpus, no shuffle.
    */
  private def docBigrams(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), tokens(lower(col("text"))).as("t"))
    toks.filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("prev"),
            element_at(col("t"), (i + 1).cast("int")).as("cur")))).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"),
        col("p.cur").as("cur"))
  }

  /** Interpolated Kneser–Ney bigram LM score (Kneser & Ney 1995;
    * Chen & Goodman 1999 eq. 16) — the smoothing KenLM implements and
    * CCNet-style perplexity filters actually run, upgrading
    * [[lmScoreBigram]]'s add-one proxy: per document the mean of
    * ln p(cur|prev) with
    *
    *   p(cur|prev) = (c(prev,cur) − D)/c(prev,·)
    *               + (D·N₁₊(prev,·)/c(prev,·)) · (N₁₊(·,cur)/N₁₊(·,·))
    *
    * at the standard discount D = 0.75 (exactly representable in
    * binary, so both engines carry the identical double). The
    * continuation weight N₁₊(·,cur)/N₁₊(·,·) scores a word by how many
    * DISTINCT contexts it follows — the "San Francisco" insight:
    * "Francisco" is frequent but only ever follows "San", so its
    * continuation probability is tiny where a unigram back-off would
    * overrate it. Scored bigrams are by construction observed in the
    * corpus (c ≥ 1 > D), so the max(c−D, 0) clamp is vacuous and the
    * absolute-discount term is always positive. Every count is an
    * exact integer; each factor is one correctly-rounded int→double
    * conversion and division written in the IDENTICAL operation order
    * in both engines, and per-position contributions tf·ln(p) round
    * onto DECIMAL(24,9) (the [[lmScore]] discipline) so per-doc sums
    * are associative. Docs with fewer than two tokens carry no bigram
    * evidence and are absent, as in [[lmScoreBigram]].
    *
    * Scale shape: the [[lmScoreBigram]] plan plus three model-sized
    * aggregates — N₁₊(prev,·) and N₁₊(·,cur) reduce the OBSERVED
    * bigram-type table (≤ corpus positions, vocabulary²-bounded), and
    * the type total rides as a broadcast 1-row frame. The per-doc join
    * chain stays (prev, cur)-keyed throughout — one fact-sized shuffle,
    * model tables broadcast-or-type-sized.
    */
  def knScore(s: SparkSession, d: String): DataFrame =
    knPerDoc(s, d)
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_lp").cast("double") / col("n_bigrams"))
          .as("avg_logprob"))
      .orderBy("doc_id")

  /** [[knScore]] internals (pre-division decimal sums, the
    * [[lmPerDoc]] pattern).
    */
  private[graft] def knPerDoc(s: SparkSession, d: String): DataFrame = {
    val big = docBigrams(s, d)
    val cb = big.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
    val cp = big.groupBy("prev").agg(count(lit(1)).as("cp"))
    val n1p = cb.groupBy("prev").agg(count(lit(1)).as("n1p"))
    val n1c = cb.groupBy("cur").agg(count(lit(1)).as("n1c"))
    val nt = cb.agg(count(lit(1)).as("ntypes"))
    big.groupBy("doc_id", "prev", "cur").agg(count(lit(1)).as("tf"))
      .join(cb, Seq("prev", "cur"))
      .join(cp, Seq("prev"))
      .join(n1p, Seq("prev"))
      .join(n1c, Seq("cur"))
      .crossJoin(broadcast(nt))
      .withColumn("p",
        (col("cb") - lit(0.75)) / col("cp")
          + (lit(0.75) * col("n1p") / col("cp"))
            * (col("n1c").cast("double") / col("ntypes")))
      .withColumn("lp", (col("tf") * log(col("p"))).cast("decimal(24,9)"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"), sum(col("lp")).as("sum_lp"))
  }

  /** [[ccnetBuckets]] cut by the BIGRAM LM score instead of the unigram
    * proxy — per-language terciles by mean bigram logprob, the closer
    * cousin of CCNet's perplexity bucketing. Same distributed-rank +
    * decimal aggregation discipline
    * ([[Ranks.perKeyRank]]/[[Ranks.ntileOfRank]] — no per-language
    * single-task sort); docs without bigram evidence (single-token
    * docs) carry no score and are outside the cut, as in
    * [[lmScoreBigram]].
    */
  def ccnetBucketsBigram(s: SparkSession, d: String): DataFrame = {
    val scored = lmBigramPerDoc(s, d)
      .withColumn("avg_logprob",
        col("sum_lp").cast("double") / col("n_bigrams"))
      .join(Tables.documents(s, d).select("doc_id", "lang"), "doc_id")
    val ranked = Ranks.perKeyRank(scored, "lang",
      Seq(col("avg_logprob").desc, col("doc_id")), "__rank")
    val nLang = ranked.groupBy("lang").agg(max("__rank").as("__n_lang"))
    ranked
      .join(broadcast(nLang), Seq("lang"))
      .withColumn("tile", Ranks.ntileOfRank("__rank", "__n_lang", 3))
      .withColumn("bucket",
        when(col("tile") === 1, "head")
          .when(col("tile") === 2, "middle")
          .otherwise("tail"))
      .groupBy("lang", "bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        sum(col("sum_lp")).as("sum_lp"))
      .select(col("lang"), col("bucket"), col("n_docs"),
        col("n_bigrams").cast(LongType).as("n_bigrams"),
        (col("sum_lp").cast("double") / col("n_bigrams").cast(LongType))
          .as("mean_logprob"))
      .orderBy("lang", "bucket")
  }

  /** Count-min-sketch term-frequency estimates for the exact top-k terms:
    * the third sketch family in the engine (HLL `approx_count_distinct`
    * for cardinality, BloomFilter for membership, CMS for frequency).
    * The sketch is built distributed (per-partition sketches merged by
    * counter addition — commutative, so the estimate is row-order
    * independent and deterministic for a fixed seed) and only the
    * O(depth/eps) counter table reaches the driver; candidates come from
    * the exact vocabulary pass. At 100 TB the candidate pass is the
    * same top-k aggregate and the sketch cost is one narrow scan.
    *
    * CMS guarantees (spec-verified): est ≥ true, and
    * est ≤ true + eps·T with probability ≥ confidence.
    */
  def topTermsCms(s: SparkSession, d: String, k: Int = 50,
      eps: Double = 0.001): DataFrame = {
    import s.implicits._
    val terms = Tables.documents(s, d)
      .select(explode(tokens(lower(col("text")))).as("term"))
    val sketch = terms.stat.countMinSketch(col("term"), eps, 0.99, 42)
    val candidates = topTerms(s, d, k).select("term").as[String]
      .collect() // k strings — the sketch query set, not data
    candidates.toSeq
      .map(t => (t, sketch.estimateCount(t)))
      .toDF("term", "tf_est")
      .orderBy(col("tf_est").desc, col("term"))
  }

  /** Cross-engine-verifiable form of the CMS contract (the
    * `r_approx_distinct_bound` precedent): sketch VALUES differ per
    * engine, but the sketch PROMISE — never undercount, overcount by at
    * most ~eps·T — holds in every implementation, so
    * (term, exact tf, within_bound) hash-compares against an exact
    * oracle. The overcount allowance is 10× the eps·T guarantee: slack
    * for the 1−δ confidence tail, still a real assertion (a broken
    * sketch is off by orders of magnitude, not fractions of a percent).
    */
  def topTermsCmsBound(s: SparkSession, d: String, k: Int = 50,
      eps: Double = 0.001): DataFrame = {
    import s.implicits._
    val terms = Tables.documents(s, d)
      .select(explode(tokens(lower(col("text")))).as("term"))
    val sketch = terms.stat.countMinSketch(col("term"), eps, 0.99, 42)
    val total = sketch.totalCount()
    val exact = topTerms(s, d, k).select("term", "tf").as[(String, Long)]
      .collect() // k (term, exact-tf) pairs — the sketch query set, not data
    exact.toSeq.map { case (t, tf) =>
      val est = sketch.estimateCount(t)
      (t, tf, est >= tf && est <= tf + math.ceil(eps * total * 10).toLong)
    }.toDF("term", "tf", "within_bound")
      .orderBy(col("tf").desc, col("term"))
  }

  /** Sharded CMS frequency ROLLUP (round 7 — the frequency member of
    * the mergeable-sketch family, completing HLL/theta/KLL): per-shard
    * (here per-language) `count_min_sketch` partials are UNIONED into
    * the corpus sketch by [[graft.functions.CmsUnion]] — the merge half
    * SQL lacks — so any coarser grouping derives from stored partials
    * without re-scanning rows. CMS union is elementwise counter
    * addition: the merged sketch is BIT-identical to the directly-built
    * corpus sketch under any sharding (spec-pinned) — the deterministic
    * end of the sketch spectrum. Driver surface is the
    * [[topTermsCmsBound]] contract over the MERGED sketch: exact top-k
    * term counts + the never-undercount / bounded-overcount flag.
    */
  def termFreqRollup(s: SparkSession, d: String, k: Int = 30,
      eps: Double = 0.001): DataFrame = {
    import s.implicits._
    import graft.functions.CmsUnion.cmsUnion
    val partials = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy("lang")
      .agg(expr(s"count_min_sketch(term, ${eps}D, 0.99D, 42)").as("cms"))
    val mergedBytes = partials.agg(cmsUnion(col("cms")).as("cms"))
      .collect()(0).getAs[Array[Byte]](0) // ONE sketch — O(depth·width)
    val sketch = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(mergedBytes))
    val total = sketch.totalCount()
    val exact = topTerms(s, d, k).select("term", "tf").as[(String, Long)]
      .collect() // k (term, exact-tf) pairs — the sketch query set
    exact.toSeq.map { case (t, tf) =>
      val est = sketch.estimateCount(t)
      (t, tf, est >= tf && est <= tf + math.ceil(eps * total * 10).toLong)
    }.toDF("term", "tf", "within_bound")
      .orderBy(col("tf").desc, col("term"))
  }

  /** Content fingerprint (md5 of normalized text) — md5 is identical across
    * engines, so this one is oracle-checkable; [[xxFingerprint]] is the
    * cheap 64-bit variant for engine-internal dedup at scale.
    */
  def md5Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat_ws(" ", tokens(lower(col("text"))))).as("fingerprint"))
      .orderBy("doc_id")

  /** 64-bit xxhash64 fingerprint of normalized text — codegen'd, 8 bytes of
    * state per doc; the form you'd actually carry through a 100 TB dedup.
    */
  def xxFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        xxhash64(concat_ws(" ", tokens(lower(col("text"))))).as("fingerprint"))
      .orderBy("doc_id")

  /** Quality-quantile gate: per language, keep the top `keepPct`% of
    * documents ranked by alpha ratio (desc, doc_id tiebreak) — the
    * calibrated-threshold filter a corpus pipeline runs instead of a fixed
    * cutoff (a fixed alpha threshold that keeps 80% of English drops 99%
    * of Chinese; per-stratum quantiles self-calibrate).
    *
    * Rank form (keep iff rank·100 ≤ n·pct, i.e. ⌊pct·n/100⌋ survivors per
    * language) is integer-exact and oracle-comparable. Ranks come from
    * the DISTRIBUTED per-language rank ([[Ranks.perKeyRank]] — no
    * single task sorts a whole language) and group sizes from a tiny
    * per-language count broadcast back, replacing the round-8 `weak`
    * single-key windows. The cheaper-still 100 TB reading (one
    * `percentile_approx(alpha, 1-pct/100)` threshold + stateless
    * filter, no rank surfaced) remains available when the caller
    * doesn't need `q_rank` — this form keeps the exact rank because it
    * IS the output contract.
    */
  def qualityGate(s: SparkSession, d: String, keepPct: Int = 60): DataFrame =
    qualityGateFrom(Tables.documents(s, d), keepPct)

  /** [[qualityGate]] over any (doc_id, text, lang) frame — the composable
    * stage the corpus pipeline inserts.
    */
  def qualityGateFrom(docs: DataFrame, keepPct: Int = 60): DataFrame = {
    val nAlpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
    val nChars = length(col("text")).cast(LongType)
    val scored = docs.select(col("doc_id"), col("lang"),
      (nAlpha.cast("double") / greatest(nChars, lit(1L))).as("alpha_ratio"))
    val ranked = Ranks.perKeyRank(scored, "lang",
      Seq(col("alpha_ratio").desc, col("doc_id")), "q_rank")
    // group size = max rank per language (O(languages) rows, read off
    // the checkpointed rank frame — no second scoring pass)
    val nLang = ranked.groupBy("lang").agg(max("q_rank").as("n_lang"))
    ranked.join(broadcast(nLang), Seq("lang"))
      .filter(col("q_rank") * 100 <= col("n_lang") * keepPct)
      .select("doc_id", "lang", "alpha_ratio", "q_rank")
      .orderBy("doc_id")
  }

  /** Temperature-weighted mixture sampling: per-language keep budgets
    * ∝ √(stratum size) (temperature τ = 0.5 — the standard flattening
    * between proportional τ=1 and uniform τ=0 when balancing a multilingual
    * corpus), applied via the same content-hash buckets as
    * [[trainTestSplit]]. All boundary arithmetic is integer: weights are
    * ⌊√n·10⁶⌋ (IEEE sqrt is correctly rounded, so every engine gets the
    * same integer), thresholds are one integer division — no float ever
    * reaches a comparison, so sampling is bit-reproducible anywhere.
    *
    * Scale shape: pass 1 is a tiny per-language count (broadcast back as a
    * join of a handful of rows); pass 2 is a stateless per-row hash filter.
    * No shuffle of the corpus itself.
    */
  def mixtureSample(s: SparkSession, d: String, budget: Long = 250)
      : DataFrame =
    mixtureSampleFrom(Tables.documents(s, d), budget)

  /** [[mixtureSample]] over any (doc_id, text, lang) frame. */
  def mixtureSampleFrom(docs: DataFrame, budget: Long): DataFrame = {
    val counts = docs.groupBy("lang")
      .agg(count(lit(1)).as("n_lang"))
      .withColumn("w", floor(sqrt(col("n_lang")) * 1e6).cast(LongType))
    val sumW = counts.agg(sum(col("w")).as("sum_w"))
    val thresholds = counts.crossJoin(sumW)
      // `div`, not `/`: Spark's `/` on longs is double true-division; the
      // boundary must be one exact integer division on both engines.
      .withColumn("thresh",
        least(lit(10000L),
          expr(s"(10000 * ${budget}L * w) div (sum_w * n_lang)")))
      .select("lang", "thresh")
    val bucket =
      contentBucket(10000)
    docs.select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .join(broadcast(thresholds), Seq("lang"))
      .filter(col("bucket") < col("thresh"))
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")
  }

  /** Gopher-style rule filter (Rae et al. 2021, "Scaling Language Models"
    * table A1 — the public rule set Dolma/RefinedWeb reuse): per-document
    * structural signals and one boolean per rule, plus the composite
    * `keep`. Surfaced per-rule (not just the conjunction) because a corpus
    * audit needs the rejection breakdown — which rule fires — before
    * committing to a filter at 100 TB.
    *
    * Signals (thresholds are the paper's):
    *  - word count ∈ [50, 100 000]
    *  - mean word length ∈ [3, 10]
    *  - symbol-to-word ratio (`#` / ellipsis) ≤ 0.1
    *  - lines starting with a bullet ≤ 90 %
    *  - lines ending in an ellipsis ≤ 30 %
    *  - words containing an alphabetic character ≥ 80 %
    *  - ≥ 2 distinct members of the 8-word stop list present
    *
    * All signals are one codegen'd pass over `text` (HOFs over the token /
    * line arrays — zero shuffle, embarrassingly parallel); ratios are
    * int-over-int double divisions (IEEE-exact, engine-reproducible).
    */
  def gopherRules(s: SparkSession, d: String): DataFrame =
    gopherRulesFrom(Tables.documents(s, d))

  /** [[gopherRules]] over any (doc_id, text) frame. */
  def gopherRulesFrom(docs: DataFrame): DataFrame = {
    // Single pass over `text`: the token and line arrays are materialized
    // ONCE in their own projection (multi-referenced non-cheap aliases keep
    // CollapseProject from inlining them into each consuming signal), and
    // every signal below reads the in-memory arrays. Stop-word presence is
    // one array_intersect against the stripped lowered tokens — a token
    // counts as a stop word when, lowercased and stripped of leading and
    // trailing non-letters, it equals a list member.
    val stopList = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val prepared = docs.select(
        col("doc_id"),
        col("text"),
        tokens(col("text")).as("_toks"),
        split(col("text"), "\n").as("_lines"))
      // derived from the materialized _toks so the tokenizing split runs
      // once per row, not once per consumer
      .withColumn("_ltoks", transform(col("_toks"),
        t => regexp_replace(lower(t), "^[^a-z]+|[^a-z]+$", "")))
    val toks = col("_toks")
    val lines = col("_lines")
    val nWords = size(toks).cast(LongType)
    // total token chars == length of the separator-less join (codegen'd,
    // no per-token interpreted aggregate)
    val sumWordLen = length(concat_ws("", toks)).cast(LongType)
    val nLines = size(lines).cast(LongType)
    val nBullet =
      size(filter(lines, l => trim(l).substr(lit(1), lit(1)).isin("-", "*", "•")))
        .cast(LongType)
    val nEllipsisEnd =
      size(filter(lines,
        l => rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
        .cast(LongType)
    val nAlphaWords = size(filter(toks, t => t.rlike("[A-Za-z]")))
      .cast(LongType)
    val nSymbols =
      size(regexp_extract_all(col("text"), lit("#|\\.\\.\\.|…"), lit(0)))
        .cast(LongType)
    // distinct stop-list PRESENCE (not occurrence count): one intersection
    // of the stripped lowered token array with the 8-word list — replaces
    // round-4's 8 separate lower-and-regex passes over the full text
    val nStopKinds =
      size(array_intersect(col("_ltoks"), array(stopList.map(lit): _*)))
        .cast(LongType)
    prepared.select(
        col("doc_id"),
        nWords.as("n_words"),
        (sumWordLen.cast("double") / greatest(nWords, lit(1L)))
          .as("mean_word_len"),
        (nSymbols.cast("double") / greatest(nWords, lit(1L)))
          .as("symbol_ratio"),
        (nBullet.cast("double") / greatest(nLines, lit(1L)))
          .as("bullet_line_ratio"),
        (nEllipsisEnd.cast("double") / greatest(nLines, lit(1L)))
          .as("ellipsis_line_ratio"),
        (nAlphaWords.cast("double") / greatest(nWords, lit(1L)))
          .as("alpha_word_ratio"),
        nStopKinds.as("n_stop_kinds"))
      .withColumn("rule_word_count",
        col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("rule_mean_word_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("rule_symbol_ratio", col("symbol_ratio") <= 0.1)
      .withColumn("rule_bullet_lines", col("bullet_line_ratio") <= 0.9)
      .withColumn("rule_ellipsis_lines", col("ellipsis_line_ratio") <= 0.3)
      .withColumn("rule_alpha_words", col("alpha_word_ratio") >= 0.8)
      .withColumn("rule_stop_words", col("n_stop_kinds") >= 2)
      .withColumn("keep",
        col("rule_word_count") && col("rule_mean_word_len") &&
        col("rule_symbol_ratio") && col("rule_bullet_lines") &&
        col("rule_ellipsis_lines") && col("rule_alpha_words") &&
        col("rule_stop_words"))
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): rank each
    * document by its unigram-LM score ([[lmScore]]) WITHIN its language
    * and cut the ranking into head / middle / tail terciles — the public
    * recipe for quality-stratifying a multilingual crawl before sampling.
    * Output is the per-(lang, bucket) profile: doc count, token mass, and
    * the bucket's TOKEN-WEIGHTED mean log-probability (total decimal
    * logprob mass over total tokens).
    *
    * Determinism: the per-doc score is the oracled [[lmScore]] double
    * (identical bit pattern on both engines), ordering ties break on
    * doc_id, and `ntile` places remainder docs in the earliest buckets on
    * every engine. The bucket mean sums the per-doc DECIMAL(24,9) logprob
    * mass ([[lmPerDoc]] — associative, safe under any partial-aggregate
    * merge order) and divides ONCE at the end; re-rounding the per-doc
    * double quotient through a decimal cast is deliberately avoided (a
    * near-midpoint double rounds differently across engines — measured).
    *
    * Scale: the LM pass is [[lmScore]]'s shape (term aggregate + one
    * broadcast total); the tercile cut is the DISTRIBUTED per-language
    * rank ([[Ranks.perKeyRank]]) plus NTILE's integer arithmetic on
    * (rank, n) ([[Ranks.ntileOfRank]]) — bit-identical buckets, and no
    * single task ever sorts a whole language (the round-8 `weak`
    * single-key-window shape this replaced). Output is O(languages)
    * rows.
    */
  def ccnetBuckets(s: SparkSession, d: String): DataFrame = {
    val scored = lmPerDoc(s, d)
      .withColumn("avg_logprob",
        col("sum_lp").cast("double") / col("n_tokens"))
      .join(Tables.documents(s, d).select("doc_id", "lang"), "doc_id")
    val ranked = Ranks.perKeyRank(scored, "lang",
      Seq(col("avg_logprob").desc, col("doc_id")), "__rank")
    // group size = max rank — re-reads the checkpointed rank frame
    // instead of re-running the LM scoring pass
    val nLang = ranked.groupBy("lang").agg(max("__rank").as("__n_lang"))
    ranked
      .join(broadcast(nLang), Seq("lang"))
      .withColumn("tile", Ranks.ntileOfRank("__rank", "__n_lang", 3))
      .withColumn("bucket",
        when(col("tile") === 1, "head")
          .when(col("tile") === 2, "middle")
          .otherwise("tail"))
      .groupBy("lang", "bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("sum_lp")).as("sum_lp"))
      .select(col("lang"), col("bucket"), col("n_docs"),
        col("n_tokens").cast(LongType).as("n_tokens"),
        (col("sum_lp").cast("double") / col("n_tokens").cast(LongType))
          .as("mean_logprob"))
      .orderBy("lang", "bucket")
  }

  /** C4-style line/page filter (Raffel et al. 2020, §2.2 — the public
    * recipe behind the C4 corpus). Line level: a line survives iff it ends
    * in terminal punctuation (`.` `!` `?` `"`), has ≥ 5 whitespace tokens,
    * and does not mention "javascript" (case-insensitive). Page level: a
    * document is kept iff at least one line survives, the surviving text
    * has ≥ 3 sentences (terminal-punctuation occurrences — the cheap
    * deterministic stand-in for C4's sentence splitter), and the raw page
    * contains neither "lorem ipsum" nor a curly brace.
    *
    * Same execution shape as [[gopherRulesFrom]]: the line array is
    * materialized once per row, every signal is a HOF over it, and the
    * whole operator is one stateless codegen'd pass — zero shuffle beyond
    * the presentation sort, embarrassingly parallel at any scale.
    */
  def c4Rules(s: SparkSession, d: String): DataFrame =
    c4RulesFrom(Tables.documents(s, d))

  /** [[c4Rules]] over any (doc_id, text) frame. */
  def c4RulesFrom(docs: DataFrame): DataFrame = {
    val prepared = docs.select(
        col("doc_id"), col("text"),
        split(col("text"), "\n").as("_lines"))
      .withColumn("_kept", filter(col("_lines"), l =>
        rtrim(l).rlike("[.!?\"]$") &&
          size(tokens(l)) >= 5 &&
          !lower(l).contains("javascript")))
      .withColumn("_clean", concat_ws("\n", col("_kept")))
    prepared.select(
        col("doc_id"),
        size(col("_lines")).cast(LongType).as("n_lines"),
        size(col("_kept")).cast(LongType).as("n_kept_lines"),
        length(col("_clean")).cast(LongType).as("clean_len"),
        size(regexp_extract_all(col("_clean"), lit("[.!?]"), lit(0)))
          .cast(LongType).as("n_sentences"),
        lower(col("text")).contains("lorem ipsum").as("has_lorem_ipsum"),
        col("text").contains("{").as("has_brace"))
      .withColumn("keep",
        col("n_kept_lines") >= 1 && col("n_sentences") >= 3 &&
          !col("has_lorem_ipsum") && !col("has_brace"))
      .orderBy("doc_id")
  }

  /** DSIR-style importance weight per document (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score each
    * raw document by how much more likely its tokens are under a TARGET
    * distribution than under the RAW corpus distribution. The target slice
    * is any row predicate — the registered query uses `lang = 'en'`, the
    * paper's canonical shape (select crawl data resembling a target
    * language/domain); both distributions are add-one-smoothed unigram LMs
    * over lowered whitespace tokens, sharing the raw vocabulary size V:
    * p(t) = (count(t) + 1) / (total + V). The per-doc weight is the mean
    * per-token log ratio ln(p_target/p_raw); `selected` = weight > 0 is
    * the row-local importance filter face (doc looks more target-like
    * than corpus-like) — the paper's Gumbel-top-k resampling consumes
    * these same weights with sampling noise, which an oracle cannot
    * reproduce, so the deterministic surface is the weight itself.
    *
    * Reproducibility (the [[lmScore]] discipline): the two smoothed
    * probabilities and their ratio are IEEE double arithmetic — identical
    * operation order on both engines, correctly-rounded ops, so the
    * doubles agree bit-for-bit except `ln`'s 1-ulp libm spread, which the
    * per-(doc, term) DECIMAL(24,9) rounding of tf·ln(ratio) absorbs; the
    * per-doc sum is then exact decimal addition (associative under any
    * partial-aggregate merge order) and the final quotient surfaces as
    * double once.
    *
    * Scale: two term aggregates (target counts are a semi-joined subset
    * of the same pass), one broadcast totals row, one term-keyed join
    * back to the doc-term table — [[tfidfTop]]'s shape. The paper's
    * hashed-n-gram feature space is a drop-in replacement for the term
    * string key (xxhash64 bucket instead of `term`) when the vocabulary
    * itself is too wide, trading collisions for a bounded feature table
    * — implemented as [[dsirWeightsHashed]].
    */
  def dsirWeights(s: SparkSession, d: String): DataFrame =
    dsirWeightsFrom(Tables.documents(s, d), col("lang") === "en")

  /** [[dsirWeights]] over any (doc_id, text, ...) frame with an arbitrary
    * target-slice predicate (evaluated against the frame's columns).
    */
  def dsirWeightsFrom(docs: DataFrame, targetPred: Column): DataFrame =
    dsirCore(
      docs.select(col("doc_id"),
          explode(tokens(lower(col("text")))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")),
      docs.filter(targetPred).select("doc_id"), "term")

  /** [[dsirWeights]] over a HASHED bounded vocabulary — the paper's
    * hashed-n-gram feature space (Xie et al. 2023 §3.1): the feature key
    * is `pmod(xxhash64(term), buckets)` instead of the term string, so
    * the two unigram LMs — and every term-keyed shuffle — are bounded by
    * `buckets` REGARDLESS of corpus vocabulary width (the open-vocab
    * exact form's term table grows with the corpus; at 100 TB web scale
    * that is billions of distinct tokens, most of them noise). Hash
    * collisions merge feature counts — the standard hashing-trick trade
    * (Weinberger et al. 2009): weights stay rank-correlated with the
    * exact form (spec-measured), smoothing dimension V becomes the
    * occupied-bucket count.
    *
    * `buckets` must be a power of two: the engine computes pmod over the
    * SIGNED xxhash64 while the DuckDB oracle mods the UNSIGNED u64 form —
    * the two agree exactly when the modulus divides 2⁶⁴.
    */
  def dsirWeightsHashed(s: SparkSession, d: String,
      buckets: Int = 65536): DataFrame =
    dsirWeightsHashedFrom(Tables.documents(s, d), col("lang") === "en",
      buckets)

  /** [[dsirWeightsHashed]] over any frame + target predicate. */
  def dsirWeightsHashedFrom(docs: DataFrame, targetPred: Column,
      buckets: Int = 65536): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two (signed pmod ≡ unsigned mod)")
    dsirCore(
      docs.select(col("doc_id"),
          explode(tokens(lower(col("text")))).as("term"))
        .select(col("doc_id"),
          pmod(xxhash64(col("term")), lit(buckets.toLong)).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")),
      docs.filter(targetPred).select("doc_id"), "term")
  }

  /** The DSIR arithmetic shared by the exact and hashed vocabularies:
    * `tf` = (doc_id, term, tf) with `term` either the token string or
    * its hash bucket. Target/raw add-one-smoothed LMs over the same key
    * space, per-(doc, term) DECIMAL(24,9) contributions, exact decimal
    * per-doc sums (the lmScore discipline — see [[dsirWeights]]).
    */
  private def dsirCore(tf: DataFrame, targetIds: DataFrame,
      key: String): DataFrame = {
    val rawCt = tf.groupBy(key).agg(sum(col("tf")).as("rct"))
    val tgtCt = tf.join(targetIds, Seq("doc_id"), "left_semi")
      .groupBy(key).agg(sum(col("tf")).as("tct"))
    val totals = rawCt
      .agg(sum(col("rct")).as("r_total"), count(lit(1)).as("v"))
      .crossJoin(tf.join(targetIds, Seq("doc_id"), "left_semi")
        .agg(coalesce(sum(col("tf")), lit(0L)).as("t_total")))
    val lratio = rawCt.join(tgtCt, Seq(key), "left")
      .crossJoin(broadcast(totals))
      .select(col(key),
        log(((coalesce(col("tct"), lit(0L)) + 1).cast("double")
            / (col("t_total") + col("v")).cast("double"))
          / ((col("rct") + 1).cast("double")
            / (col("r_total") + col("v")).cast("double"))).as("lratio"))
    tf.join(lratio, key)
      .withColumn("contrib",
        (col("tf") * col("lratio")).cast("decimal(24,9)"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"), sum(col("contrib")).as("sum_lr"))
      .select(col("doc_id"), col("n_tokens").cast(LongType).as("n_tokens"),
        (col("sum_lr").cast("double") / col("n_tokens").cast(LongType))
          .as("avg_log_ratio"))
      .withColumn("selected", col("avg_log_ratio") > 0.0)
      .orderBy("doc_id")
  }

  // ---------------------------------------------- tokenizer planning

  /** Per-language tokenizer fertility: subwords-per-word, the metric
    * that decides whether a tokenizer's budget is being spent evenly
    * across languages (fertility ≫ 1 for a language means its text costs
    * proportionally more context window). Words are whitespace tokens;
    * subwords are the BPE-ish pre-tokenizer proxy of [[subwordCount]].
    * One narrow per-doc pass + one groupBy(lang) shuffle of ~|langs|
    * groups; the ratio is a single long/long double division
    * (exactly rounded ⇒ engine-reproducible).
    */
  def fertility(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"),
        size(tokens(col("text"))).cast(LongType).as("w"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .cast(LongType).as("sw"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("sw")).as("n_subwords"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_subwords"),
        (col("n_subwords").cast("double")
          / greatest(col("n_words"), lit(1L))).as("fertility"))
      .orderBy("lang")

  /** UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): distribute a token budget across
    * languages so every language gets an equal share UNLESS that share
    * would exceed `maxEpochs` passes over its available tokens — capped
    * languages yield their surplus to the rest. The sequential waterfall
    * (ascending capacity; each language takes
    * `min(cap, ⌊remaining/langs_left⌋)`) runs inside ONE
    * `aggregate()` higher-order fold over the per-language array — the
    * language table is bounded (the paper's own corpus has ~100 rows),
    * so the single-row collect_list is engine-side bounded state, never
    * a driver loop. Budget defaults to half the corpus's total tokens
    * (integer division) so the operator is closed over its input at any
    * scale. All arithmetic is integer except the fair-share division,
    * a long/int double division + floor — exactly rounded, so the
    * waterfall is engine-exact step by step.
    */
  def unimaxBudget(s: SparkSession, d: String, maxEpochs: Int = 4)
      : DataFrame = {
    val perLang = Tables.documents(s, d)
      .select(col("lang"), size(tokens(col("text"))).cast(LongType).as("w"))
      .groupBy("lang").agg(sum(col("w")).as("toks"))
    val one = perLang.agg(
      sort_array(collect_list(struct(
        (col("toks") * maxEpochs).as("cap"), col("lang"),
        col("toks")))).as("arr"),
      sum(col("toks")).as("total"))
    val folded = one
      .withColumn("budget", expr("total div 2"))
      .withColumn("nl", size(col("arr")))
      .withColumn("res", aggregate(
        col("arr"),
        struct(col("budget").as("rem"), lit(0).as("i"),
          array().cast(
            "array<struct<lang:string,toks:bigint,cap:bigint,alloc:bigint>>")
            .as("out")),
        (acc, x) => {
          val share = floor(acc("rem") / (col("nl") - acc("i"))).cast("long")
          val alloc = least(x("cap"), share)
          struct((acc("rem") - alloc).as("rem"), (acc("i") + 1).as("i"),
            concat(acc("out"), array(struct(
              x("lang").as("lang"), x("toks").as("toks"),
              x("cap").as("cap"), alloc.as("alloc")))).as("out"))
        }))
    folded.select(explode(col("res")("out")).as("r"))
      .select(col("r.lang").as("lang"), col("r.toks").as("n_tokens"),
        col("r.cap").as("cap"), col("r.alloc").as("alloc"),
        when(col("r.toks") > 0, col("r.alloc") / col("r.toks"))
          .otherwise(lit(0.0)).as("epochs"))
      .orderBy("lang")
  }

  /** Deterministic weighted sampling — the Efraimidis–Spirakis (2006)
    * weighted-reservoir shape with the uniform random key replaced by a
    * content-derived integer bucket, so the draw is engine-exact,
    * duplicate-consistent, and rerun-stable (no engine RNG). Each
    * document's priority is `(bucket · 10⁶) div weight`; heavier
    * documents (more tokens) get proportionally smaller priorities and
    * therefore higher selection odds. Smallest-k priorities win, doc_id
    * breaks ties.
    *
    * Scale shape: stateless per-row scoring, then ONE top-k reduction
    * (`TakeOrderedAndProject`: per-partition bounded heaps merged on the
    * driver, k rows total) — no global sort, no shuffle of the corpus.
    */
  def weightedSample(s: SparkSession, d: String, k: Int = 100): DataFrame =
    weightedSampleFrom(Tables.documents(s, d), k)

  /** [[weightedSample]] over any (doc_id, text) frame. */
  def weightedSampleFrom(docs: DataFrame, k: Int): DataFrame =
    docs.select(
        col("doc_id"),
        greatest(size(tokens(col("text"))).cast(LongType), lit(1L))
          .as("weight"),
        contentBucket(10000).as("bucket"))
      // `div`, not `/`: the priority must be one exact integer division
      // on both engines (long `/` is double true-division in Spark SQL).
      .withColumn("priority", expr("(bucket * 1000000) div weight"))
      .select("doc_id", "weight", "priority")
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)

  /** Curriculum ordering (Bengio et al. 2009): schedule documents easy →
    * hard, shuffled within each phase. Difficulty proxy is document
    * length; the phase cutoffs are the exact p25/p50/p75 lengths from
    * ONE [[graft.functions.ExactQuantiles]] aggregation (count-map
    * state) — NOT a global `ntile` window, which would serialize the
    * corpus through a single task at 100 TB. Phase assignment is then a
    * broadcast of 3 numbers + a stateless comparison. Within a phase the
    * order is a content-hash shuffle sharded 8 ways, so each
    * `row_number` window sorts only its (phase, shard) slice — at scale
    * shards are sized to executor memory and the windows stay parallel.
    */
  def curriculum(s: SparkSession, d: String, shards: Int = 8): DataFrame = {
    import graft.functions.ExactQuantiles.exactQuantiles
    val docs = Tables.documents(s, d)
    val cuts = docs.agg(
        exactQuantiles(col("n_chars"), Seq(25, 50, 75), 100).as("qs"))
      .select(col("qs").getItem(0).as("c25"),
        col("qs").getItem(1).as("c50"), col("qs").getItem(2).as("c75"))
    // full-width hash (shard = bucket % shards below) — the same
    // contentBucket formula, unreduced
    val bucket = contentBucket(Long.MaxValue)
    val phased = docs
      .select(col("doc_id"), col("n_chars"), bucket.as("bucket"))
      .crossJoin(broadcast(cuts))
      .withColumn("phase",
        lit(1) + when(col("n_chars") > col("c25"), 1).otherwise(0)
          + when(col("n_chars") > col("c50"), 1).otherwise(0)
          + when(col("n_chars") > col("c75"), 1).otherwise(0))
      .withColumn("shard", (col("bucket") % shards).cast("int"))
    phased
      .withColumn("ord", row_number().over(
        Window.partitionBy("phase", "shard")
          .orderBy(col("bucket"), col("doc_id"))))
      .select("doc_id", "phase", "shard", "ord")
      .orderBy("phase", "shard", "ord")
  }

  /** Feature-hashed document embedding (the hashing trick — Weinberger
    * et al. 2009; fastText's input layer): tokens hash into `dims`
    * signed buckets, giving every document a deterministic sparse
    * bag-of-words vector with no trained vocabulary — the text→vector
    * bridge that feeds the embedding-side dedup/ANN family when no
    * model is in the loop. Output is the SPARSE form, one row per
    * non-zero dimension (exact sign cancellations drop; empty docs emit
    * nothing), plus the L2-normalized coordinate so downstream cosine
    * is a plain dot product.
    *
    * Engine-exact: integer bucket/sign from md5, integer counts, and a
    * norm built from an integer sum of squares (one correctly-rounded
    * sqrt + one exact division — no order-sensitive double sums).
    * Scale: one explode + one (doc, dim)-keyed shuffle of MAP-SIDE
    * COMBINED partials (≤ dims rows per doc cross the wire, not the
    * token stream), then the norm window's doc-keyed shuffle of those
    * same ≤ dims-per-doc sparse rows — deliberately NOT a pre-
    * `repartition(doc_id)`, which would save that tiny second exchange
    * by shuffling every raw token instead.
    */
  def hashEmbedding(s: SparkSession, d: String, dims: Int = 64)
      : DataFrame = {
    val tkMd5 = md5(col("tk"))
    val sparse = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("tk"))
      .select(col("doc_id"),
        pmod(conv(substring(tkMd5, 1, 4), 16, 10).cast(LongType),
          lit(dims.toLong)).as("dim"),
        when(conv(substring(tkMd5, 5, 1), 16, 10).cast(LongType) % 2 === 0,
          1L).otherwise(-1L).as("sgn"))
      .groupBy("doc_id", "dim")
      .agg(sum(col("sgn")).as("value"))
      .filter(col("value") =!= 0)
    val w = Window.partitionBy("doc_id")
    sparse
      .withColumn("unit_value",
        col("value").cast("double") /
          sqrt(sum(col("value") * col("value")).over(w).cast("double")))
      .orderBy("doc_id", "dim")
  }

  /** Hashed linear quality classifier — the fastText shape (Joulin et
    * al. 2017) used as the model-based filter stage of CCNet/LLaMA-style
    * corpus pipelines. Each token hashes into a 16-bit feature space;
    * the feature's weight is a deterministic pseudo-weight in
    * [-100, 100] derived from the token hash (a stand-in for trained
    * weights — the feature hashing, scoring, and gating plumbing are the
    * real contract). Score = mean token weight, keep = score > 0.
    *
    * One `aggregate` HOF pass over the token array per row — no explode,
    * no shuffle, stays inside whole-stage codegen. All-integer sums plus
    * one exactly-rounded final division ⇒ engine-reproducible.
    */
  def classifierScore(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(lower(col("text")))
    val raw = aggregate(toks, lit(0L), (acc, t) =>
      acc + (conv(substring(md5(t), 1, 4), 16, 10).cast(LongType)
        % 201L - 100L))
    Tables.documents(s, d).select(
        col("doc_id"),
        size(toks).cast(LongType).as("n_tokens"),
        raw.as("raw_score"))
      .withColumn("score",
        col("raw_score").cast("double") /
          greatest(col("n_tokens"), lit(1L)))
      .withColumn("keep", col("score") > 0)
      .orderBy("doc_id")
  }

  /** Per-language Gini coefficient of token mass across documents — the
    * corpus-balance inequality number on the datasheet page next to
    * [[zipfFit]]: G ≈ 0 means documents contribute evenly, G → 1 means
    * a few giant documents carry the language. Uses the rank identity
    * G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over ascending-sorted token
    * counts, which is invariant under tie order (equal x share one
    * value, so permuting their ranks leaves Σ i·xᵢ unchanged) — the
    * (x, doc_id) sort makes the assignment engine-identical anyway.
    *
    * Exactness: token counts, ranks, and all three sums are BIGINT —
    * integer end to end; the final G is one int→double division pair.
    * Scale: one row-local token count, then a DISTRIBUTED per-language
    * rank ([[Ranks.perKeyRank]] — range-partitioned sort + offset
    * cumsum), so no single task ever sorts a whole language (the
    * round-8 `weak` single-key-window shape this replaced). Ranks are
    * bit-identical to the window form.
    */
  def giniTokens(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast(LongType).as("x"))
    val ranked = Ranks.perKeyRank(per, "lang",
      Seq(col("x"), col("doc_id")), "i")
    ranked.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("x")).as("total_tokens"),
        sum(col("i") * col("x")).as("swx"))
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        when(col("total_tokens") > 0,
          (lit(2) * col("swx") - (col("n_docs") + 1) * col("total_tokens"))
            .cast("double")
            / (col("n_docs") * col("total_tokens")).cast("double"))
          .as("gini"))
      .orderBy("lang")
  }

  /** Kolmogorov–Smirnov drift check between the [[trainTestSplit]]
    * halves on the token-count distribution: D = max over observed
    * values of |F_train(v) − F_test(v)|, plus the value attaining it —
    * the standard "did my split (or yesterday's corpus) drift?"
    * two-sample test statistic. A content-hash split should show tiny
    * D; a large D flags a skewed split or a shifted ingest.
    *
    * Exactness: per-value counts and running totals are BIGINT window
    * sums (integer addition — associative, so DuckDB's segment-tree
    * window evaluation agrees bit-for-bit); each ECDF is ONE int/int
    * division, the gap one subtraction, and the argmax row is picked
    * by (gap DESC, value) so double ties break on the integer value.
    * Scale: one row-local pass to (split, n_tokens), a distinct-value-
    * sized cumulative frame after — the fact table is never sorted,
    * only the value domain (bounded by max doc length).
    */
  def ksSplitDrift(s: SparkSession, d: String, testPct: Int = 10): DataFrame = {
    val per = Tables.documents(s, d).select(
      size(tokens(col("text"))).cast(LongType).as("v"),
      when(contentBucket(100) < testPct, lit("test"))
        .otherwise(lit("train")).as("split"))
    val byVal = per.groupBy("v").agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("a"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("b"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ecdf = byVal
      .withColumn("ca", sum(col("a")).over(cum))
      .withColumn("cb", sum(col("b")).over(cum))
      .withColumn("na", sum(col("a")).over(tot))
      .withColumn("nb", sum(col("b")).over(tot))
      .withColumn("gap", abs(col("ca").cast("double") / col("na")
        - col("cb").cast("double") / col("nb")))
    ecdf.withColumn("rn", row_number().over(
        Window.orderBy(col("gap").desc, col("v"))))
      .filter(col("rn") === 1)
      .select(col("na").as("n_train"), col("nb").as("n_test"),
        col("gap").as("ks_stat"), col("v").as("ks_at_value"))
  }

  /** χ² test of independence between language and document-length
    * bucket (short <200 / medium <400 / long chars) — the datasheet
    * check for "does one language systematically contribute shorter
    * documents?" (a skew that biases token budgets computed from doc
    * counts). Emits the full contingency diagnostics per cell —
    * observed, expected under independence, the (o−e)²/e contribution
    * — plus the χ² total on every row.
    *
    * Determinism: observed and margin counts are BIGINT; each
    * expected value is one int·int/int double division; each
    * contribution is a short scalar double chain quantized onto
    * DECIMAL(24,9) (the [[zipfFit]] discipline) so the cross-cell χ²
    * total is an associative decimal sum. Scale: one fact-sized
    * (lang, bucket) aggregate; margins and cells are
    * |langs|·3-bounded.
    */
  def chisqLangLength(s: SparkSession, d: String): DataFrame = {
    val bucketed = Tables.documents(s, d)
      .select(col("lang"),
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 400, "medium")
          .otherwise("long").as("bucket"))
    val counted = bucketed.groupBy("lang", "bucket")
      .agg(count(lit(1)).as("obs"))
    val rowTot = counted.groupBy("lang").agg(sum("obs").as("rt"))
    val colTot = counted.groupBy("bucket").agg(sum("obs").as("ct"))
    val tot = counted.agg(sum("obs").as("n"))
    // the full R×C grid — zero-observed cells still contribute e
    val grid = rowTot.select(col("lang")).crossJoin(
      colTot.select(col("bucket")))
    val cells = grid.join(counted, Seq("lang", "bucket"), "left")
      .withColumn("observed", coalesce(col("obs"), lit(0L))).drop("obs")
    val terms = cells
      .join(broadcast(rowTot), Seq("lang"))
      .join(broadcast(colTot), Seq("bucket"))
      .crossJoin(broadcast(tot))
      .withColumn("expected",
        (col("rt") * col("ct")).cast("double") / col("n"))
      .withColumn("contrib_dec",
        ((col("observed") - col("expected"))
          * (col("observed") - col("expected")) / col("expected"))
          .cast("decimal(24,9)"))
    terms.withColumn("chi2",
        sum(col("contrib_dec")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
          .cast("double"))
      .select(col("lang"), col("bucket"), col("observed"),
        col("expected"), col("contrib_dec").cast("double").as("contrib"),
        col("chi2"))
      .orderBy("lang", "bucket")
  }

  /** RAKE's stopword delimiter set — [[qualityScore]]'s English
    * function-word list as a Seq, shared verbatim with the oracle SQL
    * (the [[lexicon]] interpolation pattern).
    */
  val rakeStops: Seq[String] =
    Seq("the", "a", "of", "to", "in", "and", "is", "it", "that", "for")

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic keyword
    * extraction from individual documents"): candidate phrases are
    * maximal runs of non-stopword tokens (capped at `maxLen` words);
    * each member word scores deg(w)/freq(w) where deg counts
    * co-occurring phrase slots and freq the occurrences; a phrase
    * scores the sum of its members — the document-set keyword list
    * next to [[textRank]]'s graph-ranked terms, at a fraction of the
    * cost (no iteration).
    *
    * Exactness: phrase segmentation is the gaps-and-islands identity
    * (pos − row_number per doc — integer, total order); deg/freq are
    * integer sums; each word score is ONE int/int double division
    * quantized onto DECIMAL(24,12), so the ≤ maxLen-term phrase sums
    * are associative decimal adds; the top-k order (score desc,
    * phrase) is total. Scale: one explode, ONE doc-bounded window
    * (per-doc groups — the plain window's home turf), then everything
    * is keyed by word or phrase (vocabulary-sized aggregates with
    * map-side combine); no data-sized window, no self-join.
    */
  def rakeKeywords(s: SparkSession, d: String, k: Int = 25,
      maxLen: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(tokens(lower(col("text")))).as(Seq("pos", "w")))
    val isl = tok.filter(!col("w").isInCollection(rakeStops))
      .withColumn("isl", col("pos") - row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")))
    val ph = isl.groupBy("doc_id", "isl")
      .agg(expr("transform(sort_array(collect_list(struct(pos, w))), " +
        "t -> t.w)").as("ws"))
      .filter(size(col("ws")) <= maxLen)
      .select(array_join(col("ws"), " ").as("phrase"), col("ws"))
      .localCheckpoint() // feeds word stats, occurrences, AND members
    val wsc = ph.select(explode(col("ws")).as("w"),
        size(col("ws")).cast("long").as("len"))
      .groupBy("w")
      .agg(sum(col("len")).as("deg"), count(lit(1)).as("freq"))
      .select(col("w"),
        (col("deg").cast("double") / col("freq").cast("double"))
          .cast("decimal(24,12)").as("score"))
    val occ = ph.groupBy("phrase").agg(count(lit(1)).as("n_occurrences"))
    val psc = ph.select(col("phrase"), col("ws")).distinct()
      .select(col("phrase"), explode(col("ws")).as("w"))
      .join(wsc, Seq("w"))
      .groupBy("phrase").agg(sum(col("score")).as("sc"))
    occ.join(psc, Seq("phrase"))
      .select(col("phrase"), col("n_occurrences"),
        col("sc").cast("double").as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(k)
  }

  /** Burrows' Delta (Burrows 2002, "'Delta': a measure of stylistic
    * difference") between document SOURCES: z-score each source's
    * relative frequency of the corpus's top-`m` terms against the
    * cross-source mean/std, then Delta(a, b) = mean |z_a − z_b| over
    * those terms — the stylometric distance matrix provenance audits
    * read ("are src3 and src7 the same scraper?"). Low Delta = the two
    * sources use the function-word profile identically.
    *
    * Exactness: relative frequencies are int/int double divisions
    * quantized onto DECIMAL(24,12) (the [[EventOps.userEntropy]]-family
    * grain);
    * per-term moments are exact decimal sums over the sources grid;
    * mean/variance/σ/z are then scalar double ops (IEEE-determinate on
    * identical inputs in both engines); each |z_a − z_b| is re-quantized
    * before the per-pair decimal sum. Terms with σ = 0 (identical share
    * everywhere) carry no signal and are excluded by both engines.
    * Scale: two fact-sized aggregates (corpus term counts; per-(source,
    * term) counts against a broadcast top-`m` list), then everything
    * lives on the sources × top-terms grid — bounded by |sources|·m,
    * never corpus-sized. The grid completion is a |sources| × m
    * cross join (lint-whitelisted bounded domain, the
    * [[chisqLangLength]] precedent).
    */
  def burrowsDelta(s: SparkSession, d: String, m: Int = 30): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(tokens(lower(col("text")))).as("term"))
      .localCheckpoint() // feeds the top-term AND the per-source aggregates
    val top = tok.groupBy("term").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term")).limit(m)
      .select("term")
    val ns = tok.groupBy("source").agg(count(lit(1)).as("n_s"))
    val cnt = tok.join(broadcast(top), Seq("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
    // dense grid: a source missing a top term has share 0 (its z-score
    // is −μ/σ, not 0 — the zero rows carry real signal)
    val grid = ns.select("source").crossJoin(broadcast(top))
    val f = grid.join(cnt, Seq("source", "term"), "left")
      .join(broadcast(ns), Seq("source"))
      .select(col("source"), col("term"),
        (coalesce(col("c"), lit(0L)).cast("double")
          / col("n_s").cast("double")).cast("decimal(24,12)").as("fq"))
      .localCheckpoint() // grid-sized; feeds the moments AND the z rows
    // f² rides the SAME 1e-12 grain as f: a finer scale (e.g. 24) would
    // be exact in Spark's BigDecimal→double but NOT in DuckDB, whose
    // int128 decimal→double conversion divides by a 10^scale double
    // that is itself inexact past 10^22 — measured as a 1-unit z
    // rounding flip. At scale 12 every sum's integer payload stays
    // under 2^53, so both engines' double conversions are exact.
    val stats = f.groupBy("term")
      .agg(sum(col("fq")).as("sf"),
        sum((col("fq").cast("double") * col("fq").cast("double"))
          .cast("decimal(24,12)")).as("sf2"),
        count(lit(1)).as("k"))
      .select(col("term"),
        (col("sf").cast("double") / col("k").cast("double")).as("mu"),
        (col("sf2").cast("double") / col("k").cast("double")
          - (col("sf").cast("double") / col("k").cast("double"))
            * (col("sf").cast("double") / col("k").cast("double")))
          .as("vr"))
      // the var > 0 guard runs BEFORE sqrt: a float-cancellation
      // negative epsilon must be filtered as a double, never reach
      // sqrt (NaN casts to decimal differently across engines)
      .filter(col("vr") > 0)
      .select(col("term"), col("mu"), sqrt(col("vr")).as("sigma"))
    val z = f.join(broadcast(stats), Seq("term"))
      .select(col("source"), col("term"),
        ((col("fq").cast("double") - col("mu")) / col("sigma"))
          .cast("decimal(24,12)").as("z"))
    z.as("a").join(z.as("b"),
        col("a.term") === col("b.term")
          && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_terms"),
        sum(abs(col("a.z") - col("b.z"))).as("sd"))
      .select(col("source_a"), col("source_b"), col("n_terms"),
        (col("sd").cast("double") / col("n_terms").cast("double"))
          .as("delta"))
      .orderBy("source_a", "source_b")
  }
}
