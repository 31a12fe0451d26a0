package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Deduplication operators for a training-data pipeline, over `documents`.
  *
  * Four families, in increasing fuzziness:
  *   1. exact       — hash-groupBy on content (one shuffle, deterministic
  *                    keep-lowest-id survivor)
  *   2. n-gram Jaccard — shingle-inverted-index join; exact set overlap,
  *                    integer arithmetic only (oracle-reproducible)
  *   3. MinHash+LSH — signature bands → bucket join → verify; the 100 TB
  *                    path (candidates ∝ true-dup density, never O(n²))
  *   4. SimHash     — 64-bit fingerprint, banded Hamming candidates
  *
  * Scale notes: every candidate generator here is join/groupBy-shaped (no
  * cross join anywhere). Stop-shingles (shingles shared by more than
  * `maxShingleDf` docs) are dropped before the inverted-index self-join —
  * on web-scale corpora boilerplate shingles otherwise produce quadratic
  * candidate blowup on a single hot key (classic skew).
  */
object DedupOps {

  // ---------------------------------------------------------------- exact

  /** Exact dedup on normalized text: groupBy content hash, keep the lowest
    * doc_id (deterministic, unlike `dropDuplicates`' keep-any). Output is
    * the survivor set with its duplicate count.
    */
  def exactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat_ws(" ", TextOps.tokens(lower(col("text"))))).as("content_hash"))
      .groupBy("content_hash")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")

  /** `dropDuplicates`-shaped variant made deterministic: keep the first row
    * per key by explicit ordering (window rank), matching `CLEAN:73`'s
    * subset-dedup semantics without its keep-any nondeterminism.
    */
  def keepFirstByKey(df: DataFrame, key: Seq[String], order: String): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(col(order))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ------------------------------------------------------------- shingles

  /** `n`-word shingles of `text` as an array column (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(lower(text))
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** (doc_id, h) — 64-bit hashed distinct shingles per doc, staged so each
    * array is materialized once per row (token hashes as a bound attribute;
    * inlining them into the shingle transform would rehash every token per
    * shingle position). Long shingles make every downstream shuffle,
    * collect_set, and array_intersect ~10× cheaper than 20-char strings;
    * the (doc_a, doc_b, shared, sizes) output is invariant to the
    * injective relabeling (64-bit collision odds at corpus scale: ~2^-64 ·
    * |shingles|², negligible).
    */
  private def hashedShingles(s: SparkSession, d: String, n: Int): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.ShingleHashes.shingleHashes(
          TextOps.tokens(lower(col("text"))), n).as("shs"))
      .select(col("doc_id"), explode(col("shs")).as("h"))
      // Materialized once per session (plan-canonical cache hit): the pair
      // generator, the size aggregate, and the MinHash signature all
      // re-derive from this index — without the cache each one would
      // re-tokenize the corpus (the dominant cost, measured). The 100 TB
      // equivalent is checkpointing the index to parquet between stages.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Inverted index: shingle-hash → list of docs containing it, keeping
    * only shingles with 2..maxShingleDf docs (singletons can't form pairs;
    * hotter-than-maxShingleDf shingles are boilerplate with no
    * discriminating power and would cause quadratic candidate blowup —
    * the classic skew guard).
    */
  private def invertedIndex(s: SparkSession, d: String, n: Int,
      maxShingleDf: Int): DataFrame =
    hashedShingles(s, d, n)
      .groupBy("h").agg(collect_list("doc_id").as("docs"))
      .filter(size(col("docs")).between(2, maxShingleDf))

  /** Near-duplicate pairs by exact n-gram Jaccard ≥ thresholdPct/100.
    *
    * Inverted-index self-join (pairs only materialize for docs sharing a
    * shingle), then exact |A∩B| / |A∪B| in pure integer arithmetic:
    * `100·shared ≥ pct·(|A|+|B|−shared)` — no floating point, so any SQL
    * engine reproduces it bit-for-bit.
    */
  def ngramJaccardPairs(s: SparkSession, d: String, n: Int = 3,
      thresholdPct: Int = 60, maxShingleDf: Int = 1000): DataFrame = {
    // Pairs come straight out of the inverted index (the doc list of each
    // shingle is already co-located after the by-shingle shuffle — a double
    // explode generates the pairs with NO self-join shuffle). Sizes are the
    // full distinct-shingle counts; the numerator necessarily equals the
    // true |A∩B| restricted to pair-forming shingles (singletons can't
    // intersect; hot shingles are excluded by design — skew guard).
    // SEMANTIC NOTE: on a corpus that actually contains shingles hotter
    // than maxShingleDf, this Jaccard is therefore a lower bound (hot
    // overlap excluded from the numerator but not the denominators),
    // while minhashLshPairs verifies with full-set Jaccard — the two can
    // disagree near the threshold on boilerplate-heavy pairs. That skew
    // guard is deliberate; lower maxShingleDf consciously.
    val pairs = invertedIndex(s, d, n, maxShingleDf)
      .select(explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    val sizes = hashedShingles(s, d, n)
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
    pairs
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"),
        col("sz").as("size_a"))), Seq("doc_a"))
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"),
        col("sz").as("size_b"))), Seq("doc_b"))
      .filter(col("shared") * 100 >=
        lit(thresholdPct) * (col("size_a") + col("size_b") - col("shared")))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        col("size_a"), col("size_b"))
      .orderBy("doc_a", "doc_b")
  }

  // -------------------------------------------------------------- minhash

  /** xorshift64 mixer as pure Column ops (shifts + xor only — no multiply,
    * so ANSI overflow checking never trips). Good enough dispersion for
    * MinHash band bucketing.
    */
  def xorshift64(c: Column): Column = {
    val a = c.bitwiseXOR(shiftleft(c, 13))
    val b = a.bitwiseXOR(shiftright(a, 7))
    b.bitwiseXOR(shiftleft(b, 17))
  }

  /** Deterministic per-permutation seeds (splitmix64 constants). */
  private def seeds(numHashes: Int): Seq[Long] = {
    var x = 0x9E3779B97F4A7C15L
    (0 until numHashes).map { _ =>
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** MinHash+LSH near-dup pairs: per-permutation min-hashes → band hashes →
    * bucket join on (band, hash) → exact Jaccard verification of candidates.
    *
    * Shape note (the hard-won one): the signature is computed in FLAT form
    * — explode shingles once, then ONE hash-aggregate with `numHashes`
    * `min` expressions over plain long columns — not as nested
    * array-lambda expressions. An earlier array-HOF formulation
    * (array_min∘transform per permutation, re-sliced per band) made
    * Catalyst inline the whole tokenize→shingle→hash pipeline into every
    * consumer: ~1000× per-row expression blowup, 69 s for 500 docs. The
    * flat form runs the same logical algorithm in one narrow pass + one
    * doc-keyed shuffle that also carries the shingle set and size for the
    * verify step — everything downstream reads cheap attributes.
    *
    * This is the 100 TB dedup shape: candidate count scales with true
    * duplicate density (docs only meet if a full band matches), and the
    * final verify only touches candidate pairs.
    */
  def minhashLshPairs(s: SparkSession, d: String, n: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      thresholdPct: Int = 60): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val idx = hashedShingles(s, d, n)
    // one shuffle: signature mins + shingle-hash set + set size per doc
    val minAggs = seeds(numHashes).zipWithIndex.map { case (seed, i) =>
      min(xorshift64(col("h").bitwiseXOR(lit(seed)))).as(s"m$i")
    }
    val aggs = minAggs ++ Seq(collect_set("h").as("sh"),
      count(lit(1)).as("sz"))
    val sigs = idx.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      // referenced three times (both band-join sides + the verify step);
      // materialize once — this is the dedup-state table at scale
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(col("doc_id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(array((0 until rows).map(r =>
            col(s"m${b * rows + r}")): _*))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val cand = banded.as("x")
      .join(banded.as("y"), Seq("band", "band_hash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard over the carried shingle sets
    val sets = sigs.select(col("doc_id"), col("sh"), col("sz"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("sz").as("size_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("sz").as("size_b")), Seq("doc_b"))
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))).cast(LongType))
      .filter(col("shared") * 100 >=
        lit(thresholdPct) * (col("size_a") + col("size_b") - col("shared")))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        col("size_a"), col("size_b"))
      .orderBy("doc_a", "doc_b")
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash fingerprint per document: per-token xxhash64, ±1 vote
    * per bit position, sign → bit. Explode + one groupBy (keyed by doc_id,
    * well-distributed); 64 sum aggregates fuse into a single hash-agg pass.
    */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        explode_outer(TextOps.tokens(lower(col("text")))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    // guard on the token, not the hash: xxhash64 is null-intolerant in the
    // "hash of NULL is the seed" sense (never returns NULL), so a
    // null-token row from explode_outer must be excluded by t itself or an
    // empty doc would vote as if it contained one token with hash 42.
    val votes = (0 until 64).map { i =>
      sum(when(col("t").isNull, 0)
        .when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val bits = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        bits.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs: band the 64-bit fingerprint into 4×16-bit
    * chunks (pigeonhole: any pair within Hamming distance 3 shares at least
    * one exact chunk), bucket-join, verify with `bit_count(a^b) <= maxHamming`.
    */
  def simhashPairs(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    val fp = simhash(s, d)
    val banded = fp.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
    banded.as("x").join(banded.as("y"), Seq("band", "chunk"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }
}
