package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, SimilarityOps}

/** Order-of-magnitude banding guards (the sf1 run): candidate COUNTS —
  * not wall-clock — measured on the sf0.1 corpus vs a 10× corpus built
  * from it, validating which generators stay linear and where the
  * fixed-bucket birthday term bites.
  *
  * 10× construction (docs): ten DISJOINT replicas — replica r prefixes
  * every token with `r<r>q`, an injective relabeling of the shingle
  * space, so each replica reproduces the base corpus's dup structure
  * exactly and shares nothing across replicas. A linear banded generator
  * must therefore produce ~10× the candidates; a quadratic one ~100×.
  *
  * 10× construction (embeddings): replica r multiplies every vector
  * element-wise by a deterministic ±1 pattern s_r. Within a replica this
  * is an isometry (⟨s∘a, s∘b⟩ = ⟨a, b⟩ — angles, hence LSH collision
  * probabilities, preserved); across replicas the sign patterns
  * decorrelate the dot products.
  *
  * Measured guard rows (this VM, committed for round-over-round diff —
  * SCALE.md §Banding at 10× quotes them):
  *   ngram_postings      ~10×    (disjoint shingle spaces: exact)
  *   minhash_bands       ~10×    (64-bit band hashes don't chance-collide)
  *   simhash_bands_16    ~17×    (4×16-bit chunks saturating: 2^16
  *                                buckets at 5·10⁴ docs — documented)
  *   simhash_bands_32    ~14×    (2×32-bit chunks: linear + the
  *                                zero-fingerprint bucket tail; covers
  *                                Hamming ≤ 1 — radius traded for scale)
  *   hyperplane_bands_8  37 381 → 3 696 786 (99×: 2^8 buckets saturated)
  *   hyperplane_bands_16    125 →    12 315 (birthday-dominated but 300×
  *                                           lower volume)
  *   hyperplane_bands_32      0 →         3 (chance collisions gone)
  *   containment_pairs      256 →     2 560 (10.0×: shared inverted-index
  *                                           candidates, exact)
  *   span_flagged_postings 21 543 → 215 430 (10.0×: no pairwise term in
  *                                           the ExactSubstr family)
  *   multiprobe_cands_8   3 372 →    31 429 (9.3×: fixed query set —
  *                                           linear in corpus by shape)
  *   phash_band_cands    25 302 →   261 580 (10.3×: 4×16-bit pHash bands
  *                                           linear at this media volume)
  */
class Sf1BandingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def docsBase: DataFrame =
    Tables.documents(spark, TestSpark.sf01).select("doc_id", "text")

  private def docs10x: DataFrame =
    (0 until 10).map { r =>
      docsBase.select(
        (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"r${r}q$$1").as("text"))
    }.reduce(_ union _)

  private def embBase: DataFrame =
    Tables.embeddings(spark, TestSpark.sf01).select("vec_id", "embedding")

  private def emb10x: DataFrame =
    (0 until 10).map { r =>
      embBase.select(
        (col("vec_id") + lit(r * 10000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (pmod(xxhash64(lit(r), i), lit(2)) * 2 - 1).cast("float"))
          .as("embedding"))
    }.reduce(_ union _)

  private def counts(df: DataFrame, chunkBits: Int): Map[String, Long] =
    DedupOps.candidateCounts(df, simhashChunkBits = chunkBits)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("10x corpus: ngram postings and minhash bands stay ~linear; " +
      "16-bit simhash chunks saturate (documented failure mode) and " +
      "32-bit chunks restore linearity") {
    val base16 = counts(docsBase, 16)
    val big16 = counts(docs10x, 16)
    val base32 = counts(docsBase, 32)
    val big32 = counts(docs10x, 32)

    def ratio(k: String, base: Map[String, Long], big: Map[String, Long]) = {
      assert(base(k) > 0, s"$k produced no candidates at sf0.1")
      big(k).toDouble / base(k)
    }

    val ngramR = ratio("ngram_postings", base16, big16)
    assert(ngramR > 8 && ngramR < 12.5,
      f"ngram candidates scaled $ngramR%.1fx, want ~10x (linear)")

    val mhR = ratio("minhash_bands", base16, big16)
    assert(mhR > 7 && mhR < 14,
      f"minhash candidates scaled $mhR%.1fx, want ~10x (linear)")

    // the committed failure mode: fixed 2^16-bucket space saturates at
    // 5e4 docs, the birthday term dominates and scaling goes superlinear
    val sh16R = ratio("simhash_bands_16", base16, big16)
    assert(sh16R > 13,
      f"expected 16-bit chunk saturation (superlinear), got $sh16R%.1fx")

    // widening the chunk to 32 bits (2^32 buckets) restores linearity up
    // to one real residual: token-empty docs all fingerprint 0L and share
    // ONE bucket, a term quadratic in their count (measured 14.4x vs the
    // linear 10x) — which is why a production pipeline runs exact dedup /
    // empty-doc filtering BEFORE simhash banding
    val sh32R = ratio("simhash_bands_32", base32, big32)
    assert(sh32R > 7 && sh32R < 16,
      f"simhash-32 candidates scaled $sh32R%.1fx, want ~10x + zero-bucket tail")

    info(f"ngram ${base16("ngram_postings")} -> ${big16("ngram_postings")} ($ngramR%.1fx)")
    info(f"minhash ${base16("minhash_bands")} -> ${big16("minhash_bands")} ($mhR%.1fx)")
    info(f"simhash16 ${base16("simhash_bands_16")} -> ${big16("simhash_bands_16")} ($sh16R%.1fx)")
    info(f"simhash32 ${base32("simhash_bands_32")} -> ${big32("simhash_bands_32")} ($sh32R%.1fx)")
  }

  test("10x corpus: containment pairs stay ~linear (disjoint replicas " +
      "reproduce the base pair structure exactly 10x — same inverted-" +
      "index candidates as the ngram family, asymmetric decision)") {
    val base = DedupOps.containmentPairsFrom(
      DedupOps.shingleIndexFrom(docsBase, 3)).count()
    val big = DedupOps.containmentPairsFrom(
      DedupOps.shingleIndexFrom(docs10x, 3)).count()
    assert(base > 0, "containment produced no pairs at sf0.1")
    val r = big.toDouble / base
    info(f"containment pairs $base -> $big ($r%.1fx)")
    assert(r > 8 && r < 12.5,
      f"containment pairs scaled $r%.1fx, want ~10x (linear)")
  }

  test("10x corpus: exact-substring flagged window postings stay ~linear " +
      "(the volume entering the islands merge — this family has no " +
      "pairwise term to audit)") {
    def cnt(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = DedupOps.spanPostingCounts(df).collect().head
      (r.getLong(1), r.getLong(2)) // (flagged, total)
    }
    val (fBase, tBase) = cnt(docsBase)
    val (fBig, tBig) = cnt(docs10x)
    assert(fBase > 0, "no duplicated windows at sf0.1")
    val fr = fBig.toDouble / fBase
    val tr = tBig.toDouble / tBase
    info(f"flagged postings $fBase -> $fBig ($fr%.1fx); " +
      f"total $tBase -> $tBig ($tr%.1fx)")
    assert(fr > 8 && fr < 12.5,
      f"flagged postings scaled $fr%.1fx, want ~10x (linear)")
    assert(tr > 8 && tr < 12.5,
      f"total postings scaled $tr%.1fx, want ~10x (linear)")
  }

  test("10x embeddings: multiprobe candidate volume stays ~linear in the " +
      "corpus at a fixed query set (corpus side lands in a constant " +
      "number of buckets; only membership grows)") {
    def cnt(df: org.apache.spark.sql.DataFrame): Long =
      SimilarityOps.lshMultiprobeCandidateCount(df)
        .collect().head.getLong(1)
    val base = cnt(embBase)
    val big = cnt(emb10x)
    assert(base > 0, "no multiprobe candidates at sf0.1")
    val r = big.toDouble / base
    info(f"multiprobe candidates $base -> $big ($r%.1fx)")
    assert(r > 6 && r < 16,
      f"multiprobe candidates scaled $r%.1fx, want ~10x (linear; " +
        "sign-decorrelated replicas add only chance-level bucket mass)")
  }

  test("10x embeddings: widening hyperplane bands is the knob that tames " +
      "LSH candidate volume (absolute counts drop with bucket width)") {
    def cnt(df: DataFrame, bandBits: Int): Long =
      SimilarityOps.lshCandidateCount(df, nBits = 32, bandBits = bandBits)
        .collect().head.getLong(1)
    val (b8, g8) = (cnt(embBase, 8), cnt(emb10x, 8))
    val (b16, g16) = (cnt(embBase, 16), cnt(emb10x, 16))
    val (b32, g32) = (cnt(embBase, 32), cnt(emb10x, 32))
    info(s"hyperplane8  $b8 -> $g8 (${g8.toDouble / math.max(b8, 1)}x)")
    info(s"hyperplane16 $b16 -> $g16 (${g16.toDouble / math.max(b16, 1)}x)")
    info(s"hyperplane32 $b32 -> $g32 (${g32.toDouble / math.max(b32, 1)}x)")
    assert(g16 < g8 && g32 < g16,
      s"candidate volume must drop with band width: $g8, $g16, $g32")
  }

  test("size-derived widths pick the measured-linear configs: narrow at " +
      "test scale, 32-bit at the scales where fixed widths saturate") {
    // SimHash chunks: 16 (the radius-3 default) holds through ~2^10 docs;
    // the corpora this spec measures saturating at 16 bits pick 32 — the
    // width the sh32R assertion above measures as ~linear
    assert(DedupOps.sizedChunkBits(500) == 16)    // sf0.001 documents
    assert(DedupOps.sizedChunkBits(1000) == 16)
    assert(DedupOps.sizedChunkBits(5000) == 32)   // sf0.1
    assert(DedupOps.sizedChunkBits(50000) == 32)  // the 10x corpus
    // capped: a 64-bit "chunk" would be exact-fingerprint match only —
    // past 32-bit saturation the documented move is blocking, not width
    assert(DedupOps.sizedChunkBits(1L << 40) == 32)

    // hyperplane bands: the 8-bit space saturated 99x at 10x and the
    // 16-bit space was still birthday-dominated (98x) — both corpora
    // must pick 32, the width measured to shed chance collisions
    assert(SimilarityOps.sizedBandBits(4) == 8)
    assert(SimilarityOps.sizedBandBits(6017) == 32)     // sf0.1 embeddings
    assert(SimilarityOps.sizedBandBits(60170) == 32)    // the 10x corpus
    assert(SimilarityOps.sizedBandBits(60170, nBits = 64) == 32)
  }

  test("simhashPairsAuto == explicit 16-bit banding at test scale, and " +
      "auto near-dup LSH pairs are a subset of the default-band pairs") {
    val auto = DedupOps.simhashPairsAuto(spark, TestSpark.sf001)
      .collect().map(_.toString).sorted
    val explicit16 = DedupOps.simhashPairs(spark, TestSpark.sf001)
      .collect().map(_.toString).sorted
    assert(auto.sameElements(explicit16))

    // wider aligned chunks only MERGE adjacent narrow chunks, so a wide
    // collision implies the narrow collision: auto (64-bit sig, sized
    // bands) must be a subset of the 8-bit-band pairs at the same nBits —
    // and every surfaced pair is verify-filtered at the threshold
    val autoPairs = SimilarityOps
      .cosineNearDupPairsLshAuto(spark, TestSpark.sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val densePairs = SimilarityOps
      .cosineNearDupPairsLsh(spark, TestSpark.sf001, nBits = 64, bandBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(autoPairs.subsetOf(densePairs),
      s"auto pairs not a subset: ${autoPairs.diff(densePairs).take(5)}")
  }

  test("simhashPairs chunk-width knob: identical pairs at Hamming<=1 " +
      "whether banded 4x16 or 2x32 (pigeonhole still covers the radius)") {
    val p16 = DedupOps.simhashPairs(spark, TestSpark.sf001, maxHamming = 1)
      .collect().map(_.toString).sorted
    val p32 = DedupOps.simhashPairs(spark, TestSpark.sf001, maxHamming = 1,
      chunkBits = 32).collect().map(_.toString).sorted
    assert(p16.sameElements(p32))
  }

  test("10x media: pHash banded candidates grow ~linearly (the one " +
      "banded family previously without a candidate-growth row) — " +
      "replica XOR masks are Hamming isometries within a replica and " +
      "decorrelate chunk buckets across replicas") {
    import graft.ops.Multimodal
    val fp = Multimodal
      .imagePhash(Multimodal.mediaTable(spark, TestSpark.sf01))
      .localCheckpoint()
    val fp10 = (0 until 10).map { r =>
      // XOR by a replica constant: d_H(a^m, b^m) = d_H(a, b), so every
      // replica reproduces the base near-dup structure; distinct masks
      // relabel the 16-bit chunk space so replicas don't share buckets
      // by construction — what remains across replicas is the honest
      // birthday term the guard exists to measure
      fp.select((col("media_id") + lit(r * 10000000L)).as("media_id"),
        col("phash").bitwiseXOR(lit(r * 0x9E3779B97F4A7C15L))
          .as("phash"))
    }.reduce(_ union _)
    val base = Multimodal.phashBandCandidates(fp)
    val big = Multimodal.phashBandCandidates(fp10)
    info(s"phash_band_cands $base -> $big " +
      f"(${big.toDouble / math.max(base, 1)}%.1fx)")
    assert(base > 0, "sf0.1 media must produce banded candidates")
    val ratio = big.toDouble / base
    assert(ratio >= 8 && ratio < 25,
      s"pHash banded candidates grew ${ratio}x at 10x — expected ~10x " +
        "(+ a bounded 16-bit-bucket birthday term); saturation means " +
        "the band width needs the sizedChunkBits treatment")
  }
}
