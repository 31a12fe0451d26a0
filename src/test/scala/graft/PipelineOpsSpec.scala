package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusOps, DedupOps, EventOps, SimilarityOps, TextOps}

/** Specs for the training-data-pipeline operator families (dedup,
  * similarity, text analysis, events). Value-level verification is the
  * DuckDB oracle gate; these cover the non-SQL-expressible ops (sketches)
  * and algebraic invariants.
  */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._
  private val d = TestSpark.sf001

  // ---------------------------------------------------------------- dedup

  test("minhash LSH finds exactly the planted near-dup pairs " +
      "(vs exact n-gram Jaccard ground truth)") {
    val exact = DedupOps.ngramJaccardPairs(spark, d)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashLshPairs(spark, d)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "ground truth should contain planted near-dups")
    // LSH candidates are verified with the same exact Jaccard, so lsh ⊆ exact;
    // recall should be high at 16 bands × 4 rows.
    assert(lsh.subsetOf(exact))
    assert(lsh.size >= exact.size * 8 / 10,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("MinHashSignature values match a direct Scala model " +
      "(token XXH64 chain -> per-seed xorshift minima)") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val docs = Tables.documents(spark, d).select("doc_id", "text")
      .limit(20).collect().map(r => r.getLong(0) -> r.getString(1))
    val seeds = {
      var x = 0x9E3779B97F4A7C15L
      (0 until 64).map { _ =>
        x += 0x9E3779B97F4A7C15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }.toArray
    }
    def model(text: String): Option[Seq[Long]] = {
      val toks = text.trim.toLowerCase match {
        case "" => Array.empty[String]
        case t => t.split("\\s+")
      }
      if (toks.length < 3) return None
      val th = toks.map { t =>
        val u = UTF8String.fromString(t)
        XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      }
      val mins = Array.fill(64)(Long.MaxValue)
      for (i <- 0 to th.length - 3) {
        var h = 42L
        for (j <- 0 until 3) h = XXH64.hashLong(th(i + j), h)
        for (s <- 0 until 64) {
          var x = h ^ seeds(s)
          x ^= x << 13; x ^= x >> 7; x ^= x << 17
          if (x < mins(s)) mins(s) = x
        }
      }
      Some(mins.toSeq)
    }
    val got = Tables.documents(spark, d).select(col("doc_id"),
        graft.functions.MinHashSignature.minhashSignature(
          TextOps.tokens(lower(col("text"))), 3, seeds).as("sig"))
      .limit(20).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1)))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === model(text), s"doc $id")
    }
  }

  test("SimHash64 expression is bit-identical to the declarative " +
      "explode + 64-vote-aggregate formulation") {
    // the formulation the compiled expression replaced, rebuilt inline as
    // the semantic reference
    val tok = Tables.documents(spark, d)
      .select(col("doc_id"),
        explode_outer(TextOps.tokens(lower(col("text")))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val votes = (0 until 64).map { i =>
      sum(when(col("t").isNull, 0)
        .when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val bits = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    val reference = tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        bits.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val compiled = DedupOps.simhash(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compiled === reference)
  }

  test("simhash: near-identical docs have small Hamming distance") {
    val fp = DedupOps.simhash(spark, d)
    assert(fp.count() === Tables.documents(spark, d).count())
    val pairs = DedupOps.simhashPairs(spark, d).collect()
    assert(pairs.nonEmpty, "planted near-dups should collide in simhash bands")
    pairs.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
  }

  test("multi-file table layout yields identical results (no single-file " +
      "assumption in any dedup/text op)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_multi").toString
    Tables.documents(spark, d).repartition(8)
      .write.parquet(s"$dir/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    assert(rows(DedupOps.ngramJaccardPairs(spark, dir)) ===
      rows(DedupOps.ngramJaccardPairs(spark, d)))
    assert(rows(DedupOps.simhash(spark, dir)) ===
      rows(DedupOps.simhash(spark, d)))
    assert(rows(TextOps.topTerms(spark, dir)) ===
      rows(TextOps.topTerms(spark, d)))
    graft.Caches.releaseAll()
  }

  test("connected components: chains collapse into one cluster; " +
      "survivors = cluster minima + unpaired docs") {
    // chain A~B, B~C plus isolated pair D~E: components {A,B,C}, {D,E}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    graft.Caches.releaseAll()
    // corpus-level: cluster members reconcile with the pair set, and
    // survivors + duplicates partition the corpus
    val clusters = DedupOps.nearDupClusters(spark, d).collect()
    val pairDocs = DedupOps.ngramJaccardPairs(spark, d)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("x"))
      .distinct().count()
    assert(clusters.map(_.getLong(1)).sum === pairDocs)
    clusters.foreach(r => assert(r.getLong(1) >= 2))
    val survivors = DedupOps.dedupSurvivors(spark, d).count()
    val total = Tables.documents(spark, d).count()
    val dropped = pairDocs - clusters.length // non-minima of each cluster
    assert(survivors === total - dropped)
    graft.Caches.releaseAll()
  }

  test("decontamination: flagged docs share n-grams with the eval slice; " +
      "eval docs themselves are never flagged") {
    val out = CorpusOps.decontaminate(spark, d).collect()
    assert(out.nonEmpty, "planted near-dups should cross the eval slice")
    out.foreach { r =>
      assert(r.getLong(0) % 20 != 0, "eval docs must not appear")
      assert(r.getLong(1) >= 1)
    }
  }

  test("bloom-prefiltered decontamination is bit-identical to the exact " +
      "form (false positives die in the exact join)") {
    val docs = Tables.documents(spark, d)
    val a = ops.CorpusOps.decontaminateFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = ops.CorpusOps.decontaminateBloomFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("shuffle export: permutation of the corpus, deterministic, and " +
      "source-locality actually broken") {
    val a = CorpusOps.shuffleExport(spark, d).collect()
    val b = CorpusOps.shuffleExport(spark, d).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    val total = Tables.documents(spark, d).count()
    assert(a.length.toLong == total)
    assert(a.map(_.getLong(0)).distinct.length.toLong == total)
    // keys strictly ordered in the output
    val keys = a.map(_.getLong(1)).toSeq
    assert(keys == keys.sorted)
    // locality check: consecutive doc_ids land far apart on average
    val pos = a.map(_.getLong(0)).zipWithIndex.toMap
    val meanGap = (0L until total - 1)
      .map(i => math.abs(pos(i) - pos(i + 1))).sum.toDouble / (total - 1)
    assert(meanGap > total / 10.0, s"shuffle too local: meanGap=$meanGap")
  }

  test("repetition ratio: bounded in [0,1), distinct <= total, and the " +
      "most-repetitive corpus docs score above the least-repetitive") {
    val out = CorpusOps.repetitionRatio(spark, d).collect()
    assert(out.length.toLong == Tables.documents(spark, d).count())
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val ratio = r.getDouble(3)
      assert(ratio >= 0.0 && ratio < 1.0)
      // definitional identity on every row
      if (r.getLong(1) > 0)
        assert(ratio == 1.0 - r.getLong(2).toDouble / r.getLong(1))
    }
    // near-dup planted corpus repeats phrases: some doc must repeat a gram
    assert(out.exists(_.getDouble(3) > 0.0))
  }

  test("chunk windows: contiguous indices, full windows except the last, " +
      "and chunks cover every token exactly (overlap accounted)") {
    val out = CorpusOps.chunkWindows(spark, d)
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") >= 1)
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("nc"), max("chunk_idx").as("maxi"),
        sum("n_tokens").as("sumlen"), max("n_tokens").as("maxlen"))
      .join(toks, "doc_id").collect()
    assert(perDoc.length.toLong == toks.count(), "every non-empty doc chunked")
    perDoc.foreach { r =>
      val (nc, maxi, sumlen, maxlen, n) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(maxi == nc - 1, "chunk indices contiguous from 0")
      assert(maxlen == math.min(n, 64L), "widest chunk is a full window")
      assert(nc == (if (n <= 64) 1L else 1L + (n - 64 + 47) / 48),
        s"doc ${r.getLong(0)}: nc=$nc n=$n")
      // windows overlap by window-stride=16 tokens at each of the nc-1
      // boundaries; total chunk tokens must equal n plus that overlap
      assert(sumlen == n + (nc - 1) * 16,
        s"doc ${r.getLong(0)}: coverage broken (sum=$sumlen n=$n nc=$nc)")
    }
  }

  test("sequence packing: bins contiguous per shard, conserve every chunk " +
      "token, and fill to budget within one window of slack") {
    val budget = 256; val win = 64
    val bins = CorpusOps.packSequences(spark, d).collect()
    val chunkTokens = CorpusOps.chunkWindows(spark, d)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(bins.map(_.getLong(3)).sum == chunkTokens, "token conservation")
    bins.groupBy(_.getLong(0)).foreach { case (shard, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq,
        s"shard $shard: bin ids not contiguous")
      val byId = rows.sortBy(_.getLong(1))
      byId.init.foreach { r =>
        val packed = r.getLong(3)
        assert(packed >= budget - win + 1 && packed <= budget + win - 1,
          s"shard $shard bin ${r.getLong(1)}: packed=$packed outside slack")
      }
    }
  }

  test("clusters from MinHash-LSH pairs equal clusters from exact pairs " +
      "(recall 1.0 on this corpus carries through the component step)") {
    val exact = DedupOps.connectedComponents(
      DedupOps.ngramJaccardPairs(spark, d)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = DedupOps.connectedComponents(
      DedupOps.minhashLshPairs(spark, d)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact == lsh)
    graft.Caches.releaseAll()
  }

  test("exact dedup partitions the corpus (sum of copies = row count)") {
    val out = DedupOps.exactDedup(spark, d)
    val total = out.agg(sum("n_copies")).head().getLong(0)
    assert(total === Tables.documents(spark, d).count())
  }

  test("pii redact: planted emails/ips/phones are replaced and counted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    Seq(
      (1L, "contact alice@example.com or +4915112345678 now", "en", "web", 45L),
      (2L, "server at 10.0.0.1 and 192.168.1.255 port", "en", "web", 40L),
      (3L, "call 555-867-5309 today", "en", "web", 23L),
      (4L, "no pii here at all", "en", "web", 18L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.piiRedact(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) === ((1L, 0L, 1L,
      "contact <EMAIL> or <PHONE> now")))
    assert(out(2L) === ((0L, 2L, 0L, "server at <IP> and <IP> port")))
    assert(out(3L) === ((0L, 0L, 1L, "call <PHONE> today")))
    assert(out(4L) === ((0L, 0L, 0L, "no pii here at all")))
  }

  test("train/test split: buckets in [0,100), split consistent, " +
      "identical content always lands in the same split") {
    val out = TextOps.trainTestSplit(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val b = r.getLong(1)
      assert(b >= 0 && b < 100)
      assert(r.getString(2) === (if (b < 10) "test" else "train"))
    }
    // content-keyed: exact duplicates (same text) share a bucket
    val withText = Tables.documents(spark, d).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byText = out.groupBy(r => withText(r.getLong(0)))
    byText.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).distinct.length === 1)
    }
    // the 10% default is a hash expectation, not a guarantee — allow slack
    val testFrac = out.count(_.getString(2) == "test").toDouble / out.length
    assert(testFrac > 0.03 && testFrac < 0.25, s"test fraction $testFrac")
  }

  test("top terms: tf >= df, descending tf, min(k, vocab) rows") {
    val out = TextOps.topTerms(spark, d).collect()
    val vocab = Tables.documents(spark, d)
      .select(explode(TextOps.tokens(lower(col("text")))).as("t"))
      .distinct().count()
    assert(out.length === math.min(50L, vocab))
    out.foreach(r => assert(r.getLong(1) >= r.getLong(2)))
    val tfs = out.map(_.getLong(1))
    assert(tfs.zip(tfs.tail).forall { case (a, b) => a >= b })
  }

  // ----------------------------------------------------------- similarity

  test("brute-force top-k: k rows per query, sims in [-1,1] descending") {
    val out = SimilarityOps.bruteForceTopK(spark, d).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.size === 10)
    byQuery.values.foreach { rows =>
      assert(rows.length === 5)
      val sims = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      sims.foreach(s => assert(s >= -1.0 && s <= 1.0))
    }
  }

  test("LSH top-k is a subset-per-query of candidates with valid sims " +
      "and agrees with brute force on its top hit when present") {
    val brute = SimilarityOps.bruteForceTopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lsh = SimilarityOps.lshTopK(spark, d).collect()
    assert(lsh.nonEmpty, "8-bit banding should produce candidates")
    // ANN neighbor sims can't exceed the exact top-1 sim for that query
    lsh.foreach { r => assert(r.getDouble(3) <= 1.0 && r.getDouble(3) >= -1.0) }
  }

  // ----------------------------------------------------------------- text

  test("token count: zero for empty text, splits on runs of whitespace") {
    val df = Seq((1L, "a  b\tc"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val n = df.select($"doc_id", size(TextOps.tokens($"text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(n === Map(1L -> 3, 2L -> 0, 3L -> 0))
  }

  test("language id: stopword-dominant doc is classified, no-hit doc is und") {
    val preds = ops.TextOps.languageId(spark, d)
    assert(preds.count() === 500)
    val langs = preds.select("predicted_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.contains("en") || langs.contains("und"))
  }

  test("xx fingerprint equals md5 fingerprint in dedup power " +
      "(same equivalence classes)") {
    val xx = TextOps.xxFingerprint(spark, d)
      .select(countDistinct("fingerprint")).head().getLong(0)
    val m5 = TextOps.md5Fingerprint(spark, d)
      .select(countDistinct("fingerprint")).head().getLong(0)
    assert(xx === m5)
  }

  // --------------------------------------------------------------- events

  test("sessionize: session count bounded by event count; durations >= 0") {
    val s = EventOps.sessionize(spark, d)
    val nEvents = Tables.events(spark, d).count()
    val total = s.agg(sum("n_events")).head().getLong(0)
    assert(total === nEvents)
    assert(s.filter($"duration_sec" < 0).count() === 0)
  }

  test("funnel: stage counts monotonically decrease and stage 1 equals " +
      "distinct viewers") {
    val out = EventOps.funnel(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viewers = Tables.events(spark, d)
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(out("1_view") === viewers)
    assert(out("1_view") >= out.getOrElse("2_click", 0L))
    assert(out.getOrElse("2_click", 0L) >= out.getOrElse("3_purchase", 0L))
  }

  test("cohort retention: weeks_since >= 0, week-0 row equals cohort size") {
    val rows = EventOps.cohortRetention(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    rows.keys.foreach { case (_, w) => assert(w >= 0) }
    // every user is active in their own first week, so the week-0 entry
    // of each cohort is exactly the cohort's size
    val cohortSizes = rows.filter(_._1._2 == 0L)
      .map { case ((c, _), n) => c -> n }
    val totalWeek0 = cohortSizes.values.sum
    val totalUsers = Tables.events(spark, d)
      .select("user_id").distinct().count()
    assert(totalWeek0 === totalUsers)
  }

  test("stratified sample: per-language rates respected, deterministic, " +
      "subset of the corpus") {
    val out = TextOps.sampleStratified(spark, d).collect()
    val out2 = TextOps.sampleStratified(spark, d).collect()
    assert(out.map(_.toString).toSeq === out2.map(_.toString).toSeq)
    out.foreach { r =>
      val keepBelow = if (r.getString(1) == "en") 20 else 50
      assert(r.getLong(2) < keepBelow)
    }
    // rates land near targets (hash buckets, not exact percentages)
    val byLang = out.groupBy(_.getString(1)).view.mapValues(_.length)
    val corpus = Tables.documents(spark, d).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, n) =>
      val target = (if (lang == "en") 0.20 else 0.50) * corpus(lang)
      assert(n > target * 0.5 && n < target * 1.7,
        s"$lang sampled $n vs target $target")
    }
  }

  test("hourly agg: totals reconcile with raw row count") {
    val h = EventOps.hourlyByType(spark, d)
    val total = h.agg(sum("n_events")).head().getLong(0)
    assert(total === Tables.events(spark, d).count())
  }
}
