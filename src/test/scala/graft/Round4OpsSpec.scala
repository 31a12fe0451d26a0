package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, SimilarityOps, TextOps}

/** Round-4 operators: Gopher-rule filtering, CCNet perplexity terciles,
  * embedding cluster profile.
  */
class Round4OpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // ------------------------------------------------------- gopherRules

  /** 60-word passable filler sentence fragment (meets word-count rule). */
  private val goodBody: String =
    Seq.fill(12)("the quick brown fox jumps over").mkString(" ") +
      " that we have seen with it"

  test("gopherRules: a clean document passes every rule") {
    val df = TextOps.gopherRulesFrom(
      Seq((1L, goodBody)).toDF("doc_id", "text"))
    val r = df.collect().head
    val fields = df.columns.zipWithIndex.toMap
    assert(r.getBoolean(fields("keep")),
      s"clean doc rejected: ${r.mkString(", ")}")
  }

  test("gopherRules: each defect flips exactly its own rule") {
    val docs = Seq(
      (1L, goodBody), // clean
      (2L, "short doc the and of"), // word count < 50
      (3L, Seq.fill(60)("# ## ###").mkString(" ") + " the and"), // symbols
      (4L, (1 to 60).map(i => s"- bullet the and item $i").mkString("\n")),
      (5L, (1 to 60).map(i => s"the and line $i...").mkString("\n")),
      (6L, Seq.fill(60)("12345 67890").mkString(" ") + " the and") // non-alpha
    ).toDF("doc_id", "text")
    val out = TextOps.gopherRulesFrom(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("rule_word_count"))
    assert(!out(3L).getAs[Boolean]("rule_symbol_ratio"))
    assert(!out(4L).getAs[Boolean]("rule_bullet_lines"))
    assert(!out(5L).getAs[Boolean]("rule_ellipsis_lines"))
    assert(!out(6L).getAs[Boolean]("rule_alpha_words"))
    // every defect doc is rejected overall
    Seq(2L, 3L, 4L, 5L, 6L).foreach(id =>
      assert(!out(id).getAs[Boolean]("keep"), s"doc $id kept"))
  }

  test("gopherRules: stop-word rule needs two DISTINCT stop words") {
    val docs = Seq(
      (1L, "the " * 30 + "word"), // one kind, many occurrences
      (2L, "the and word")        // two kinds
    ).toDF("doc_id", "text")
    val out = TextOps.gopherRulesFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("rule_stop_words")).toMap
    assert(!out(1L) && out(2L))
  }

  test("gopherRules: empty and single-line docs do not divide by zero") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one-line")).toDF("doc_id", "text")
    val out = TextOps.gopherRulesFrom(docs).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val m = r.getAs[Double]("mean_word_len")
      assert(!m.isNaN && !m.isInfinite)
    }
  }

  // ------------------------------------------------------ ccnetBuckets

  test("ccnetBuckets: per-language doc counts form near-equal terciles " +
      "and reconcile with the scored corpus") {
    val out = TextOps.ccnetBuckets(spark, TestSpark.sf001)
    val rows = out.collect()
    val perLang = rows.groupBy(_.getString(0))
    // scored corpus = docs with >= 1 token (empty docs have no LM score)
    val scoredPerLang = Tables.documents(spark, TestSpark.sf001)
      .filter(length(trim(col("text"))) > 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, bs) =>
      val counts = bs.map(_.getLong(2))
      assert(counts.sum == scoredPerLang(lang),
        s"$lang: bucket docs ${counts.sum} != scored ${scoredPerLang(lang)}")
      assert(counts.max - counts.min <= 1,
        s"$lang: terciles must differ by <= 1 doc, got ${counts.toSeq}")
    }
    // head bucket strictly better mean logprob than tail, per language
    perLang.foreach { case (lang, bs) =>
      val byBucket = bs.map(r => r.getString(1) -> r.getDouble(4)).toMap
      assert(byBucket("head") > byBucket("tail"),
        s"$lang: head mean ${byBucket("head")} !> tail ${byBucket("tail")}")
    }
  }

  test("ccnetBuckets: deterministic across runs") {
    val a = TextOps.ccnetBuckets(spark, TestSpark.sf001).collect().toSeq
    val b = TextOps.ccnetBuckets(spark, TestSpark.sf001).collect().toSeq
    assert(a == b)
  }

  // ---------------------------------------------------- clusterProfile

  test("clusterProfile: every vector lands in exactly one cell and the " +
      "centroid's own cell tops out at cosine 1") {
    val out = SimilarityOps.clusterProfile(spark, TestSpark.sf001)
    val rows = out.collect()
    val corpus = Tables.embeddings(spark, TestSpark.sf001).count()
    assert(rows.map(_.getLong(1)).sum == corpus)
    // each centroid assigns to itself (cosine 1.0 beats every other cell
    // up to ties), so its cell's max_sim is exactly 1.0
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) <= r.getDouble(4) + 1e-9) // mean <= max
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-9) // min <= mean
    }
    assert(rows.exists(r => math.abs(r.getDouble(4) - 1.0) < 1e-9),
      "no cell contains its own centroid at cosine 1.0")
  }

  // ----------------------------------------------------- semanticDedup

  test("semanticDedup: survivors are an independent set — no in-cell " +
      "pair of survivors at or above the threshold — and every drop " +
      "has a lower-id cell-mate within it") {
    import graft.functions.CosineSimilarity.cosineSim
    val thr = 0.4
    val survivors = SimilarityOps
      .semanticDedup(spark, TestSpark.sf001, threshold = thr)
    val n = Tables.embeddings(spark, TestSpark.sf001).count()
    val sCount = survivors.count()
    assert(sCount > 0 && sCount < n,
      s"want a non-trivial split, got $sCount of $n survivors")
    // recompute in-cell pairs restricted to survivors: must be empty
    val emb = Tables.embeddings(spark, TestSpark.sf001)
      .select("vec_id", "embedding")
    val sv = survivors.join(emb, "vec_id")
    val a = sv.select(col("cell"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val b = sv.select(col("cell"), col("vec_id").as("vb"),
      col("embedding").as("eb"))
    val residual = a.join(b, Seq("cell"))
      .filter(col("va") < col("vb"))
      .filter(round(cosineSim(col("ea"), col("eb")), 6) >= thr)
      .count()
    assert(residual == 0,
      s"$residual surviving in-cell pairs above threshold remain")
  }

  test("keepFirstByKey: deterministic survivor per key by explicit order " +
      "(the dropDuplicates twin that cannot flip between runs)") {
    val df = Seq((1L, "b", 20), (1L, "a", 10), (2L, "c", 30), (1L, "d", 5))
      .toDF("k", "tag", "ord")
    val out = DedupOps.keepFirstByKey(df, Seq("k"), "ord")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "d", 2L -> "c")) // min ord wins, always
  }

  test("semanticDedup: deterministic across runs") {
    val a = SimilarityOps.semanticDedup(spark, TestSpark.sf001)
      .collect().toSeq
    val b = SimilarityOps.semanticDedup(spark, TestSpark.sf001)
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
