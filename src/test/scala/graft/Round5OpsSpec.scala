package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, TextOps}

/** Round-5 operators: C4 line/page filtering, DSIR importance weights,
  * containment pairs, exact-substring duplicate spans, span removal,
  * quality-aware survivors.
  */
class Round5OpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // ----------------------------------------------------------- c4Rules

  /** Three survivable lines: terminal punctuation, >=5 tokens each. */
  private val cleanPage: String = Seq(
    "This is a perfectly reasonable sentence.",
    "Here is another one that also ends properly!",
    "And a third line with enough words, surely?").mkString("\n")

  test("c4Rules: a clean page keeps every line and passes") {
    val out = TextOps.c4RulesFrom(Seq((1L, cleanPage)).toDF("doc_id", "text"))
      .collect().head
    assert(out.getAs[Long]("n_lines") === 3L)
    assert(out.getAs[Long]("n_kept_lines") === 3L)
    assert(out.getAs[Long]("n_sentences") === 3L)
    assert(!out.getAs[Boolean]("has_lorem_ipsum"))
    assert(!out.getAs[Boolean]("has_brace"))
    assert(out.getAs[Boolean]("keep"))
  }

  test("c4Rules: each line defect drops exactly that line") {
    val page = Seq(
      "This line survives because it ends with a period.",
      "no terminal punctuation so this line is dropped",
      "Too. Few. Words.", // < 5 tokens -> dropped despite punctuation
      "This one mentions JavaScript so it is dropped.",
      "Sentence count comes only from surviving lines, like this one.")
      .mkString("\n")
    val out = TextOps.c4RulesFrom(Seq((1L, page)).toDF("doc_id", "text"))
      .collect().head
    assert(out.getAs[Long]("n_lines") === 5L)
    assert(out.getAs[Long]("n_kept_lines") === 2L)
    // sentences counted on the CLEANED text: 1 per surviving line here
    assert(out.getAs[Long]("n_sentences") === 2L)
    assert(!out.getAs[Boolean]("keep"), "only 2 sentences -> page dropped")
  }

  test("c4Rules: page-level rules — lorem ipsum, curly brace, and the " +
      "empty-survivor page each reject the whole document") {
    val docs = Seq(
      (1L, cleanPage),
      (2L, cleanPage + "\nSome Lorem Ipsum filler text appears right here."),
      (3L, cleanPage + "\nAn inline { brace } marks templated boilerplate."),
      (4L, "every\nline\nfails\nthe\nfilter")).toDF("doc_id", "text")
    val out = TextOps.c4RulesFrom(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Boolean]("has_lorem_ipsum") &&
      !out(2L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[Boolean]("has_brace") &&
      !out(3L).getAs[Boolean]("keep"))
    assert(out(4L).getAs[Long]("n_kept_lines") === 0L &&
      !out(4L).getAs[Boolean]("keep"))
  }

  test("c4Rules: clean_len is the length of the kept text, 0 when " +
      "nothing survives") {
    val out = TextOps.c4RulesFrom(Seq(
        (1L, "Kept line number one, clearly fine.\ndropped line"),
        (2L, "nothing survives here")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("clean_len") === 35L)
    assert(out(2L).getAs[Long]("clean_len") === 0L)
  }

  // ------------------------------------------------------- dsirWeights

  /** Quality-passing English-looking doc (target slice member). */
  private def targetDoc(i: Long): (Long, String) =
    (i, "the quick brown fox jumps over the lazy dog near the river bank " +
      "and the story continues with more of the same plain words")

  /** Quality-failing doc: all-numeric tokens (alpha ratio 0). */
  private def junkDoc(i: Long): (Long, String) =
    (i, "111 222 333 444 555 666 777 888 999 000 111 222 333 444 555")

  test("dsirWeights: target-slice vocabulary scores above junk " +
      "vocabulary, selected == weight > 0, one row per tokenized doc") {
    val docs = (Seq(1L, 2L, 3L).map(targetDoc) ++ Seq(4L, 5L).map(junkDoc))
      .toDF("doc_id", "text")
    val out = TextOps
      .dsirWeightsFrom(docs, TextOps.qualityKeep(col("text"))).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 5, "one row per doc with >=1 token")
    val w = (id: Long) => out(id).getAs[Double]("avg_log_ratio")
    // target docs' tokens dominate the target LM -> positive log ratio;
    // junk tokens appear ONLY outside the target slice -> negative
    Seq(1L, 2L, 3L).foreach(id =>
      assert(w(id) > 0.0, s"target doc $id scored ${w(id)}"))
    Seq(4L, 5L).foreach(id =>
      assert(w(id) < 0.0, s"junk doc $id scored ${w(id)}"))
    out.values.foreach { r =>
      assert(r.getAs[Boolean]("selected") ===
        (r.getAs[Double]("avg_log_ratio") > 0.0))
      assert(!r.getAs[Double]("avg_log_ratio").isNaN)
    }
  }

  test("dsirWeights: with an empty target slice the smoothed ratio " +
      "still evaluates (no NaN/null), and weights are uniform-negative " +
      "or zero-ish only through smoothing") {
    // lit(false) predicate -> target counts all 0, pure smoothing
    val docs = Seq(6L, 7L).map(junkDoc).toDF("doc_id", "text")
    val out = TextOps.dsirWeightsFrom(docs, lit(false)).collect()
    assert(out.length === 2)
    out.foreach { r =>
      val v = r.getAs[Double]("avg_log_ratio")
      assert(!v.isNaN && !v.isInfinite, s"non-finite weight $v")
    }
  }

  // ------------------------------------------------- containmentPairs

  /** Shingle index of a (doc_id, text) frame — the spec-side twin of the
    * private production index builder.
    */
  private def specIndex(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"),
        graft.functions.ShingleHashes.shingleHashes(
          TextOps.tokens(lower(col("text"))), 3).as("shs"))
      .select(col("doc_id"), explode(col("shs")).as("h"))

  test("containmentPairs: a wholesale-quoted excerpt passes containment " +
      "but fails Jaccard — the asymmetric case the operator exists for") {
    val long = (0 until 30).map(i => s"a$i").mkString(" ")
    val excerpt = (0 until 10).map(i => s"a$i").mkString(" ")
    val idx = specIndex(Seq((1L, long), (2L, excerpt)).toDF("doc_id", "text"))
    val cont = DedupOps.containmentPairsFrom(idx).collect()
    assert(cont.length === 1)
    val r = cont.head
    // B's 8 shingles all live inside A: containment 8/min(28,8) = 100%
    assert(r.getAs[Long]("shared") === 8L)
    assert(r.getAs[Long]("size_a") === 28L)
    assert(r.getAs[Long]("size_b") === 8L)
    // Jaccard 8/28 = 28.6% < 60% -> invisible to the resemblance op
    assert(DedupOps.ngramJaccardPairsFrom(idx).count() === 0)
  }

  test("containmentPairs: unrelated docs produce no pair; identical docs " +
      "pass both faces") {
    val t1 = (0 until 20).map(i => s"x$i").mkString(" ")
    val t2 = (0 until 20).map(i => s"y$i").mkString(" ")
    val idx = specIndex(Seq((1L, t1), (2L, t2), (3L, t1))
      .toDF("doc_id", "text"))
    val cont = DedupOps.containmentPairsFrom(idx).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 3L)))
    assert(DedupOps.ngramJaccardPairsFrom(idx).count() === 1)
  }

  // -------------------------------------------------------- dupSpans

  test("dupSpans: a shared 16-token run yields one merged span with " +
      "exact union coverage on both sides") {
    val shared = (0 until 16).map(i => s"s$i")
    val doc1 = ((0 until 10).map(i => s"a$i") ++ shared ++
      (0 until 14).map(i => s"a${10 + i}")).mkString(" ") // 40 tokens
    val doc2 = ((0 until 10).map(i => s"b$i") ++ shared ++
      (0 until 10).map(i => s"b${10 + i}")).mkString(" ") // 36 tokens
    val out = DedupOps.dupSpansFrom(
        Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text"), k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_tokens") === 40L)
    assert(r1.getAs[Long]("n_windows") === 33L)
    // flagged starts 10..18 (windows fully inside the shared run)
    assert(r1.getAs[Long]("n_dup_windows") === 9L)
    assert(r1.getAs[Long]("n_spans") === 1L)
    assert(r1.getAs[Long]("dup_tokens") === 16L)
    assert(r1.getAs[Double]("dup_frac") === 16.0 / 40.0)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_spans") === 1L &&
      r2.getAs[Long]("dup_tokens") === 16L)
  }

  test("dupSpans: two disjoint shared runs stay two spans; a unique doc " +
      "and a doc shorter than k report zeros") {
    val runX = (0 until 8).map(i => s"x$i")
    val runY = (0 until 8).map(i => s"y$i")
    val doc5 = ((0 until 5).map(i => s"c$i") ++ runX ++
      (0 until 5).map(i => s"c${5 + i}") ++ runY ++
      (0 until 5).map(i => s"c${10 + i}")).mkString(" ") // 31 tokens
    val doc6 = (runX ++ (0 until 6).map(i => s"d$i") ++ runY).mkString(" ")
    val out = DedupOps.dupSpansFrom(Seq(
        (5L, doc5), (6L, doc6),
        (7L, (0 until 20).map(i => s"u$i").mkString(" ")),
        (8L, "only five little tokens here")).toDF("doc_id", "text"), k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(5L).getAs[Long]("n_spans") === 2L)
    assert(out(5L).getAs[Long]("dup_tokens") === 16L)
    assert(out(6L).getAs[Long]("n_spans") === 2L)
    assert(out(7L).getAs[Long]("n_spans") === 0L &&
      out(7L).getAs[Long]("dup_tokens") === 0L)
    assert(out(8L).getAs[Long]("n_windows") === 0L &&
      out(8L).getAs[Double]("dup_frac") === 0.0)
  }

  test("dupSpans: overlapping flagged windows merge — a 9-token shared " +
      "run is 2 windows, 1 span, 9 covered tokens") {
    val shared = (0 until 9).map(i => s"s$i")
    val doc1 = ((0 until 6).map(i => s"a$i") ++ shared ++
      (0 until 6).map(i => s"a${6 + i}")).mkString(" ")
    val doc2 = (shared ++ (0 until 12).map(i => s"b$i")).mkString(" ")
    val out = DedupOps.dupSpansFrom(
        Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text"), k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_dup_windows") === 2L)
    assert(out(1L).getAs[Long]("n_spans") === 1L)
    assert(out(1L).getAs[Long]("dup_tokens") === 9L)
  }

  // -------------------------------------------------- removeDupSpans

  test("removeDupSpans: the canonical (min doc_id) copy keeps its text; " +
      "every other copy is cut; unique surroundings survive verbatim") {
    val shared = (0 until 12).map(i => s"s$i")
    val doc1 = ((0 until 6).map(i => s"a$i") ++ shared ++
      (0 until 6).map(i => s"a${6 + i}")).mkString(" ") // 24 tokens
    val doc2 = ((0 until 4).map(i => s"b$i") ++ shared ++
      (0 until 4).map(i => s"b${4 + i}")).mkString(" ") // 20 tokens
    val out = DedupOps.removeDupSpansFrom(
        Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text"), k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 is every shared window's min-id owner: untouched
    assert(out(1L).getAs[Long]("removed_tokens") === 0L)
    assert(out(1L).getAs[String]("clean_text") === doc1)
    // doc 2 loses exactly the 12 shared tokens, keeps its unique halves
    assert(out(2L).getAs[Long]("removed_tokens") === 12L)
    assert(out(2L).getAs[Long]("kept_tokens") === 8L)
    assert(out(2L).getAs[String]("clean_text") ===
      ((0 until 4).map(i => s"b$i") ++
        (0 until 4).map(i => s"b${4 + i}")).mkString(" "))
  }

  test("removeDupSpans: three-way copies keep exactly one occurrence " +
      "corpus-wide; short and unique docs pass through whole") {
    val run = (0 until 10).map(i => s"r$i").mkString(" ")
    val out = DedupOps.removeDupSpansFrom(Seq(
        (3L, run), (7L, run), (9L, run),
        (11L, (0 until 15).map(i => s"u$i").mkString(" ")),
        (12L, "short doc here")).toDF("doc_id", "text"), k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(3L).getAs[String]("clean_text") === run)
    assert(out(7L).getAs[String]("clean_text") === "")
    assert(out(9L).getAs[String]("clean_text") === "")
    assert(out(7L).getAs[Long]("removed_tokens") === 10L)
    assert(out(11L).getAs[Long]("removed_tokens") === 0L)
    assert(out(12L).getAs[String]("clean_text") === "short doc here")
  }

  test("removeDupSpans: total tokens are conserved — removed + kept = n " +
      "per doc, and each doc's kept tokens are a subsequence of its own") {
    val shared = (0 until 9).map(i => s"z$i")
    val docs = Seq(
      (1L, (shared ++ (0 until 5).map(i => s"p$i")).mkString(" ")),
      (2L, ((0 until 3).map(i => s"q$i") ++ shared).mkString(" ")))
    val rows = DedupOps.removeDupSpansFrom(docs.toDF("doc_id", "text"), k = 8)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("removed_tokens") + r.getAs[Long]("kept_tokens")
        === r.getAs[Long]("n_tokens"))
    }
    val byId = docs.toMap
    rows.foreach { r =>
      val orig = byId(r.getLong(0)).split(" ").toSeq
      val kept = r.getAs[String]("clean_text") match {
        case "" => Seq.empty[String]
        case t  => t.split(" ").toSeq
      }
      // subsequence check: kept tokens appear in orig order
      val it = orig.iterator
      assert(kept.forall(tok => it.contains(tok)),
        s"doc ${r.getLong(0)}: $kept not a subsequence of $orig")
    }
  }

  // ------------------------------------------- dedupSurvivorsByQuality

  test("dedupSurvivorsByQuality: within a near-dup cluster the longer " +
      "quality-keep doc survives even when it has the larger doc_id") {
    val base = (0 until 40).map(i => s"alpha beta gamma delta w$i").mkString(" ")
    val longer = base + " " + (0 until 20).map(i => s"extra token e$i").mkString(" ")
    val sfDir = java.nio.file.Files.createTempDirectory("qsurv").toString
    Seq((1L, base, "en", "web", base.length.toLong),
        (2L, longer, "en", "web", longer.length.toLong),
        (5L, "lone unique document with plenty of distinct words here",
          "en", "web", 55L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sfDir/documents.parquet")
    val out = DedupOps.dedupSurvivorsByQuality(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // docs 1,2 are near-dups (shared prefix dominates); 2 is longer → wins
    assert(!out.contains(1L), "cluster loser must not survive")
    assert(out(2L).getAs[Long]("cluster_id") === 1L)
    assert(out(2L).getAs[Long]("n_members") === 2L)
    // unpaired doc passes through as its own singleton
    assert(out(5L).getAs[Long]("cluster_id") === 5L)
    assert(out(5L).getAs[Long]("n_members") === 1L)
    graft.Caches.releaseAll()
  }

  // ------------------------------------------- fertility / unimaxBudget

  /** Write a (doc_id, text, lang) set as a documents.parquet table dir. */
  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("tokplan").toString
    rows.map { case (id, text, lang) =>
        (id, text, lang, "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("fertility: plain words score 1.0; punctuation-heavy text costs " +
      "proportionally more subwords per word") {
    val dir = docsDir(Seq(
      (1L, "hello world again", "en"),          // 3 words, 3 subwords
      (2L, "don't stop-me now!", "fr")))        // 3 words, 8 subwords
    val out = TextOps.fertility(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("en").getAs[Long]("n_words") === 3L)
    assert(out("en").getAs[Long]("n_subwords") === 3L)
    assert(out("en").getAs[Double]("fertility") === 1.0)
    assert(out("fr").getAs[Long]("n_subwords") === 8L)
    assert(out("fr").getAs[Double]("fertility") === 8.0 / 3.0)
  }

  test("unimaxBudget: capped low-resource language yields surplus to the " +
      "rest; allocations exhaust the budget exactly") {
    // token counts 10 / 100 / 1000; budget = 1110 div 2 = 555; caps x4.
    val dir = docsDir(Seq(
      (1L, Seq.fill(10)("a").mkString(" "), "aa"),
      (2L, Seq.fill(100)("b").mkString(" "), "bb"),
      (3L, Seq.fill(1000)("c").mkString(" "), "cc")))
    val out = TextOps.unimaxBudget(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    // waterfall: aa min(40, 555/3=185)=40; bb min(400, 515/2=257)=257;
    // cc min(4000, 258)=258
    assert(out("aa").getAs[Long]("alloc") === 40L)
    assert(out("bb").getAs[Long]("alloc") === 257L)
    assert(out("cc").getAs[Long]("alloc") === 258L)
    assert(out.values.map(_.getAs[Long]("alloc")).sum === 555L)
    // the capped language sits exactly at maxEpochs; no one exceeds it
    assert(out("aa").getAs[Double]("epochs") === 4.0)
    out.values.foreach(r =>
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("cap")))
  }

  test("unimaxBudget: equal-size languages split the budget evenly " +
      "(the fairness face: no language starves)") {
    val dir = docsDir(Seq(
      (1L, Seq.fill(200)("x").mkString(" "), "xx"),
      (2L, Seq.fill(200)("y").mkString(" "), "yy")))
    val out = TextOps.unimaxBudget(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("xx").getAs[Long]("alloc") === 100L)
    assert(out("yy").getAs[Long]("alloc") === 100L)
  }

  test("dsirWeights: on the sf0.001 corpus the lang='en' target slice " +
      "averages higher than its complement (the operator's ranking " +
      "purpose) and every weight is finite") {
    val docs = Tables.documents(spark, TestSpark.sf001)
    val weights = TextOps.dsirWeightsFrom(docs, col("lang") === "en")
    val flagged = weights.join(
      docs.select(col("doc_id"), (col("lang") === "en").as("is_target")),
      "doc_id")
    assert(flagged.filter(col("avg_log_ratio").isNaN).count() === 0)
    val avgBySlice = flagged.groupBy("is_target")
      .agg(avg(col("avg_log_ratio")).as("mean_w"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avgBySlice.keySet === Set(true, false),
      s"expected both slices at sf0.001, got $avgBySlice")
    assert(avgBySlice(true) > avgBySlice(false),
      s"target slice must outrank complement: $avgBySlice")
  }
}
