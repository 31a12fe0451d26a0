package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Round-5 operators: C4 line/page filtering, DSIR importance weights. */
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
