package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus pipeline: every stage materializes, counts only
  * shrink through filter stages, and the final exports reconcile with
  * the clean set.
  */
class CorpusPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("corpus pipeline runs end-to-end with reconciling stage outputs") {
    val out = Files.createTempDirectory("corpus-pipe").toString
    val c = CorpusPipeline.run(spark, TestSpark.sf0001, out)

    assert(c.total >= c.survivors, "dedup only drops")
    assert(c.survivors >= c.afterBoiler, "boilerplate removal only drops")
    assert(c.afterBoiler >= c.afterQuality, "quality gate only drops")
    assert(c.afterQuality >= c.afterGate, "quantile gate only drops")
    assert(c.afterGate == c.afterBalance, "mixture off by default: no-op")
    assert(c.afterBalance >= c.afterDecontam, "decontamination only drops")
    assert(c.afterDecontam > 0, "pipeline must not drop everything")
    assert(c.chunks >= c.afterDecontam - 1,
      "every non-empty clean doc produces at least one chunk")

    val clean = spark.read.parquet(s"$out/clean")
    val chunks = spark.read.parquet(s"$out/chunks")
    val packed = spark.read.parquet(s"$out/packed")
    val shuffled = spark.read.parquet(s"$out/shuffled")

    // chunk doc ids are exactly the clean docs with non-empty text
    val cleanIds = clean.filter(length(trim(col("text"))) > 0)
      .select("doc_id").distinct().count()
    assert(chunks.select("doc_id").distinct().count() == cleanIds)

    // packing conserves chunk tokens
    val chunkTokens = chunks.agg(sum("n_tokens")).head().getLong(0)
    val packedTokens = packed.agg(sum("n_tokens_packed")).head().getLong(0)
    assert(chunkTokens == packedTokens)
    assert(c.bins == packed.count())

    // shuffled export is a permutation of the clean set, strictly ordered
    assert(shuffled.count() == c.afterDecontam)
    assert(shuffled.join(clean.select("doc_id"), Seq("doc_id"), "left_anti")
      .count() == 0)

    // PII never survives to the export (redaction ran before the write)
    assert(clean.filter(col("text").rlike(ops.TextOps.emailRe)).count() == 0)
  }

  test("mixture balancing stage reduces toward the budget and keeps the " +
      "export reconciled") {
    val out = Files.createTempDirectory("corpus-pipe-mix").toString
    val c = CorpusPipeline.run(spark, TestSpark.sf0001, out,
      mixtureBudget = Some(40L))
    assert(c.afterBalance < c.afterGate,
      "a binding budget must actually sample")
    assert(c.afterBalance > 0)
    // balanced set still reconciles downstream
    val clean = spark.read.parquet(s"$out/clean")
    val shuffled = spark.read.parquet(s"$out/shuffled")
    assert(shuffled.count() == c.afterDecontam)
    assert(clean.count() == c.afterDecontam)
  }

  test("segmentDedup: every doc_id survives, counts reconcile, dropped " +
      "segments are exactly the cross-doc-shared ones, and exact " +
      "duplicate docs are fully hollowed out") {
    import ops.CorpusOps
    // sf0.01: the planted exact-duplicate documents the last assertion
    // needs exist at this SF (sf0.001 has shared segments but no full dups)
    val d = TestSpark.sf001
    val docs = Tables.documents(spark, d)
    val out = CorpusOps.segmentDedup(spark, d).cache()
    try {
      assert(out.count() == docs.count(), "no doc_id vanishes")
      // kept + dropped = total segments, recomputed independently
      val totalSegs = docs
        .select(greatest(ceil(size(split(col("text"), " ")) / 10.0)
          .cast("long"), lit(1L)).as("n")).agg(sum("n"))
        .collect()(0).getLong(0)
      val sums = out.agg(sum("kept_segs"), sum("dropped_segs")).collect()(0)
      assert(sums.getLong(0) + sums.getLong(1) == totalSegs)
      assert(sums.getLong(1) > 0, "fixture contains cross-doc duplicates")
      // a cleaned doc's word count is 10*kept (except possibly the final
      // short segment) — spot-check reassembly is order-preserving: the
      // clean text of an untouched doc equals the original
      val untouched = out.filter(col("dropped_segs") === 0)
        .join(docs, "doc_id")
        .filter(col("clean_text") =!= col("text"))
      assert(untouched.count() == 0, "untouched docs reassemble verbatim")
      // docs that are pure boilerplate (every segment shared with another
      // doc) come back present-but-empty, not vanished
      val hollow = out.filter(col("kept_segs") === 0)
      assert(hollow.count() > 0, "fixture plants fully-duplicated docs")
      assert(hollow.filter(col("clean_text") =!= "").count() == 0)
    } finally out.unpersist()
  }
}
