package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Scale-behavior guards: assert how each plan's SHUFFLE FOOTPRINT moves
  * when the input scales 10× (sf0.001 → sf0.01). Wall-clock lies on a
  * shared VM; shuffle bytes are a property of the plan and the data, so
  * they make a deterministic-enough regression signal (loose bounds absorb
  * compression variance).
  *
  * These pin the claims SCALE.md makes:
  * - aggregations with bounded group counts shuffle O(groups), not O(input)
  *   — map-side partial aggregation is working;
  * - top-k shuffles O(k · partitions), not O(corpus);
  * - per-row/narrow pipelines shuffle only at the presentation sort, which
  *   is O(output);
  * - genuinely input-proportional shuffles (dedup keyed by content hash)
  *   grow linearly — and not worse than linearly (no pair blowup).
  */
class ScalingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def footprint(name: String, d: String): Metrics.Profile = {
    val fn = SparkEntry.queries(name)
    val (_, p) = Metrics.profile(spark) {
      fn(spark, d).write.format("noop").mode("overwrite").save()
    }
    Caches.releaseAll()
    p
  }

  private def ratio(name: String, smallDir: String = TestSpark.sf0001,
      bigDir: String = TestSpark.sf001): (Double, Double) = {
    val small = footprint(name, smallDir)
    val big = footprint(name, bigDir)
    assert(small.inputRecords > 0 && big.inputRecords > 0)
    val inR = big.inputRecords.toDouble / small.inputRecords
    val shR = big.shuffleReadBytes.toDouble / math.max(small.shuffleReadBytes, 1L)
    (inR, shR)
  }

  test("q1 (bounded group count): 10x input, shuffle stays O(groups) — " +
      "partial aggregation holds") {
    val (inR, shR) = ratio("q1_category_per_country")
    assert(inR > 5, s"input should scale ~10x, got $inR")
    // (country × priority) groups don't grow with SF: the shuffled partial
    // aggregates are group-sized, so bytes should move far less than input
    assert(shR < inR / 2, s"shuffle grew ${shR}x vs input ${inR}x — " +
      "partial aggregation regressed")
  }

  test("emb_topk_brute: 4x corpus, shuffle stays O(k·partitions), not " +
      "O(corpus)") {
    // embeddings: 500 rows at sf0.01 → 2000 at sf0.1
    val (inR, shR) = ratio("emb_topk_brute", TestSpark.sf001, TestSpark.sf01)
    assert(inR > 3, s"corpus should scale ~4x, got $inR")
    assert(shR < inR / 1.5,
      s"top-k shuffle grew ${shR}x vs corpus ${inR}x — " +
      "per-partition pre-ranking regressed")
  }

  test("dedup_exact (content-hash groupBy): shuffle grows linearly — and " +
      "no worse") {
    // documents: 500 rows at sf0.01 → 5000 at sf0.1
    val (inR, shR) = ratio("dedup_exact", TestSpark.sf001, TestSpark.sf01)
    assert(inR > 5)
    // linear band: the shuffle carries one (hash, id) row per doc
    assert(shR > 2, s"suspiciously flat (${shR}x) — hash rows must scale")
    assert(shR < inR * 3, s"super-linear shuffle (${shR}x vs ${inR}x input)")
  }

  test("txt_segment_dedup: segment-keyed shuffle grows linearly with the " +
      "corpus — no pair blowup") {
    val (inR, shR) =
      ratio("txt_segment_dedup", TestSpark.sf001, TestSpark.sf01)
    assert(inR > 5)
    assert(shR > 2 && shR < inR * 3,
      s"segment shuffle ${shR}x vs input ${inR}x")
  }
}
