package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SimilarityOps

/** ANN result-QUALITY audit at bench scale (sf0.1 embeddings): recall@5
  * of every approximate top-k variant against the exact brute-force
  * ranking, same 10 queries. Complements [[Sf1BandingSpec]] (which
  * guards candidate-count SCALING): banding tells you the plan stays
  * linear; recall tells you the answer is still the answer.
  *
  * Floors are pinned from measured values on the committed
  * fixtures (see SCALE.md §ANN recall) — a refactor that silently
  * degrades a variant's retrieval quality fails here even if its plan
  * and candidate counts stay healthy.
  */
class AnnRecallSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("recall@5 vs exact brute force at sf0.1 holds each variant's " +
      "measured floor (int8 ~exact; coarse-quantized variants partial " +
      "by design — documented trade, not a bug)") {
    val sf = TestSpark.sf01
    val exact = pairs(SimilarityOps.bruteForceTopK(spark, sf))
    assert(exact.size === 50, "10 queries x k=5 exact pairs")

    val variants: Seq[(String, DataFrame, Double)] = Seq(
      // measured 1.00 — int8 quantization barely perturbs cosine order
      ("int8", SimilarityOps.bruteForceTopKInt8(spark, sf), 0.9),
      // measured 0.14 — hyperplane LSH on 64-dim near-uniform embeddings
      // is the WEAK retriever at 4x8-bit bands (0.28 at 8 bands, see the
      // band-count test); kept registered as the bucket-join scale shape,
      // with IVF as the recall path — SCALE.md §ANN recall
      ("lsh", SimilarityOps.lshTopK(spark, sf), 0.1),
      // measured 1.00 — 10-cell IVF probe covers these queries' cells
      ("ivf_seeded", SimilarityOps.ivfTopKSeeded(spark, sf), 0.9),
      // measured 0.88 — PQ ADC ranking, coarsest quantizer of the family
      ("pq", SimilarityOps.pqTopKSeeded(spark, sf), 0.7),
      // measured 0.94 — IVF pruning + PQ ranking compose, errors don't
      ("ivfpq", SimilarityOps.ivfPqTopK(spark, sf), 0.8))

    val measured = variants.map { case (name, df, floor) =>
      val got = pairs(df)
      val recall = (exact intersect got).size.toDouble / exact.size
      (name, recall, floor)
    }
    info(measured.map { case (n, r, _) => f"$n=$r%.2f" }.mkString(" "))
    measured.foreach { case (name, recall, floor) =>
      assert(recall >= floor,
        s"$name recall@5 $recall fell below its pinned floor $floor")
    }
  }

  test("multiprobe LSH dominates plain LSH: Hamming-1 probes are a " +
      "candidate superset, so recall@5 can only rise (measured 0.14 -> " +
      "multiprobe's floor pinned at 0.3)") {
    val sf = TestSpark.sf01
    val exact = pairs(SimilarityOps.bruteForceTopK(spark, sf))
    val plain = pairs(SimilarityOps.lshTopK(spark, sf))
    val mp = pairs(SimilarityOps.lshTopKMultiprobe(spark, sf))
    val rPlain = (exact intersect plain).size.toDouble / exact.size
    val rMp = (exact intersect mp).size.toDouble / exact.size
    info(f"plain=$rPlain%.2f multiprobe=$rMp%.2f")
    assert(rMp >= rPlain, "probing MORE buckets lost true neighbors")
    assert(rMp >= 0.3, s"multiprobe recall $rMp below pinned floor")
    // every exact neighbor plain found stays found under multiprobe
    assert((exact intersect plain).subsetOf(mp))
  }

  test("LSH recall rises with band count (the OR-construction knob): " +
      "more 8-bit bands over a longer signature strictly widen the " +
      "candidate net at linear cost") {
    val sf = TestSpark.sf01
    val exact = pairs(SimilarityOps.bruteForceTopK(spark, sf))
    val recalls = Seq(16, 32, 64).map { nBits =>
      val got = pairs(SimilarityOps.lshTopK(spark, sf, nBits = nBits))
      nBits -> (exact intersect got).size.toDouble / exact.size
    }
    info(recalls.map { case (b, r) => f"${b / 8}bands=$r%.2f" }.mkString(" "))
    assert(recalls.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"recall not monotone in band count: $recalls")
    assert(recalls.last._2 > recalls.head._2,
      "adding bands never widened the net — banding is broken")
  }
}
