package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSimilarity.cosineSim
import graft.ops.SimilarityOps

/** Specs for the fused CosineSimilarity Catalyst expression. */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("fused expression ≡ composed HOF formulation, bit-exact, on testdata") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .filter(col("ia") < 20)
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
      .filter(col("ib") >= 20 && col("ib") < 40)
    val both = a.crossJoin(b)
      .select(
        cosineSim(col("ea"), col("eb")).as("fused"),
        SimilarityOps.cosineComposed(col("ea"), col("eb")).as("composed"))
      .collect()
    assert(both.length === 400)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("LSH near-dup pairs: recovers exactly the planted near-dups, " +
      "candidates a small fraction of all pairs") {
    val rnd = new scala.util.Random(7)
    val dim = 64
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val base = (0 until 100).map(i => (i.toLong, vec(), s"l${i % 5}"))
    // plant 15 near-identical copies of the first 15 vectors
    val dups = (0 until 15).map { i =>
      val src = base(i)._2
      val e = src.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
      ((1000 + i).toLong, e, base(i)._3)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_lshnd").toString
    (base ++ dups).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val found = SimilarityOps.cosineNearDupPairsLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact ground truth by brute force over all pairs
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val truth = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb")))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("c", round(cosineSim(col("ea"), col("eb")), 6))
      .filter(col("c") >= 0.9)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size === 15, s"fixture should plant 15 pairs, got ${truth.size}")
    assert(found === truth,
      s"missed ${truth -- found}, spurious ${found -- truth}")
  }

  test("known values: orthogonal -> 0, identical -> 1, opposite -> -1") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 2f), Array(1f, 2f), 1.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0),
      (Array(3f, 4f), Array(3f, 4f), 1.0))
      .toDF("a", "b", "expect")
    df.select(cosineSim(col("a"), col("b")).as("got"), col("expect"))
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      }
  }

  test("null input -> null") {
    val withNull = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(cosineSim(col("a"), col("b")).as("c")).head()
    assert(withNull.isNullAt(0))
  }

  test("null ELEMENT -> null, same as the composed HOF form") {
    val df = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE), 3.0D) AS a, " +
        "array(1.0D, 2.0D, 3.0D) AS b")
    val r = df.select(
      cosineSim(col("a"), col("b")).as("fused"),
      SimilarityOps.cosineComposed(col("a"), col("b")).as("composed")).head()
    assert(r.isNullAt(0), "fused should be null on null element")
    assert(r.isNullAt(1), "composed should be null on null element")
  }

  test("expression participates in codegen (no fallback in plan)") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001).limit(10)
    val plan = emb.select(cosineSim(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || !plan.contains("Fallback"),
      s"unexpected plan: $plan")
  }

  test("DIMENSION mismatch -> null (both eval and codegen paths), " +
      "matching the composed zip_with null-padding — a common-prefix " +
      "cosine would let a corrupt embedding pass threshold filters") {
    val df = spark.sql(
      "SELECT array(1.0D, 2.0D, 3.0D) AS a, array(1.0D, 2.0D) AS b")
    val r = df.select(
      cosineSim(col("a"), col("b")).as("fused"),
      SimilarityOps.cosineComposed(col("a"), col("b")).as("composed")).head()
    assert(r.isNullAt(0), "fused must be null on dimension mismatch")
    assert(r.isNullAt(1), "composed is null on dimension mismatch")
    // hyperplane signature: same contract vs its plane matrix
    import graft.functions.HyperplaneSignature.hyperplaneSignature
    val sig = df.select(hyperplaneSignature(col("b"),
      Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))).as("s")).head()
    assert(sig.isNullAt(0), "mismatched vector must get no LSH signature")
  }

  test("a degenerate (zero-norm) centroid ranks LAST, never first: NaN " +
      "cosine maps to -inf in the top-k insertion") {
    import graft.functions.NearestCentroids.nearestCentroids
    val centroids = Array(
      Array(0.0, 0.0), // zero-norm: cosine NaN against anything
      Array(1.0, 0.0),
      Array(0.0, 1.0))
    val df = spark.sql("SELECT array(CAST(0.9 AS FLOAT), CAST(0.1 AS FLOAT)) AS v")
    val cells = df.select(nearestCentroids(col("v"), centroids, 3).as("c"))
      .head().getSeq[Int](0)
    assert(cells == Seq(1, 2, 0),
      s"zero centroid must sort last, got $cells")
  }
}
