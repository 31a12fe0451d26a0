package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Analysis-time type checking of the custom expressions: wrong input
  * types must fail resolution with the expression's own message, not
  * blow up mid-job with a ClassCastException on an executor.
  */
class TypeCheckSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def analysisError(f: => Any): String =
    intercept[AnalysisException](f).getMessage

  test("ShingleHashes rejects non-string arrays") {
    val df = Seq(Seq(1, 2, 3)).toDF("xs")
    val msg = analysisError(
      df.select(graft.functions.ShingleHashes.shingleHashes($"xs", 3))
        .collect())
    assert(msg.contains("shingle_hashes expects array<string>"))
  }

  test("MinHashSignature rejects scalar input") {
    val df = Seq("text").toDF("t")
    val msg = analysisError(
      df.select(graft.functions.MinHashSignature.minhashSignature(
        $"t", 3, Array(1L, 2L))).collect())
    assert(msg.contains("minhash_signature expects array<string>"))
  }

  test("SimHash64 rejects numeric arrays") {
    val df = Seq(Seq(1.0, 2.0)).toDF("xs")
    val msg = analysisError(
      df.select(graft.functions.SimHash64.simhash64($"xs")).collect())
    assert(msg.contains("simhash64 expects array<string>"))
  }

  test("CosineSimilarity rejects string arrays") {
    val df = Seq((Seq("a"), Seq("b"))).toDF("x", "y")
    val msg = analysisError(
      df.select(graft.functions.CosineSimilarity.cosineSim($"x", $"y"))
        .collect())
    assert(msg.toLowerCase.contains("cosine"))
  }

  test("HyperplaneSignature rejects string arrays") {
    val df = Seq(Seq("a")).toDF("xs")
    val msg = analysisError(
      df.select(graft.functions.HyperplaneSignature.hyperplaneSignature(
        $"xs", Array(Array(1.0)))).collect())
    assert(msg.contains("hyperplane_signature expects array<float|double>"))
  }

  test("NearestCentroids rejects non-array input") {
    val df = Seq(1.0).toDF("x")
    val msg = analysisError(
      df.select(graft.functions.NearestCentroids.nearestCentroids(
        $"x", Array(Array(1.0)), 1)).collect())
    assert(msg.contains("nearest_centroids expects array<float|double>"))
  }

  test("QuantizeInt8 rejects string arrays") {
    val df = Seq(Seq("a", "b")).toDF("xs")
    val msg = analysisError(
      df.select(graft.functions.QuantizeInt8.quantizeInt8Compiled($"xs"))
        .collect())
    assert(msg.contains("quantize_int8 expects array<float|double>"))
  }

  test("ExactMedian requires an explicit double (cast guidance in message)") {
    // the Column helper casts for callers; the raw expression enforces
    val df = Seq("x").toDF("s")
    val msg = analysisError {
      val expr = graft.functions.ExactMedian(
        org.apache.spark.sql.graft.ColumnBridge.expression($"s"))
        .toAggregateExpression()
      df.agg(org.apache.spark.sql.graft.ColumnBridge.column(expr)).collect()
    }
    assert(msg.contains("exact_median expects double"))
  }

  test("invalid construction parameters fail fast at build time") {
    intercept[IllegalArgumentException](
      graft.functions.MinHashSignature.minhashSignature(
        lit(Array("a")), 0, Array(1L)))
    intercept[IllegalArgumentException](
      graft.functions.NearestCentroids.nearestCentroids(
        lit(Array(1.0)), Array(Array(1.0)), 5))
  }
}
