package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DedupOps

/** Lifecycle of the engine's persisted dedup/ANN state: every persist is
  * registered with [[Caches]], releasable, and queries still produce
  * identical results after release (they just recompute). The durable
  * variant — materialize the shingle index to parquet, run pair generation
  * from it — round-trips exactly.
  */
class CacheLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("dedup caches register with Caches and release cleanly; " +
      "results identical after release") {
    Caches.releaseAll()
    val before = DedupOps.minhashLshPairs(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSeq
    assert(Caches.size > 0, "minhash ran without registering its cache")
    Caches.releaseAll()
    assert(Caches.size === 0)
    val after = DedupOps.minhashLshPairs(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSeq
    assert(after === before)
    Caches.releaseAll()
  }

  test("shingle index materializes to parquet and feeds pair generation " +
      "identically to the in-session path") {
    val dir = Files.createTempDirectory("graft_idx").toString
    DedupOps.writeShingleIndex(spark, TestSpark.sf0001, 3, s"$dir/idx")
    val fromIdx = DedupOps.ngramJaccardPairsFrom(
        DedupOps.readShingleIndex(spark, s"$dir/idx"))
      .collect().map(_.toSeq).toSeq
    val direct = DedupOps.ngramJaccardPairs(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSeq
    assert(fromIdx === direct && direct.nonEmpty)
    Caches.releaseAll()
  }
}
