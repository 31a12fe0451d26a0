package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

/** Z-order clustering: the multi-dimensional data-skipping contract.
  * A file layout clustered on the Morton key of (user_id, value) must
  * prune files for a predicate on EITHER dimension, where a linear
  * user_id sort prunes only user_id predicates.
  */
class ZorderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val d = TestSpark.sf001
  private val files = 16

  private def survivingFiles(path: String, pred: org.apache.spark.sql.Column): Long =
    spark.read.parquet(path).filter(pred)
      .select(input_file_name()).distinct().count()

  test("zorderWrite: lossless, and a second-dimension box predicate " +
      "reads fewer files than a linear first-dimension sort") {
    val src = Tables.events(spark, d)
      .select("event_id", "user_id", "value")
    val tmp = Files.createTempDirectory("zorder").toString
    val zPath = s"$tmp/z"
    val linPath = s"$tmp/lin"

    Sinks.zorderWrite(src, zPath, "user_id", "value", files)
    src.repartitionByRange(files, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(linPath)

    // lossless: same rows come back
    assert(spark.read.parquet(zPath).count() == src.count())

    // a narrow box on `value` (the NON-sorted dim of the linear layout)
    val (lo, hi) = {
      val r = src.agg(min("value"), max("value")).head
      val (mn, mx) = (r.getDouble(0), r.getDouble(1))
      (mn + (mx - mn) * 0.45, mn + (mx - mn) * 0.55)
    }
    val pred = col("value") >= lo && col("value") <= hi
    val zFiles = survivingFiles(zPath, pred)
    val linFiles = survivingFiles(linPath, pred)
    // the linear layout spreads every value range across ~all files;
    // the z-ordered layout confines it
    assert(zFiles < linFiles,
      s"z-order did not skip: z=$zFiles linear=$linFiles of $files")
    assert(zFiles <= files / 2,
      s"z-order box pruning too weak: $zFiles of $files files")

    // and the first dimension still prunes too (both layouts cluster it)
    val (ulo, uhi) = {
      val r = src.agg(min("user_id"), max("user_id")).head
      (r.getLong(0), r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 10)
    }
    val uPred = col("user_id").between(ulo, uhi)
    assert(survivingFiles(zPath, uPred) < files)
  }

  test("mortonKey: deterministic, non-negative, and monotone-compatible " +
      "(equal inputs ⇒ equal keys)") {
    val src = Tables.events(spark, d).select("event_id", "user_id", "value")
    val k1 = Sinks.mortonKey(src, "user_id", "value")
      .select("event_id", "zkey").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k2 = Sinks.mortonKey(src, "user_id", "value")
      .select("event_id", "zkey").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k1 == k2)
    assert(k1.values.forall(_ >= 0))
  }
}
