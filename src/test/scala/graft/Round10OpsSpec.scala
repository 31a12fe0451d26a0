package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

/** Round-10 operators. */
class Round10OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("dauWauMauSketch: audited days' exact columns equal dauWauMau's " +
      "exact counts, every bound flag is TRUE (HLL is near-exact at " +
      "fixture cardinalities), unaudited days carry NULLs, and the day " +
      "set equals the exact form's") {
    val d = TestSpark.sf0001
    val exact = EventOps.dauWauMau(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val sk = EventOps.dauWauMauSketch(spark, d).collect()
    assert(sk.map(_.getLong(0)).toSet === exact.keySet,
      "sketch surface must cover exactly the observed days")
    var audited = 0
    sk.foreach { r =>
      val day = r.getLong(0)
      if (day % 3 == 0) {
        audited += 1
        assert((r.getLong(1), r.getLong(2), r.getLong(3)) === exact(day),
          s"audited day $day exact mismatch")
        assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
          s"bound flag false on day $day")
      } else {
        (1 to 6).foreach(i => assert(r.isNullAt(i),
          s"unaudited day $day must carry NULLs (col $i)"))
      }
    }
    assert(audited > 0, "fixture must contain at least one audited day")
  }

  test("dauWauMauSketch estimates come from the SHARED hourly partials " +
      "artifact (build-once/serve-many), not a private fact re-scan: " +
      "plan reads the staged parquet") {
    val df = EventOps.dauWauMauSketch(spark, TestSpark.sf0001)
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scans.contains("graft_sketch_stages"),
      s"no staged-partials scan in:\n$scans")
  }
}
