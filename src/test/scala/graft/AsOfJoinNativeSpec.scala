package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps
import graft.plans.AsOfJoinNative

/** Specs for the native as-of operator (custom LogicalPlan + Strategy +
  * SparkPlan). Value-level verification is the DuckDB ASOF oracle at the
  * gate (`ev_asof_native`); these pin the physical shape and the edge
  * semantics against both a hand fixture and the composed formulation.
  */
class AsOfJoinNativeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def t(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("edge semantics: equal-ts matches (<=), no-prior-row yields nulls, " +
      "matches never cross keys") {
    val left = Seq((1L, t(10), "a"), (1L, t(20), "b"), (2L, t(10), "c"),
      (3L, t(30), "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, t(10), 100.0), (1L, t(15), 150.0), (2L, t(11), 200.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoinNative.join(left, right, "k", "ts")
      .select("tag", "asof_ts", "asof_v").collect()
      .map(r => r.getString(0) ->
        (Option(r.getTimestamp(1)), Option(r.get(2)))).toMap
    assert(out("a") == (Some(t(10)), Some(100.0)), "equal ts matches")
    assert(out("b") == (Some(t(15)), Some(150.0)), "latest <= wins")
    assert(out("c") == (None, None), "right row is later -> no match")
    assert(out("d") == (None, None), "key 3 has no right rows at all")
  }

  test("native operator agrees row-for-row with the composed union+window " +
      "as-of on the gate tables") {
    val d = TestSpark.sf001
    val composed = EventOps.asOfClickPurchase(spark, d).collect()
    val native = EventOps.asOfClickPurchaseNative(spark, d).collect()
    assert(native.length == composed.length)
    native.zip(composed).foreach { case (n, c) => assert(n == c) }
  }

  test("STRING keys survive the sort iterator's buffer reuse: the " +
      "retained match key must be a deep copy, not a view") {
    // many keys/rows so the sorted right iterator cycles its UnsafeRow
    // buffer between the retain and the compare; with a shallow-retained
    // UTF8String view every group after the first would mismatch
    val left = (0 until 500).map(i => (f"k$i%03d", t(30), i))
      .toDF("k", "ts", "i")
    val right = (0 until 500).map(i => (f"k$i%03d", t(10), i * 10))
      .toDF("k", "ts", "v")
    val out = AsOfJoinNative.join(left, right, "k", "ts")
      .select("i", "asof_v").collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(!r.isNullAt(1) && r.getInt(1) == r.getInt(0) * 10,
        s"row ${r.getInt(0)} matched ${r.get(1)}, want ${r.getInt(0) * 10}")
    }
  }

  test("plans as AsOfJoinExec over key-clustered sorted children — no " +
      "union inflation, no window") {
    val d = TestSpark.sf001
    val p = EventOps.asOfClickPurchaseNative(spark, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), s"native path must not plan a window:\n$p")
    assert(!p.contains("Union"), s"native path must not plan a union:\n$p")
  }
}
