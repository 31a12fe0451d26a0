package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ExactMedian.exactMedian
import graft.ops.Queries

/** The count-map TypedImperativeAggregate must reproduce the window
  * lower-median bit-for-bit, survive partial/final merge across many
  * partitions, and follow SQL null semantics.
  */
class ExactMedianSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("matches the window lower-median on real data (odd and even groups)") {
    val window = Queries.q6MedianFollowerByGroup(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val agg = Queries.q6MedianExactAgg(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(agg === window)
  }

  test("lower-median convention on tiny groups, incl. duplicates") {
    val df = Seq(
      ("odd", 3.0), ("odd", 1.0), ("odd", 2.0),
      ("even", 1.0), ("even", 2.0), ("even", 3.0), ("even", 4.0),
      ("dup", 5.0), ("dup", 5.0), ("dup", 1.0), ("dup", 9.0),
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(exactMedian($"v").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // even group of 4: rank floor((4+1)/2) = 2 -> 2.0 (lower median)
    assert(out === Map("odd" -> 2.0, "even" -> 2.0, "dup" -> 5.0))
  }

  test("ignores NULLs; all-NULL group evaluates to NULL") {
    val df = Seq(
      ("a", Some(10.0)), ("a", None), ("a", Some(30.0)),
      ("b", None), ("b", None),
    ).toDF("g", "v")
    val rows = df.groupBy("g").agg(exactMedian($"v").as("m"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows === Map("a" -> Some(10.0), "b" -> None))
  }

  test("partial/final merge across many partitions agrees with single partition") {
    val df = spark.range(0, 10001)
      .select((col("id") % 7).as("g"), (col("id") % 101).cast("double").as("v"))
    val many = df.repartition(32).groupBy("g").agg(exactMedian($"v").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val one = df.coalesce(1).groupBy("g").agg(exactMedian($"v").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(many === one)
  }
}
