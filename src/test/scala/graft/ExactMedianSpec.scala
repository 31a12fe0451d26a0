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

  test("ExactQuantile at 50/100 ≡ ExactMedian; rank rule on known sets") {
    import graft.functions.ExactQuantile.exactQuantile
    // 1..10: q25 -> rank ceil(2.5)=3 -> 3.0; q50 -> rank 5 -> 5.0;
    // q75 -> rank ceil(7.5)=8 -> 8.0; q95 -> rank ceil(9.5)=10 -> 10.0
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "v")
    val row = df.groupBy("g").agg(
      exactQuantile($"v", 25, 100).as("p25"),
      exactQuantile($"v", 50, 100).as("p50"),
      exactQuantile($"v", 75, 100).as("p75"),
      exactQuantile($"v", 95, 100).as("p95")).collect()(0)
    assert((row.getDouble(1), row.getDouble(2), row.getDouble(3),
      row.getDouble(4)) === ((3.0, 5.0, 8.0, 10.0)))
    // the float-boundary case the integer rank rule exists for:
    // n = 40, q = 95/100 -> 0.95·40 = 38 exactly; double math gives
    // 38.000000000000007 whose ceil is 39. Integer rule: (95·40+99)/100 = 38.
    val df40 = (1 to 40).map(i => ("g", i.toDouble)).toDF("g", "v")
    val p95 = df40.groupBy("g")
      .agg(exactQuantile($"v", 95, 100).as("p95")).collect()(0).getDouble(1)
    assert(p95 === 38.0)
  }

  test("ExactQuantile 50/100 equals ExactMedian on real grouped data") {
    import graft.functions.ExactQuantile.exactQuantile
    val base = graft.Tables.events(spark, TestSpark.sf001)
      .select($"event_type", $"value")
    val med = base.groupBy("event_type").agg(exactMedian($"value").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val q50 = base.groupBy("event_type")
      .agg(exactQuantile($"value", 50, 100).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(q50 === med)
  }

  test("ExactQuantiles (shared map) ≡ independent ExactQuantile calls " +
      "on real grouped data, any request order") {
    import graft.functions.ExactQuantile.exactQuantile
    import graft.functions.ExactQuantiles.exactQuantiles
    val base = graft.Tables.events(spark, TestSpark.sf001)
      .select($"event_type", $"value")
    val singles = base.groupBy("event_type")
      .agg(exactQuantile($"value", 25, 100).as("a"),
        exactQuantile($"value", 95, 100).as("b"),
        exactQuantile($"value", 50, 100).as("c"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // deliberately unsorted request order: output slots must track input
    val multi = base.groupBy("event_type")
      .agg(exactQuantiles($"value", Seq(25, 95, 50), 100).as("qs"))
      .collect()
      .map { r =>
        val a = r.getSeq[Double](1)
        r.getString(0) -> ((a(0), a(1), a(2)))
      }.toMap
    assert(multi === singles)
  }

  test("ExactQuantiles: empty group is NULL; all-null group is NULL") {
    import graft.functions.ExactQuantiles.exactQuantiles
    val df = Seq(("a", Option(1.0)), ("b", Option.empty[Double]))
      .toDF("g", "v")
    val rows = df.groupBy("g")
      .agg(exactQuantiles($"v", Seq(50, 95), 100).as("qs"))
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(rows === Map("a" -> false, "b" -> true))
  }

  test("valueOutliers: IQR fence flags exactly the planted outliers") {
    import graft.ops.EventOps
    // 1..20 with two planted extremes (±100). Sorted: -100, 1..20, 100.
    // n=22: q25 rank ceil(5.5)=6 -> 5.0; q75 rank ceil(16.5)=17 -> 16.0.
    // IQR=11 -> fences [-11.5, 32.5] -> only ±100 are outside.
    val df = ((1 to 20).map(_.toDouble) ++ Seq(100.0, -100.0))
      .map(("click", _)).toDF("event_type", "value")
    import graft.functions.ExactQuantile.exactQuantile
    val fences = df.groupBy("event_type")
      .agg(exactQuantile($"value", 25, 100).as("p25"),
        exactQuantile($"value", 75, 100).as("p75")).collect()(0)
    assert(fences.getDouble(1) === 5.0 && fences.getDouble(2) === 16.0)
    val out = df.join(
      broadcast(df.groupBy("event_type")
        .agg(exactQuantile($"value", 25, 100).as("p25"),
          exactQuantile($"value", 75, 100).as("p75"))
        .select($"event_type",
          ($"p25" - ($"p75" - $"p25") * 1.5).as("lo"),
          ($"p75" + ($"p75" - $"p25") * 1.5).as("hi"))),
      Seq("event_type"))
      .filter($"value" < $"lo" || $"value" > $"hi")
      .select("value").collect().map(_.getDouble(0)).toSet
    assert(out === Set(100.0, -100.0))
  }

  test("ExactQuantile merge-stability and null semantics") {
    import graft.functions.ExactQuantile.exactQuantile
    val df = spark.range(0, 9973)
      .select((col("id") % 5).as("g"), (col("id") % 257).cast("double").as("v"))
    val many = df.repartition(32).groupBy("g")
      .agg(exactQuantile($"v", 95, 100).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val one = df.coalesce(1).groupBy("g")
      .agg(exactQuantile($"v", 95, 100).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(many === one)
    val nulls = Seq(("a", Some(1.0)), ("a", None), ("b", None))
      .toDF("g", "v").groupBy("g")
      .agg(exactQuantile($"v", 75, 100).as("q"))
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(nulls === Map("a" -> Some(1.0), "b" -> None))
  }
}
