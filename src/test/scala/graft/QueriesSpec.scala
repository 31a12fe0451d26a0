package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Queries

/** Sanity specs for the 9 analytics queries at sf0.001. Full value-level
  * verification is the DuckDB oracle gate (tools/oracle_check.py); these
  * specs pin the structural invariants that survive data regeneration.
  */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._
  private val d = TestSpark.sf0001

  test("entry smoke: flagship query returns rows with expected columns") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq ===
      Seq("country", "category", "category_count"))
    assert(df.count() > 0)
  }

  test("every queries entry runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, d).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracleSql key has a queries twin") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("q3: exactly one top poster per country") {
    val df = Queries.q3TopPosterPerCountry(spark, d)
    val dup = df.groupBy("country").count().filter($"count" > 1).count()
    assert(dup === 0)
  }

  test("q4: single global winner, consistent with q3's max") {
    val q3 = Queries.q3TopPosterPerCountry(spark, d)
    val q4 = Queries.q4TopCountry(spark, d).collect()
    assert(q4.length === 1)
    val maxFollowers = q3.agg(org.apache.spark.sql.functions
      .max($"follower_count")).head().getDouble(0)
    assert(q4.head.getDouble(1) === maxFollowers)
  }

  test("q6: deterministic lower-median is a member of each group") {
    val med = Queries.q6MedianFollowerByGroup(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val groups = Tables.customer(spark, d)
      .select(Queries.acctbalBucket($"c_acctbal").as("g"),
        $"c_acctbal").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSet)
    med.foreach { case (g, m) =>
      assert(groups(g).contains(m), s"median of $g not a group member")
    }
  }

  test("q6 approx median is close to exact lower-median") {
    val exact = Queries.q6MedianFollowerByGroup(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = Queries.q6MedianApprox(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.keySet.foreach { g =>
      assert(math.abs(exact(g) - approx(g)) <= math.abs(exact(g)) * 0.05 + 50,
        s"approx median far from exact for $g")
    }
  }

  test("q2 year-range filter is a strict subset of all orders") {
    val filtered = Queries.q2CategoryPerYear(spark, d)
      .agg(org.apache.spark.sql.functions.sum($"category_count"))
      .head().getLong(0)
    val all = Tables.orders(spark, d).count()
    assert(filtered > 0 && filtered < all)
  }

  test("binned range join ≡ naive BETWEEN join, without the " +
      "nested-loop plan") {
    import org.apache.spark.sql.functions._
    val binned = ops.Relational.rangeJoinBinned(spark, d)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"binned range join degenerated to a nested loop:\n$plan")
    // reference: the declarative theta-join formulation (plans as BNLJ —
    // correct but quadratic; fine at spec scale)
    val ship = Tables.lineitem(spark, d)
      .select(to_date(col("l_shipdate")).as("ship_date")).distinct()
    val ord = Tables.orders(spark, d)
      .select(to_date(col("o_orderdate")).as("s"))
    val naive = ship.join(ord,
        col("ship_date") >= col("s") &&
          col("ship_date") <= date_add(col("s"), 6))
      .groupBy("ship_date").agg(count(lit(1)).as("n_covering"))
      .select(col("ship_date").cast("timestamp").as("ship_date"),
        col("n_covering"))
    val a = binned.collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    val b = naive.collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }
}
