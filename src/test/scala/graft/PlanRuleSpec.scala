package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.YearRangeToTimestampRange

/** Specs for the YearRangeToTimestampRange optimizer rule: same results,
  * and the predicate reaches the parquet scan as a pushable filter.
  */
class PlanRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ YearRangeToTimestampRange
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == YearRangeToTimestampRange)
  }

  private def orders = Tables.orders(spark, TestSpark.sf0001)

  test("year-range predicate becomes a pushed timestamp range") {
    withRule {
      val q = orders
        .filter(year(col("o_orderdate")) >= 1996 &&
          year(col("o_orderdate")) <= 1999)
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("GreaterThanOrEqual(o_orderdate,1996-01-01"),
        s"expected pushed range filter, got:\n$scan")
      assert(scan.contains("LessThan(o_orderdate,"), scan)
    }
  }

  test("rewrite preserves results exactly (vs unrewritten run)") {
    val baseline = orders
      .filter(year(col("o_orderdate")).between(1996, 1999))
      .count()
    val rewritten = withRule {
      orders.filter(year(col("o_orderdate")).between(1996, 1999)).count()
    }
    assert(rewritten === baseline && baseline > 0)
  }

  test("equality and flipped operands rewrite too") {
    withRule {
      val eq = orders.filter(year(col("o_orderdate")) === 1997)
      assert(eq.queryExecution.executedPlan.toString
        .contains("GreaterThanOrEqual(o_orderdate,1997-01-01"))
      val flipped = orders.filter(lit(1999) >= year(col("o_orderdate")))
      assert(flipped.queryExecution.executedPlan.toString
        .contains("LessThan(o_orderdate,"))
      assert(eq.count() ===
        orders.filter(year(col("o_orderdate")) === 1997).count())
    }
  }

  test("non-literal and non-year comparisons are left untouched") {
    withRule {
      val q = orders.filter(year(col("o_orderdate")) >= col("o_orderkey"))
      // no boundary literal could be built; plan still contains year()
      assert(q.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("year"))
    }
  }
}
