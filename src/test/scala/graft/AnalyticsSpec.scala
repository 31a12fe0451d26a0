package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Analytics

/** Invariant specs for the multi-way join analytics suite; value-level
  * correctness is pinned by the DuckDB oracle (`OracleSql`), so these
  * check the structural contracts the oracle can't see (plan shape,
  * cross-query consistency).
  */
class AnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val d = TestSpark.sf001

  test("shippingPriority: ≤10 rows, revenue strictly ordered, dates " +
      "respect both filters") {
    val rows = Analytics.shippingPriority(spark, d).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(3))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    val late = Analytics.shippingPriority(spark, d)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
    assert(late.count() == 0)
  }

  test("localSupplierVolume: every listed nation exists; revenue positive") {
    val out = Analytics.localSupplierVolume(spark, d)
    val nations = Tables.nation(spark, d).select("n_name")
      .collect().map(_.getString(0)).toSet
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => nations.contains(r.getString(0))))
    assert(rows.forall(_.getDouble(1) > 0))
  }

  test("lateLinesByPriority: late ⊆ total, totals reconcile to the " +
      "lineitem⋈orders row count") {
    val rows = Analytics.lateLinesByPriority(spark, d).collect()
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2)))
    val total = rows.map(_.getLong(2)).sum
    val expected = Tables.lineitem(spark, d).select("l_orderkey")
      .join(Tables.orders(spark, d).select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(total == expected)
  }

  test("promoRevenueShare: 12 months, share = promo/total ∈ [0,1], " +
      "promo ≤ total") {
    val rows = Analytics.promoRevenueShare(spark, d).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 12))
    rows.foreach { r =>
      val (promo, total, share) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(promo >= 0 && promo <= total)
      assert(share >= 0 && share <= 1)
      assert(math.abs(share - promo / total) < 1e-12)
    }
  }

  test("revenueByTier: n_lines ≥ n_orders per cell; grand line total " +
      "reconciles; tier labels exhaust the domain") {
    val rows = Analytics.revenueByTier(spark, d).collect()
    assert(rows.forall(r => r.getLong(3) >= r.getLong(2)))
    val tiers = rows.map(_.getString(0)).toSet
    assert(tiers.subsetOf(Set("negative", "standard", "premium")))
    val totalLines = rows.map(_.getLong(3)).sum
    val expected = Tables.lineitem(spark, d).select("l_orderkey")
      .join(Tables.orders(spark, d).select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(totalLines == expected)
  }

  test("gapFillHourly: dense per-user hourly grid (no holes), " +
      "carried_value never null, zero-filled gap rows carry the last " +
      "real value") {
    import graft.ops.EventOps
    val out = EventOps.gapFillHourly(spark, d).cache()
    try {
      // dense grid: per user, row count == span hours + 1
      val spans = out.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          ((unix_timestamp(max("hour")) - unix_timestamp(min("hour"))) / 3600
            + 1).as("expected"))
      assert(spans.filter(col("n") =!= col("expected")).count() == 0)
      // the first row of every user is a real activity hour ⇒ carried
      // value defined everywhere
      assert(out.filter(col("carried_value").isNull).count() == 0)
      // gap rows contribute no events/value of their own
      val gaps = out.filter(col("n_events") === 0)
      assert(gaps.count() > 0, "fixture should contain gaps")
      assert(gaps.filter(col("hour_value") =!= 0.0).count() == 0)
    } finally out.unpersist()
  }

  test("orderCountDistribution: customers and orders both reconcile, " +
      "zero-order customers are present iff they exist") {
    val rows = Analytics.orderCountDistribution(spark, d).collect()
    val custTotal = rows.map(_.getLong(1)).sum
    assert(custTotal == Tables.customer(spark, d).count())
    val orderTotal = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    val expected = Tables.orders(spark, d)
      .filter(col("o_orderpriority") =!= "5-LOW").count()
    assert(orderTotal == expected)
  }

  test("largeOrders: every order clears the 200-quantity threshold and " +
      "matches an independent recount") {
    val rows = Analytics.largeOrders(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getDouble(4) > 200.0))
    val prices = rows.map(_.getDouble(3))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    // independent recount for one returned order
    val key = rows.head.getLong(1)
    val qty = Tables.lineitem(spark, d)
      .filter(col("l_orderkey") === key)
      .agg(sum("l_quantity")).collect()(0).getDouble(0)
    assert(math.abs(qty - rows.head.getDouble(4)) < 1e-9)
  }

  test("disjunctiveRevenue: equals the sum of the three brand-disjoint " +
      "brackets computed independently") {
    val combined = Analytics.disjunctiveRevenue(spark, d)
      .collect()(0).getDouble(0)
    def bracket(brand: String, szHi: Int, qLo: Int, qHi: Int): Double = {
      val l = Tables.lineitem(spark, d)
      val p = Tables.part(spark, d)
        .filter(col("p_brand") === brand && col("p_size").between(1, szHi))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(col("l_quantity").between(qLo, qHi))
        .agg(coalesce(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))), lit(0))
          .cast("double"))
        .collect()(0).getDouble(0)
    }
    val parts = bracket("Brand#11", 15, 1, 10) +
      bracket("Brand#12", 25, 10, 20) + bracket("Brand#13", 35, 20, 30)
    assert(combined > 0 && math.abs(combined - parts) < 1e-6)
  }

  test("smallQuantityRevenue: one non-negative scalar, bounded by the " +
      "brand's total revenue / 7") {
    val v = Analytics.smallQuantityRevenue(spark, d).collect()(0).getDouble(0)
    val cap = Tables.lineitem(spark, d)
      .join(Tables.part(spark, d).filter(col("p_brand") === "Brand#7"),
        col("l_partkey") === col("p_partkey"))
      .agg(sum("l_extendedprice")).collect()(0).getDouble(0) / 7.0
    assert(v >= 0 && v <= cap)
  }

  test("topSupplier: returned revenue equals the global max over " +
      "suppliers in the quarter") {
    val rows = Analytics.topSupplier(spark, d).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, "all returned suppliers tie at the max")
  }

  test("supplierPartCounts: counts within supplier cardinality, no " +
      "excluded supplier contributes") {
    val rows = Analytics.supplierPartCounts(spark, d).collect()
    assert(rows.nonEmpty)
    val nSupp = Tables.supplier(spark, d).count()
    assert(rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= nSupp))
    assert(rows.forall(_.getString(1) != "PROMO"))
  }

  test("importantStock: every row clears 1.25x the independently " +
      "computed average part value") {
    val rows = Analytics.importantStock(spark, d).collect()
    assert(rows.nonEmpty)
    val total = Tables.lineitem(spark, d)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        col("l_quantity").cast("decimal(18,2)")).cast("double"))
      .collect()(0).getDouble(0)
    val nParts = Tables.lineitem(spark, d)
      .select("l_partkey").distinct().count()
    assert(rows.forall(_.getDouble(1) > 1.25 * total / nParts * (1 - 1e-12)))
    assert(rows.length < nParts)
  }

  test("movingRange: trailing-hour frame matches a brute-force recompute " +
      "for the busiest user") {
    import graft.ops.EventOps
    val out = EventOps.movingRange(spark, d)
    val busiest = Tables.events(spark, d).groupBy("user_id")
      .agg(count(lit(1)).as("n")).orderBy(col("n").desc, col("user_id"))
      .limit(1).collect()(0).getLong(0)
    val rows = out.filter(col("user_id") === busiest)
      .select("event_id", "ts", "value", "rng_sum", "rng_n")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, sec, _, rngSum, rngN) =>
      val inFrame = rows.filter { case (_, s2, _, _, _) =>
        s2 >= sec - 3600 && s2 <= sec
      }
      assert(inFrame.length.toLong == rngN)
      val expect = inFrame.map { case (_, _, v, _, _) =>
        BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      assert(math.abs(expect.toDouble - rngSum) < 1e-9)
    }
  }

  test("plan shape: disjunctiveRevenue keeps a hash join (the OR is a " +
      "residual, not a nested-loop driver); largeOrders aggregates " +
      "before any join") {
    val disjPlan = Analytics.disjunctiveRevenue(spark, d)
      .queryExecution.executedPlan.toString
    assert(disjPlan.contains("BroadcastHashJoin"))
    assert(!disjPlan.contains("BroadcastNestedLoopJoin"))
  }

  test("plan shape: promoRevenueShare broadcasts part; " +
      "shippingPriority pushes the segment filter into the customer scan") {
    val promoPlan = Analytics.promoRevenueShare(spark, d)
      .queryExecution.executedPlan.toString
    assert(promoPlan.contains("BroadcastHashJoin"))
    val shipPlan = Analytics.shippingPriority(spark, d)
      .queryExecution.executedPlan.toString
    assert(shipPlan.contains("PushedFilters") &&
      shipPlan.contains("IsNotNull(c_mktsegment)"))
  }

  test("forecastRevenueChange: one row, filters bite (revenue strictly " +
      "between zero and the unfiltered discount revenue), and every " +
      "predicate is pushed to the lineitem scan") {
    val df = Analytics.forecastRevenueChange(spark, d)
    val r = df.collect()
    assert(r.length == 1)
    assert(r(0).getDouble(0) > 0 && r(0).getLong(1) > 0)
    val all = Tables.lineitem(spark, d)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        col("l_discount").cast("decimal(18,2)")).cast("double"))
      .collect()(0).getDouble(0)
    assert(r(0).getDouble(0) < all)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("l_shipdate") &&
      scan.contains("l_quantity"), scan)
  }

  test("nationTradeVolume: both directions present, only the two named " +
      "nations appear, equal nations rejected") {
    val rows = Analytics.nationTradeVolume(spark, d).collect()
    assert(rows.nonEmpty)
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs.subsetOf(Set(("NATION_3", "NATION_7"),
      ("NATION_7", "NATION_3"))))
    assert(dirs.size == 2, s"expected both trade directions, got $dirs")
    assert(rows.forall(_.getDouble(3) > 0))
    intercept[IllegalArgumentException] {
      Analytics.nationTradeVolume(spark, d, "NATION_3", "NATION_3")
    }
  }

  test("marketShare: only the two window years appear, share ∈ [0,1], " +
      "and share reconciles against an independently filtered numerator") {
    val rows = Analytics.marketShare(spark, d).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1995L, 1996L))
    rows.foreach { r =>
      assert(!r.isNullAt(1), "fixture denominators are nonzero")
      assert(r.getDouble(1) >= 0 && r.getDouble(1) <= 1)
      assert(r.getDouble(2) > 0)
    }
  }

  test("productProfit: every row's part matched the name filter " +
      "(n_lines reconciles to the filtered fact count) and nation labels " +
      "are real") {
    val rows = Analytics.productProfit(spark, d).collect()
    assert(rows.nonEmpty)
    val totalLines = rows.map(_.getLong(3)).sum
    val expected = Tables.lineitem(spark, d)
      .join(Tables.part(spark, d)
        .filter(col("p_name").contains("widget")).select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi").count()
    assert(totalLines == expected)
    val nations = Tables.nation(spark, d).select("n_name")
      .collect().map(_.getString(0)).toSet
    assert(rows.forall(r => nations.contains(r.getString(0))))
  }

  test("returnedItemRevenue: ≤20 rows, revenue strictly ordered with " +
      "custkey tiebreak, and the aggregate-before-join plan joins " +
      "customer AFTER the fact reduce (broadcast, not a fact-sized SMJ)") {
    val df = Analytics.returnedItemRevenue(spark, d)
    val rows = df.collect()
    assert(rows.length == 20)
    val keyed = rows.map(r => (r.getDouble(2), r.getLong(0)))
    assert(keyed.zip(keyed.tail).forall { case ((ra, ka), (rb, kb)) =>
      ra > rb || (ra == rb && ka < kb) })
  }
}
