package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multi-way join analytics over the full fact chain
  * (customer → orders → lineitem ← supplier/part) — the TPC-H-shaped
  * decision-support workload the reference's star-join queries
  * (`CLEAN:111-208`) gesture at with 2-3 tables, expressed over the
  * deepest fact table in the test set (`lineitem`, 6 M rows/SF).
  *
  * Scale notes (100 TB):
  * - The probe chain shuffles on its natural keys once each:
  *   orders⋈customer on custkey, lineitem⋈orders on orderkey. Catalyst
  *   pushes every filter below its join; AQE re-plans the post-filter
  *   small side into a broadcast when it measures small (the
  *   mktsegment/date filters here cut customer/orders 5-10×).
  * - `nation` broadcasts unconditionally (bounded by geography).
  * - Money math is DECIMAL-stabilized: sums are exact (associative, any
  *   shuffle order), only the final scalar is cast back to double.
  */
object Analytics {

  private def dec(c: String): Column = col(c).cast("decimal(18,2)")
  /** l_extendedprice * (1 - l_discount), exact decimal. */
  private val discPrice: Column =
    dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))

  /** Shipping priority (TPC-H Q3 shape): top-10 unshipped-revenue orders
    * in one segment. Three-table chain; the segment filter reaches the
    * customer scan, the two date filters reach the orders/lineitem scans
    * (parquet min/max prunable), and only then do the joins run.
    */
  def shippingPriority(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Local-supplier volume (TPC-H Q5 shape): revenue per nation from
    * lineitems whose supplier and customer share that nation, one year.
    * Five tables; the c_nationkey = s_nationkey residual rides on the
    * l_suppkey equi-join (no extra shuffle), nation broadcasts.
    */
  def localSupplierVolume(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val l = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val su = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("nation"))
  }

  /** Late-shipment audit (TPC-H Q12 shape): per order priority, lines
    * shipped >90 days after the order date vs total. Integer-exact
    * output; the date arithmetic stays on the join result (can't be
    * pushed below the join — it references both sides).
    */
  def lateLinesByPriority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(
        sum(when(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L)
          .otherwise(0L)).as("late_lines"),
        count(lit(1)).as("total_lines"))
      .orderBy("priority")
  }

  /** Promotion revenue share (TPC-H Q14 shape): fraction of one year's
    * revenue from PROMO-type parts, by ship month. The part dimension
    * broadcasts (bounded catalog vs unbounded facts); the promo flag is
    * folded into a conditional decimal sum — one join, one aggregate.
    */
  def promoRevenueShare(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    val p = Tables.part(s, d).select("p_partkey", "p_type")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(month(col("l_shipdate")).as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", discPrice)
            .otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("promo_revenue"),
        sum(discPrice).cast("double").as("total_revenue"))
      .withColumn("promo_share",
        col("promo_revenue") / col("total_revenue"))
      .orderBy("ship_month")
  }

  /** Customer value tiers (wide-chain rollup): order count, line count,
    * and exact revenue per customer balance tier × order status — the
    * "activity by account health" cut a growth dashboard runs. The tier
    * CASE is computed on the (small) customer side before the join.
    */
  def revenueByTier(s: SparkSession, d: String): DataFrame = {
    val tier = when(col("c_acctbal") < 0, "negative")
      .when(col("c_acctbal") < 5000, "standard")
      .otherwise("premium")
    val c = Tables.customer(s, d).select(col("c_custkey"), tier.as("tier"))
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    val l = Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("tier", "o_orderstatus")
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"),
        sum(discPrice).cast("double").as("revenue"))
      .orderBy("tier", "o_orderstatus")
  }
}
