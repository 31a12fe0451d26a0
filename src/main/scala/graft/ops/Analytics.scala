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

  /** Order-count distribution (TPC-H Q13 shape): how many customers
    * placed k orders, including k=0 — the left-outer join that a plain
    * groupBy can't express (customers with no orders vanish from an
    * inner join). The priority exclusion lives on the orders side
    * BEFORE the join (same semantics as a join-condition filter, and it
    * prunes the fact scan). Two aggregations: the first shuffles on
    * custkey (the only fact-sized shuffle), the second groups the
    * per-customer counts — at most |distinct counts| rows, trivially
    * re-shuffled. At 100 TB both sides shuffle on custkey once; there
    * is no smaller plan for an outer-join distribution.
    */
  def orderCountDistribution(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select("c_custkey")
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select("o_orderkey", "o_custkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Large-volume orders (TPC-H Q18 shape): orders whose total line
    * quantity clears a threshold, joined back to order/customer detail.
    * The HAVING runs on the pre-join aggregate — the fact table is
    * reduced to qualifying orderkeys (≲6 % here) before any join, so
    * the join-back probes a small filtered set, which AQE broadcasts.
    * Quantity sums are decimal-exact: the threshold compare cannot flip
    * on float accumulation order.
    */
  def largeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum(dec("l_quantity")).as("total_qty_d"))
      .filter(col("total_qty_d") > lit(200).cast("decimal(18,2)"))
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val c = Tables.customer(s, d).select("c_custkey", "c_name")
    o.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        col("total_qty_d").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Disjunctive bracket revenue (TPC-H Q19 shape): revenue from three
    * OR'd (brand × size × quantity) brackets. The part-side disjuncts
    * (brand, size) are pushable per-branch; Catalyst extracts the
    * common `l_quantity <= 30` conjunct and `p_partkey` equi-key, so
    * the join stays a broadcast-hash join with the OR as a residual —
    * not a nested-loop cross product. One fact scan, zero shuffles.
    */
  def disjunctiveRevenue(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
    val brackets =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 10)) ||
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#13" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 30))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey") && brackets)
      .agg(sum(discPrice).cast("double").as("revenue"))
  }

  /** Small-quantity revenue (TPC-H Q17 shape): revenue lost to line
    * items below 20 % of their part's average quantity. The correlated
    * subquery (`avg(l_quantity) WHERE same part`) is decorrelated into
    * one per-part aggregate joined back — the standard Catalyst-friendly
    * rewrite; no per-row re-scan. The 20 %-of-average compare is
    * integer cross-multiplied (5·qty·cnt < Σqty in decimal), so the
    * boundary cannot flip on float division — bit-stable on any engine.
    * Both the aggregate and the join-back read the same brand-pruned
    * slice (broadcast part filter ≪ fact).
    */
  def smallQuantityRevenue(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#7").select("p_partkey")
    val lp = Tables.lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val stats = lp.groupBy(col("l_partkey").as("agg_partkey"))
      .agg(sum(dec("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
    lp.join(stats, col("l_partkey") === col("agg_partkey"))
      .filter(dec("l_quantity") * lit(5) * col("cnt") < col("sum_qty"))
      .agg((sum(dec("l_extendedprice")) / lit(7.0))
        .cast("double").as("avg_yearly"))
  }

  /** Top supplier by period revenue (TPC-H Q15 shape): the supplier(s)
    * whose one-quarter revenue equals the maximum. The scalar max is a
    * 1-row aggregate of the (|suppliers|-sized) revenue table joined
    * back as a broadcast — no window over a single global partition,
    * no driver round-trip. Revenue is decimal-exact so the equality
    * join cannot miss on rounding.
    */
  def topSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(discPrice).as("total_rev_d"))
    val mx = rev.agg(max(col("total_rev_d")).as("max_rev"))
    val su = Tables.supplier(s, d).select("s_suppkey", "s_name")
    rev.join(broadcast(mx), col("total_rev_d") === col("max_rev"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev_d").cast("double").as("total_rev"))
      .orderBy("s_suppkey")
  }

  /** Supplier diversity per part group (TPC-H Q16 shape): distinct
    * suppliers per (brand, type, size) over the observed part–supplier
    * association in the fact table (no partsupp table in this schema),
    * excluding flagged suppliers. The exclusion is a broadcast anti-join
    * applied before any shuffle. No pre-`distinct()` of the pairs: the
    * two-phase distinct aggregate countDistinct expands to dedups
    * (group-keys, suppkey) itself — a separate distinct pass would add a
    * full fact-table shuffle for nothing (Catalyst does not eliminate
    * the redundancy; measured one extra 14 MB/SF exchange).
    */
  def supplierPartCounts(s: SparkSession, d: String): DataFrame = {
    val excluded = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val pairs = Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
    val p = Tables.part(s, d)
      .filter(col("p_type") =!= "PROMO")
      .select("p_partkey", "p_brand", "p_type", "p_size")
    pairs.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc,
        col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Important stock share (TPC-H Q11 shape): parts whose inventory
    * value exceeds 1.25× the average part value. The global scalars
    * (total value, part count) ride in as a broadcast 1-row aggregate;
    * the HAVING compare is decimal cross-multiplied
    * (part_value·n·4 > total·5) so no float division decides
    * membership. The fraction is relative to the average — a fixed
    * share of the grand total (TPC-H's 0.0001/SF) empties as the
    * catalog grows, which is why TPC-H itself scales it. Two
    * aggregations over one fact read (per-part, then global over the
    * |parts|-row result — not a second fact scan).
    */
  def importantStock(s: SparkSession, d: String): DataFrame = {
    val value = (dec("l_extendedprice") * dec("l_quantity")).as("v")
    val perPart = Tables.lineitem(s, d)
      .select(col("l_partkey"), value)
      .groupBy("l_partkey")
      .agg(sum(col("v")).as("part_value_d"))
    val total = perPart.agg(sum(col("part_value_d")).as("total_value"),
      count(lit(1)).as("n_parts"))
    // The cross-multiply must stay inside DECIMAL(38) NOMINAL precision,
    // or Spark's allowPrecisionLoss rounds the product and the membership
    // boundary can diverge from the exact oracle. Bounded-width operands:
    // part_value ≤ 21 int digits (25,4), 4·n_parts ≤ 12 digits — product
    // precision 25+12+1 = 38 exactly, zero loss; likewise (36,4)·(1,0)
    // on the total side. The widths hold to ~1e21 currency units of
    // single-part value / 2.5e11 parts — far past 100 TB; a value beyond
    // them would null the cast (dropped row), not silently round.
    perPart.join(broadcast(total),
        col("part_value_d").cast("decimal(25,4)") *
          (col("n_parts") * lit(4)).cast("decimal(12,0)") >
          col("total_value").cast("decimal(36,4)") *
            lit(5).cast("decimal(1,0)"))
      .select(col("l_partkey").as("p_partkey"),
        col("part_value_d").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
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

  /** RFM customer segmentation (Hughes 1994 — the classic
    * recency/frequency/monetary quintile scoring every CRM and
    * retention pipeline runs): per customer, days since last order
    * (relative to the corpus's max order date, so the op is closed over
    * its input), order count, and DECIMAL-exact lifetime spend, each
    * scored 1–5 against the exact 20/40/60/80th-percentile cutoffs of
    * the metric's distribution.
    *
    * Scale shape: ONE customer-keyed aggregate over orders, then ONE
    * [[graft.functions.ExactQuantiles]] pass (count-map state, 12
    * numbers out) broadcast back as thresholds — no per-metric window,
    * no global ntile sort. Scores are threshold comparisons, so the row
    * is engine-exact; higher is better on every axis (recency scores
    * against the negated-days ordering). The per-customer frame feeds
    * three consumers (anchor, cutoffs, final scoring) and column
    * pruning specializes each subtree, so the plan re-derives it rather
    * than exchange-reusing — at 100 TB materialize `per` once (one
    * orders scan) and the rest touches only |customers| rows.
    */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ExactQuantiles.exactQuantiles
    val per = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("spend_dec"))
    val anchored = per
      .crossJoin(broadcast(per.agg(max(col("last_order")).as("anchor"))))
      .select(col("custkey"),
        datediff(col("anchor"), col("last_order")).cast("long")
          .as("recency_days"),
        col("n_orders"),
        col("spend_dec").cast("double").as("monetary"))
    val pcts = Seq(20, 40, 60, 80)
    val cuts = anchored.agg(
        exactQuantiles(-col("recency_days"), pcts, 100).as("rq"),
        exactQuantiles(col("n_orders"), pcts, 100).as("fq"),
        exactQuantiles(col("monetary"), pcts, 100).as("mq"))
    def score(v: Column, qs: Column): Column =
      (0 until 4).map(i => when(v > qs.getItem(i), 1).otherwise(0))
        .foldLeft(lit(1))(_ + _)
    anchored.crossJoin(broadcast(cuts))
      .select(col("custkey"), col("recency_days"), col("n_orders"),
        col("monetary"),
        score(-col("recency_days"), col("rq")).as("r_score"),
        score(col("n_orders"), col("fq")).as("f_score"),
        score(col("monetary"), col("mq")).as("m_score"))
      .orderBy("custkey")
  }

  /** TPC-H Q21's "suppliers who kept orders waiting" reshaped to the
    * fixture's columns (no receipt/commit dates: late = shipped more
    * than 90 days after the order date): per supplier, the number of
    * multi-supplier orders where THIS supplier shipped late and NO other
    * supplier did. The textbook correlated EXISTS + NOT-EXISTS pair —
    * deliberately decorrelated here into ONE grouped pass over the fact
    * join (per-(order, supplier) late flag → per-order supplier/late
    * counts → filter n_supps ≥ 2 ∧ n_late = 1): at 100 TB the
    * re-expression turns two correlated re-scans of lineitem into one
    * shuffle on l_orderkey, the decorrelation Catalyst itself applies to
    * EXISTS subqueries — written explicitly so the plan is the operator.
    * Late flags are timestamp comparisons (integral — engine-exact).
    */
  def soleLateSupplier(s: SparkSession, d: String): DataFrame = {
    val per = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max((col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("int"))
        .as("late"))
    // per-order supplier/late counts as an UNORDERED window over the
    // per-(order, supplier) pass — not a groupBy + self-join, which
    // would evaluate the fact join twice and add a join shuffle; this
    // form is one extra order-keyed exchange over rows already reduced
    // to (order, supplier) grain
    val byOrder = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey")
    per
      .withColumn("n_supps", count(lit(1)).over(byOrder))
      .withColumn("n_late", sum(col("late")).over(byOrder))
      .filter(col("late") === 1 && col("n_supps") >= 2 &&
        col("n_late") === 1)
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey").as("suppkey"), col("s_name").as("name"))),
        Seq("suppkey"))
      .select("suppkey", "name", "numwait")
      .orderBy(col("numwait").desc, col("suppkey"))
  }

  /** TPC-H Q22's "idle rich customers" on the fixture's columns
    * (c_mktsegment stands in for the phone prefix; "idle" = no URGENT
    * order — every fixture customer has SOME order, so the literal
    * no-orders form would be vacuously empty): customers with no
    * 1-URGENT order (filtered anti-join) whose balance exceeds the
    * average POSITIVE balance (scalar subquery, broadcast back), rolled
    * up per market segment. The average divides a DECIMAL-exact sum —
    * not a float `avg`, whose accumulation order differs between
    * engines — by the count, one exactly-rounded division; the
    * comparison then runs against the identical double on both sides.
    */
  def idleRichCustomers(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val avgPos = c.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
        / count(lit(1))).as("avg_bal"))
    c.join(Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(avgPos))
      .filter(col("c_acctbal") > col("avg_bal"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          .as("total_bal"))
      .orderBy("segment")
  }

  /** Market-basket affinity (support / confidence / lift — the classic
    * association-rule surface, Agrawal & Srikant 1994's counting core):
    * part pairs co-purchased in the same order. Pair generation is a
    * within-order self-join — fan-out bounded by basket size squared
    * (TPC-H baskets are ≤ 7 lines; the `maxBasket` guard drops
    * pathological baskets the way `maxShingleDf` drops hot shingles, so
    * a degenerate giant order can never go quadratic at 100 TB).
    * support/cnt_a/cnt_b/n_orders are pure integer counts; confidence
    * and lift are one exactly-rounded double division each (lift's
    * numerator/denominator stay in LONG: supp·n and cnt_a·cnt_b both
    * ≤ ~2^40 at any realistic scale) — engine-exact.
    */
  def marketBasket(s: SparkSession, d: String, topK: Int = 30,
      maxBasket: Int = 50): DataFrame = {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
    // the guarded basket table feeds FOUR consumers (order count, part
    // counts, both self-join sides) — persist the narrow (okey, part)
    // frame or each consumer re-runs the scan + distinct + window
    // (plan-audited: 10 lineitem scans without it, 2 with). Unlike the
    // span-dedup token arrays (measured cheaper to recompute), this is
    // a REDUCED two-long-column table behind two shuffles — the case
    // executor caching exists for. At 100 TB the same reuse point
    // becomes a parquet materialization (a fact-scale basket table is
    // not executor-cacheable); the stage boundary, not the caching, is
    // the design decision.
    val sized = graft.Caches.register(items
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("okey")))
      .filter(col("bsz") <= maxBasket)
      .select("okey", "part")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nOrders = sized.select("okey").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val perPart = sized.groupBy("part").agg(count(lit(1)).as("cnt"))
    val pairs = sized.as("x")
      .join(sized.as("y"), Seq("okey"))
      .filter(col("x.part") < col("y.part"))
      .groupBy(col("x.part").as("part_a"), col("y.part").as("part_b"))
      .agg(count(lit(1)).as("support"))
    pairs
      .join(perPart.select(col("part").as("part_a"),
        col("cnt").as("cnt_a")), Seq("part_a"))
      .join(perPart.select(col("part").as("part_b"),
        col("cnt").as("cnt_b")), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("support"),
        col("cnt_a"), col("cnt_b"),
        (col("support").cast("double") / col("cnt_a")).as("confidence"),
        ((col("support") * col("n_orders")).cast("double")
          / (col("cnt_a") * col("cnt_b"))).as("lift"))
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }

  /** Pearson correlation per return flag between line quantity and
    * discount — NOT Spark's float `corr` aggregate (its accumulation
    * order is partition-dependent): the five moment sums accumulate in
    * DECIMAL (exact, associative — scaled magnitudes stay far below
    * 2^53 through ~sf100, so the final decimal→double surfacing is
    * exact-input), and the closed-form r evaluates ONCE in double with
    * a fixed operation order both engines share. The moment-sum shape
    * is also the 100 TB shape: one map-side-combinable aggregate, no
    * second pass, no centering sweep.
    */
  def quantityDiscountCorr(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_quantity").cast("decimal(12,2)").as("q"),
      col("l_discount").cast("decimal(12,2)").as("disc"))
    l.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("q")).cast("double").as("sx"),
        sum(col("disc")).cast("double").as("sy"),
        sum(col("q") * col("disc")).cast("double").as("sxy"),
        sum(col("q") * col("q")).cast("double").as("sxx"),
        sum(col("disc") * col("disc")).cast("double").as("syy"))
      .select(col("l_returnflag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy"))
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            * (col("n") * col("syy") - col("sy") * col("sy"))))
          .as("corr_q_disc"))
      .orderBy("l_returnflag")
  }

  /** Year-over-year revenue growth per order priority: DECIMAL-exact
    * yearly revenue, previous year's via a self-join of the tiny
    * (priority, year) grid on `order_year - 1` — NOT `lag`, which would
    * silently pair non-adjacent years across a gap year as
    * "year-over-year"; a missing previous year surfaces as NULL
    * prev/delta/growth instead. One fact shuffle (the groupBy); the
    * self-join touches |priorities|×|years| rows — never the fact table.
    */
  def yoyRevenue(s: SparkSession, d: String): DataFrame = {
    val y = Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("order_year"),
        col("o_orderpriority").as("priority"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_dec"))
    val prev = y.select(col("priority"),
      (col("order_year") + 1).as("order_year"),
      col("rev_dec").as("prev_dec"))
    y.join(prev, Seq("priority", "order_year"), "left")
      .select(col("order_year").cast("long").as("order_year"),
        col("priority"),
        col("rev_dec").cast("double").as("revenue"),
        col("prev_dec").cast("double").as("prev_revenue"),
        (col("rev_dec") - col("prev_dec")).cast("double").as("delta"),
        (col("rev_dec").cast("double") / col("prev_dec").cast("double") -
          1.0).as("growth"))
      .orderBy("priority", "order_year")
  }

  /** Forecast revenue change (TPC-H Q6 shape): revenue that would vanish
    * if mid-band discounts were eliminated in one ship year. Pure
    * scan-filter-aggregate — zero joins, zero shuffles beyond the final
    * single-group reduce; every predicate reaches the parquet scan
    * (timestamp range is row-group min/max prunable, quantity is a plain
    * pushed comparison). The discount band compares on DECIMAL(18,2) so
    * the fixture's binary doubles (0.05 step 0.01) bucket identically in
    * Spark and DuckDB.
    */
  def forecastRevenueChange(s: SparkSession, d: String): DataFrame = {
    val lo = lit("0.05").cast("decimal(18,2)")
    val hi = lit("0.07").cast("decimal(18,2)")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_quantity") < 24)
      .filter(dec("l_discount") >= lo && dec("l_discount") <= hi)
      .agg(
        sum(dec("l_extendedprice") * dec("l_discount")).cast("double")
          .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Bilateral trade volume (TPC-H Q7 shape): revenue shipped between two
    * named nations, both directions, by ship year. The nation filter is
    * applied to BOTH bounded dimensions before any fact join: supplier
    * pre-joins its (broadcast) nation slice, customer likewise, so the
    * fact chain only carries rows whose supplier already sits in one of
    * the two nations — at 100 TB that's a ~|2/25| selectivity delivered
    * by broadcast semi-join, not a post-join filter. One fact shuffle
    * (lineitem ⋈ orders on orderkey); the cross-nation direction filter
    * is a residual on bounded string columns.
    */
  def nationTradeVolume(s: SparkSession, d: String,
      nationA: String = "NATION_3", nationB: String = "NATION_7"): DataFrame = {
    // equal arguments would make both direction predicates identical
    // (supp==cust==A) — self-trade rows, not bilateral trade
    require(nationA != nationB,
      s"nationTradeVolume needs two distinct nations, got $nationA twice")
    val pair = Seq(nationA, nationB)
    val n = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
      .select("n_nationkey", "n_name")
    val su = Tables.supplier(s, d)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c = Tables.customer(s, d)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(c, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "cust_nation")
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === nationA &&
               col("cust_nation") === nationB) ||
              (col("supp_nation") === nationB &&
               col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  /** National market share (TPC-H Q8 shape): one supplier nation's share
    * of a part-type market inside one customer region, by order year.
    * Part and supplier slices broadcast (bounded catalogs); the region
    * membership cut reaches customer via a broadcast of the region's
    * nation keys. Share = exact-decimal numerator / exact-decimal
    * denominator, divided ONCE in double — never a float aggregate.
    */
  def marketShare(s: SparkSession, d: String,
      regionName: String = "ASIA", typePrefix: String = "ECONOMY",
      shareNation: String = "NATION_5"): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === regionName)
      .select("r_regionkey")
    val nR = Tables.nation(s, d)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val c = Tables.customer(s, d)
      .join(broadcast(nR), col("c_nationkey") === col("n_nationkey"),
        "left_semi")
      .select("c_custkey")
    val o = Tables.orders(s, d)
      // Q8's two-year market window — stat-prunable at the orders scan;
      // without it the share would silently aggregate every fixture year
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .join(c, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate")
    val p = Tables.part(s, d).filter(col("p_type").startsWith(typePrefix))
      .select("p_partkey")
    val sn = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val zero = lit("0").cast("decimal(18,2)")
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === shareNation, discPrice)
          .otherwise(zero)).as("num_dec"),
        sum(discPrice).as("den_dec"))
      .select(col("o_year"),
        // zero-denominator guard: Spark's double x/0 is NULL while
        // DuckDB's IEEE division yields inf — NULL on both via when/nullif
        when(col("den_dec") =!= zero,
          col("num_dec").cast("double") / col("den_dec").cast("double"))
          .as("mkt_share"),
        col("den_dec").cast("double").as("total_volume"))
      .orderBy("o_year")
  }

  /** Product-type profit (TPC-H Q9 shape, adapted: this schema has no
    * partsupp, so supply cost is the catalog retail price —
    * profit = discounted revenue − p_retailprice × quantity; the year is
    * the SHIP year, which keeps the plan at one fact pass with zero
    * orders join). Part and supplier+nation broadcast; the only shuffle
    * is the (nation, year) groupBy. All money math in exact DECIMAL,
    * surfaced to double once.
    */
  def productProfit(s: SparkSession, d: String,
      nameContains: String = "widget"): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_name").contains(nameContains))
      .select("p_partkey", "p_retailprice")
    val sn = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val amount = discPrice - dec("p_retailprice") * dec("l_quantity")
    Tables.lineitem(s, d)
      .select("l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount", "l_quantity")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(sum(amount).cast("double").as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("ship_year").desc)
  }

  /** Returned-item revenue (TPC-H Q10 shape): top-20 customers by revenue
    * lost to returns in one quarter. Aggregates BEFORE joining customer —
    * the fact chain reduces to a customer-keyed aggregate first, so the
    * customer join input is |customers-with-returns|, not |lineitems|
    * (at 100 TB that ordering is the difference between joining 10^9 and
    * 10^12 rows). Nation broadcasts; final top-20 is a
    * TakeOrderedAndProject (no global sort materialization).
    */
  def returnedItemRevenue(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val rev = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(discPrice).as("rev_dec"))
    rev.join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("rev_dec").cast("double").as("revenue"),
        col("c_acctbal").as("acctbal"), col("n_name").as("nation"))
      .orderBy(col("revenue").desc, col("custkey"))
      .limit(20)
  }

  /** Min-cost supplier (TPC-H Q2 shape, adapted: this schema has no
    * partsupp supply catalog, so the OBSERVED trade plays it — a
    * (part, supplier)'s offer is its minimum sale `l_extendedprice`,
    * DECIMAL-exact): for parts of one size, among suppliers of one
    * region, pick per part the cheapest offer (deterministic
    * (offer, suppkey) tiebreak) and surface the supplier's details,
    * richest first — Q2's correlated MIN subquery decorrelated into a
    * per-(part, supplier) aggregate + rank-1 window, the same
    * decorrelation Catalyst applies to the subquery form. Scale shape:
    * ONE fact shuffle (the (partkey, suppkey) aggregate); the region's
    * supplier list broadcasts into the window input, and the part-side
    * filter broadcasts onto the (tiny) rank-1 survivors — the fact
    * table never joins a second time.
    */
  def minCostSupplier(s: SparkSession, d: String,
      region: String = "EUROPE", size: Int = 10): DataFrame = {
    val rs = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val offers = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("price")).as("offer"))
      .join(broadcast(rs), col("l_suppkey") === col("s_suppkey"))
    val byPart = org.apache.spark.sql.expressions.Window
      .partitionBy("l_partkey")
      .orderBy(col("offer"), col("l_suppkey"))
    offers
      .withColumn("rn", row_number().over(byPart))
      .filter(col("rn") === 1)
      .join(Tables.part(s, d).filter(col("p_size") === size)
          .select("p_partkey", "p_name"),
        col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal").as("acctbal"), col("s_name").as("supp_name"),
        col("n_name").as("nation"), col("p_partkey").as("partkey"),
        col("p_name").as("part_name"),
        col("offer").cast("double").as("offer"))
      .orderBy(col("acctbal").desc, col("nation"), col("supp_name"),
        col("partkey"))
      .limit(100)
  }

  /** Order-priority checking (TPC-H Q4 shape, on this schema's columns —
    * late = a line shipped more than 90 days after the order date, the
    * [[lateLinesByPriority]]/[[soleLateSupplier]] convention): orders
    * placed in one quarter with AT LEAST ONE late line, counted per
    * priority. Q4's correlated EXISTS decorrelated into one grouped
    * pass over the order⋈lineitem join (per-order any-late flag →
    * filter → priority count): the quarter filter prunes the orders
    * scan (stat-prunable) and flows into the join, so the shuffled
    * fact slice is one quarter's lines — never a second lineitem scan.
    */
  def priorityWaitingOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-04-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderpriority")
      .agg(max((col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("int"))
        .as("any_late"))
      .filter(col("any_late") === 1)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("priority")
}
