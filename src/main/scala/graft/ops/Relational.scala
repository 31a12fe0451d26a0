package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Generalized relational operator coverage beyond the reference's surface
  * (SURVEY.md §2.4 note: the reference only ever runs inner equi-joins; an
  * engine with "the same capabilities" must still expose the full join /
  * set-op / generator algebra, so each family gets one oracled query).
  *
  * Scale notes: nation/region joins are broadcast; the orders⋈customer
  * shapes shuffle on the natural key. Set ops are implemented with
  * Spark's native union/intersect/except (shuffle-dedup where SQL
  * semantics require DISTINCT).
  */
object Relational {

  /** LEFT SEMI — customers that have at least one open order (EXISTS). */
  def semiJoin(s: SparkSession, d: String): DataFrame = {
    val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select("o_custkey")
    Tables.customer(s, d).select("c_custkey", "c_name")
      .join(open, col("c_custkey") === col("o_custkey"), "left_semi")
      .orderBy("c_custkey")
  }

  /** LEFT ANTI — customers with no open order (NOT EXISTS). Filtered on
    * status so the result is non-empty at every scale factor.
    */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select("c_custkey", "c_name")
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .orderBy("c_custkey")

  /** LEFT OUTER + null-aware aggregate: order count per nation, keeping
    * nations with zero customers (count(col) skips nulls in any engine).
    */
  def outerJoinCounts(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val o = Tables.orders(s, d).select("o_custkey", "o_orderkey")
    broadcast(n)
      .join(c, col("n_nationkey") === col("c_nationkey"), "left")
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("n_name")
      .agg(countDistinct(col("c_custkey")).as("n_customers"),
        count(col("o_orderkey")).as("n_orders"))
      .orderBy("n_name")
  }

  /** UNION / INTERSECT / EXCEPT over customer-key sets (SQL set semantics,
    * i.e. distinct): high-balance ∪∩∖ open-order customers, tagged.
    */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val rich = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      .select("c_custkey")
    val active = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    rich.union(active).distinct().withColumn("set_op", lit("union"))
      .union(rich.intersect(active).withColumn("set_op", lit("intersect")))
      .union(rich.except(active).withColumn("set_op", lit("except")))
      .orderBy("set_op", "c_custkey")
  }

  /** Bag-semantics set ops — INTERSECT ALL / EXCEPT ALL preserve
    * multiplicities (SQL:2003 multiset semantics; Spark `intersectAll`/
    * `exceptAll`). Distinct-semantics twins live in [[setOps]]. The
    * multiset here is customer keys of orders, which genuinely repeats.
    * Same scale shape as the distinct variants: one hash shuffle per op,
    * but counting occurrences instead of deduping.
    */
  def setOpsAll(s: SparkSession, d: String): DataFrame = {
    val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    open.intersectAll(urgent).withColumn("set_op", lit("intersect_all"))
      .union(open.exceptAll(urgent).withColumn("set_op", lit("except_all")))
      .groupBy("set_op", "o_custkey")
      .agg(count(lit(1)).as("multiplicity"))
      .orderBy("set_op", "o_custkey")
  }

  /** UNPIVOT/melt — the wide→long reshape (inverse of [[pivotCounts]]):
    * per-returnflag money aggregates melted into (flag, metric, value)
    * rows. Narrow after the aggregate: unpivot is a per-row Expand, no
    * extra shuffle.
    */
  def unpivotMetrics(s: SparkSession, d: String): DataFrame = {
    val dec = (c: String) => col(c).cast("decimal(18,2)")
    val wide = Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_price"),
        count(lit(1)).cast("double").as("n_lines"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_lines")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")
  }

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): bounded-depth DAG
    * reachability from the smallest near-dup document over the
    * id-directed (doc_a < doc_b) SimHash edge list — the hierarchy /
    * bill-of-materials walk shape. Spark's recursion is UNION ALL
    * semantics, so the walk is kept acyclic by direction and capped at
    * depth 4; min-depth aggregation collapses diamond paths.
    *
    * Scale: each recursion step is one join of the (tiny) frontier
    * against the edge list — same per-round shape as
    * [[graft.ops.DedupOps.connectedComponents]], which remains the
    * engine's fixpoint-to-convergence operator (recursion depth there is
    * data-driven, not capped; use CC for components, WITH RECURSIVE for
    * bounded hierarchical walks).
    */
  def recursiveReach(s: SparkSession, d: String): DataFrame = {
    // materialize the edge list once: the recursion re-scans its
    // non-recursive inputs on every iteration, so an un-checkpointed
    // view would re-run the whole SimHash pair pipeline per depth level
    // (measured: 12 document scans for a depth-4 walk)
    val ev = s"graft_simhash_edges_${java.util.UUID.randomUUID().toString.take(8)}"
    DedupOps.simhashPairs(s, d).select("doc_a", "doc_b")
      .localCheckpoint()
      .createOrReplaceTempView(ev)
    try s.sql(s"""
      WITH RECURSIVE reach(doc_id, depth) AS (
        SELECT min(doc_a), 0 FROM $ev
        UNION ALL
        SELECT e.doc_b, r.depth + 1
        FROM reach r JOIN $ev e ON e.doc_a = r.doc_id
        WHERE r.depth < 4)
      SELECT doc_id, CAST(min(depth) AS BIGINT) AS depth
      FROM reach GROUP BY doc_id ORDER BY doc_id""")
    finally s.catalog.dropTempView(ev)
  }

  /** Iterative-DataFrame twin of [[recursiveReach]] — the engine path.
    * Spark's `WITH RECURSIVE` executes each level as a fresh sub-plan
    * with fixed per-iteration planning cost that dominates small walks
    * (measured 6.5 s for a depth-4 recursion whose data work is
    * milliseconds); the loop below is the same UNION-ALL-of-levels
    * semantics as four explicit joins of a frontier against the edge
    * list — the [[graft.ops.DedupOps.connectedComponents]] loop pattern.
    * Semantics match the CTE exactly: min-depth collapses diamond paths,
    * direction (doc_a < doc_b) keeps the walk acyclic.
    *
    * Scale: per level, one join of the (small) frontier against the
    * edge list — broadcast-able frontier, edge list scanned from its
    * one materialization; depth is a constant, so lineage stays
    * bounded without per-round checkpoints.
    */
  def recursiveReachIterative(s: SparkSession, d: String,
      maxDepth: Int = 4): DataFrame = {
    val edges = DedupOps.simhashPairs(s, d).select("doc_a", "doc_b")
      .localCheckpoint() // one materialization; levels re-read it
    val seed = edges.agg(min(col("doc_a")).as("doc_id"))
      .withColumn("depth", lit(0))
    var levels = List(seed)
    for (_ <- 1 to maxDepth) {
      val frontier = levels.head
      val next = frontier.join(edges,
          frontier("doc_id") === edges("doc_a"))
        .select(col("doc_b").as("doc_id"),
          (frontier("depth") + 1).as("depth"))
      levels = next :: levels
    }
    levels.reduce(_ union _)
      .groupBy("doc_id")
      .agg(min(col("depth")).cast("long").as("depth"))
      .orderBy("doc_id")
  }

  /** Correlated LATERAL subquery (`FROM a, LATERAL (SELECT ... WHERE
    * corr ORDER BY ... LIMIT k)`): top-2 customers by balance per
    * nation, written as the per-outer-row dependent subquery a SQL user
    * reaches for. Catalyst decorrelates the per-group LIMIT into a
    * partitioned window rank — the same `WindowGroupLimit` execution as
    * the explicit row_number form (q3): the lateral form is sugar; no
    * per-nation re-scan survives to the physical plan (spec-pinned).
    */
  def lateralTopN(s: SparkSession, d: String): DataFrame = {
    // temp views are session-global, so fixed names would clobber (and
    // leak) a user's same-named views; unique names + drop-after-analysis
    // keep the call side-effect-free (sql() resolves the plan eagerly,
    // so the views are not needed at execution time)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val nv = s"graft_nation_$tag"
    val cv = s"graft_customer_$tag"
    Tables.nation(s, d).createOrReplaceTempView(nv)
    Tables.customer(s, d).createOrReplaceTempView(cv)
    try s.sql(s"""
      SELECT n_name, c.c_name, c.c_acctbal
      FROM $nv, LATERAL (
        SELECT c_name, c_acctbal FROM $cv
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
      ORDER BY n_name, c_acctbal DESC, c_name""")
    finally {
      s.catalog.dropTempView(nv)
      s.catalog.dropTempView(cv)
    }
  }

  /** Generator/explode: part-name unigrams with counts — the flatMap shape
    * (Spark `explode`, SQL UNNEST).
    */
  def explodeWords(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))

  /** ROLLUP: order counts at (nation, priority), (nation), and grand-total
    * grouping levels. NULL grouping keys sorted first in both engines.
    */
  def rollupCounts(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_custkey", "o_orderpriority")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_name").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** TPC-H Q1-shaped wide aggregate over lineitem: the partial/final
    * hash-agg stress shape. Money sums go through DECIMAL(18,2) and out as
    * DOUBLE for cross-engine bit-stability (see EventOps scaladoc).
    */
  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    val dec = (c: String) => col(c).cast("decimal(18,2)")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        (sum(dec("l_extendedprice")).cast("double") / count(lit(1)))
          .as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** CUBE over (status, priority): all four grouping levels in one pass
    * (Expand + single aggregate — no union of scans).
    */
  def cubeCounts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Window-function breadth in one query: rank, dense_rank,
    * percent_rank, cume_dist, lag, lead, ntile, first_value, and a
    * running sum with an explicit rows frame — the full analytic surface
    * beyond the reference's single row_number (SURVEY.md §2.6). One
    * shuffle on the partition key; all functions share the frame sort.
    * percent_rank/cume_dist are ratios of window-local integers, so the
    * doubles are engine-exact.
    */
  def windowFunctions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("prnk", percent_rank().over(w))
      .withColumn("cdist", cume_dist().over(w))
      .withColumn("prev_bal", lag("c_acctbal", 1).over(w))
      .withColumn("next_bal", lead("c_acctbal", 1).over(w))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("seg_top_bal", first_value(col("c_acctbal")).over(w))
      .withColumn("running_sum",
        sum(col("c_acctbal").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .filter(col("rnk") <= 10)
      .orderBy("c_mktsegment", "rnk")
  }

  /** Skew-safe equi-join via key salting: the build side is replicated
    * `salt` ways, the probe side scatters each row to one replica — a hot
    * key's rows spread over `salt` reducers instead of one. Semantics are
    * exactly the plain inner join (verified against the unsalted oracle);
    * use when AQE's skew split can't help (e.g. aggregation-free joins
    * feeding stateful ops). Deterministic: replica choice hashes the probe
    * row's own key column.
    */
  /** Join-key skew profile — the diagnostic run before choosing a salt
    * factor ([[saltedJoinCounts]]) or trusting AQE's skew split: per-key
    * row counts, parts-per-million share, and a heavy flag
    * (`n > 2 × mean`). All ratios in integer arithmetic
    * (`n·1e6 div total`, `n·keys > 2·total`) so the profile is
    * engine-exact. Shape: one key-keyed aggregation (map-side combined)
    * + a two-row scalar aggregate broadcast back — O(distinct keys),
    * no sort until the top-k presentation limit.
    */
  def skewProfile(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val stats = counts.agg(sum("n_rows").as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(stats))
      .select(col("key"), col("n_rows"),
        expr("n_rows * 1000000 div total").as("share_ppm"),
        (col("n_rows") * col("n_keys") > col("total") * 2).as("is_heavy"))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(topK)
  }

  /** Gate-facing skew profile of the event stream's user key. */
  def eventKeySkew(s: SparkSession, d: String): DataFrame =
    skewProfile(Tables.events(s, d), "user_id")

  def saltedJoinCounts(s: SparkSession, d: String, salt: Int = 8): DataFrame = {
    val o = Tables.orders(s, d).select("o_custkey", "o_orderpriority")
      .withColumn("salt_", pmod(xxhash64(col("o_custkey")), lit(salt)))
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      .withColumn("salt_", explode(array((0 until salt).map(lit): _*)))
    o.join(c, col("o_custkey") === col("c_custkey") &&
        o("salt_") === c("salt_"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment", "o_orderpriority")
  }

  /** Offset-limit page read (SURVEY.md §2.7 O5) over a total order. */
  def offsetLimit(s: SparkSession, d: String, off: Int = 100,
      n: Int = 5): DataFrame =
    Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey").offset(off).limit(n)

  /** Binned RANGE JOIN — the interval-containment join Spark has no
    * native operator for. Naive formulations (`a.join(b, pointCol
    * between lo and hi)`) plan as BroadcastNestedLoopJoin — O(|a|·|b|)
    * comparisons, a scale-killer. The bucketed shape: quantize the point
    * side into fixed-width bins, explode each interval into the bins it
    * covers (≤ intervalWidth/binWidth + 1 rows — here ≤ 2), equi-join on
    * the bin (hash shuffle, co-partitioned), then apply the exact range
    * predicate to the bin-colliding candidates. Work ∝ true matches +
    * bin collisions, never |a|·|b|.
    *
    * Semantics here: for every distinct ship date, the number of orders
    * whose 7-day window [o_orderdate, o_orderdate+6d] covers it (dates
    * with no covering order are absent — inner join).
    */
  def rangeJoinBinned(s: SparkSession, d: String,
      windowDays: Int = 7): DataFrame = {
    val binW = 7
    def bin(c: org.apache.spark.sql.Column) =
      floor(datediff(c, lit("1970-01-01").cast("date")) / binW)
    val ship = Tables.lineitem(s, d)
      .select(to_date(col("l_shipdate")).as("ship_date")).distinct()
      .withColumn("bin", bin(col("ship_date")))
    val ord = Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("start_date"))
      .withColumn("end_date", date_add(col("start_date"), windowDays - 1))
    val binned = ord.withColumn("bin",
      explode(sequence(bin(col("start_date")), bin(col("end_date")))))
    binned.join(ship, Seq("bin"))
      .filter(col("ship_date").between(col("start_date"), col("end_date")))
      .groupBy("ship_date")
      .agg(count(lit(1)).as("n_covering"))
      // timestamp output: DATE columns trip the harness's pandas compare
      .select(col("ship_date").cast("timestamp").as("ship_date"),
        col("n_covering"))
      .orderBy("ship_date")
  }

  /** HLL approximate distinct counts next to the exact ones — the sketch
    * path for cardinalities too large for exact two-phase distinct at
    * 100 TB. Sketch internals differ per engine → rows-only check +
    * error-bound spec.
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("exact_customers"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"))
      .orderBy("o_orderpriority")

  /** The cross-engine-verifiable form of the HLL contract: sketch VALUES
    * differ per engine (different HLL implementations), but the sketch
    * PROMISE — approx within a relative error bound of exact — holds in
    * every engine, so (group, exact, within_bound) hash-compares. The
    * bound is 10× the requested 2% rsd: slack for both engines' tails,
    * still a real assertion (a broken sketch is off by orders of
    * magnitude, not percent).
    */
  def approxDistinctBound(s: SparkSession, d: String,
      maxRelErr: Double = 0.2): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("exact_customers"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .select(col("o_orderpriority"), col("exact_customers"),
        (abs(col("approx") - col("exact_customers")) <=
          col("exact_customers") * maxRelErr).as("within_bound"))
      .orderBy("o_orderpriority")

  /** Pivot: order counts per nation × priority as columns — Spark `pivot`
    * with pinned values; oracle expresses the same as conditional sums.
    */
  /** Correlated scalar subquery (the per-group argmax users actually
    * write in SQL): customers holding their nation's maximum balance.
    * Catalyst decorrelates this to an aggregate + join — no per-row
    * re-execution, same plan family a hand-written join would get; the
    * query goes through the SQL entry on purpose so the decorrelation
    * path itself is gate-covered. MAX keeps the comparison exact (no
    * cross-engine float summation).
    */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    // unique view name + drop-after-analysis, the lateralTopN pattern:
    // a fixed name would clobber (and leak) a user's same-named session
    // view; sql() resolves eagerly so the view is not needed afterwards
    val cv = s"graft_customer_${java.util.UUID.randomUUID().toString.take(8)}"
    Tables.customer(s, d).createOrReplaceTempView(cv)
    try s.sql(
      s"""SELECT c1.c_custkey, c1.c_nationkey, c1.c_acctbal
         |FROM $cv c1
         |WHERE c1.c_acctbal = (SELECT max(c2.c_acctbal) FROM $cv c2
         |                      WHERE c2.c_nationkey = c1.c_nationkey)
         |ORDER BY c1.c_custkey""".stripMargin)
    finally s.catalog.dropTempView(cv)
  }

  /** Correlated EXISTS / NOT EXISTS through the SQL entry: customers
    * with at least one order but no urgent-priority order. Catalyst
    * rewrites both predicates to semi/anti joins — the same physical
    * family as `semiJoin`/`antiJoin`, reached through the subquery
    * rewriter.
    */
  def existsSubquery(s: SparkSession, d: String): DataFrame = {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val ov = s"graft_orders_$tag"
    val cv = s"graft_customer_$tag"
    Tables.orders(s, d).createOrReplaceTempView(ov)
    Tables.customer(s, d).createOrReplaceTempView(cv)
    try s.sql(
      s"""SELECT c_custkey, c_nationkey, c_acctbal
         |FROM $cv c1
         |WHERE EXISTS (SELECT 1 FROM $ov o
         |              WHERE o.o_custkey = c1.c_custkey)
         |  AND NOT EXISTS (SELECT 1 FROM $ov o
         |                  WHERE o.o_custkey = c1.c_custkey
         |                    AND o.o_orderpriority = '1-URGENT')
         |ORDER BY c_custkey""".stripMargin)
    finally { s.catalog.dropTempView(ov); s.catalog.dropTempView(cv) }
  }

  /** GROUPING SETS with explicitly chosen combinations (cube/rollup cover
    * the regular lattices; real reporting picks arbitrary subsets).
    * grouping_id disambiguates a NULL group value from a rolled-up
    * level. One Expand + one shuffle, exactly like cube.
    */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    val ov = s"graft_orders_${java.util.UUID.randomUUID().toString.take(8)}"
    Tables.orders(s, d).createOrReplaceTempView(ov)
    try s.sql(
      s"""SELECT o_orderpriority, o_orderstatus,
         |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
         |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
         |       count(*) AS n
         |FROM $ov
         |GROUP BY GROUPING SETS ((o_orderpriority),
         |                        (o_orderstatus),
         |                        (o_orderpriority, o_orderstatus),
         |                        ())
         |ORDER BY g_prio, g_status, o_orderpriority, o_orderstatus""".stripMargin)
    finally s.catalog.dropTempView(ov)
  }

  def pivotCounts(s: SparkSession, d: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val o = Tables.orders(s, d).select("o_custkey", "o_orderpriority")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
      .na.fill(0L, prios)
      .orderBy("n_name")
  }

  /** MERGE INTO (keyed upsert): rows from `updates` win on key collision,
    * unmatched `base` rows pass through, unmatched `updates` rows insert.
    * This is the table-maintenance primitive behind the reference's Delta
    * streaming sink (`(Clone) Kinesis Data Stream.py:174-192` — Delta's
    * headline op is MERGE; parquet has no transaction log, so here the
    * merge is the relational core you'd wrap in a rewrite).
    *
    * Scale shape: one shuffle per side on the merge key (or zero with both
    * sides bucketed by key, `Sinks.bucketedTable`). At 100 TB you never
    * rewrite the whole base: join `updates` to the base's partition values
    * first and rewrite only affected partitions — updates are typically
    * ≪ base, so the anti-join side stays a broadcast.
    */
  def mergeUpsert(base: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame =
    updates.unionByName(base.join(updates.select(keys.map(col): _*),
      keys, "left_anti"))

  /** Data-quality constraint audit: the validation pass an ETL pipeline
    * runs between ingest and publish (the reference "validates" by
    * eyeballing `display()` output — `CLEAN:124,146,...`; this is that
    * step made mechanical). One row per declared constraint with its
    * violation count, so a scheduler can gate on `max(n_violations) == 0`.
    *
    * Each check is a single aggregate or anti-join over the audited
    * table — no check adds more than one shuffle, and the null/duplicate
    * checks share one scan. FK orphan checks broadcast the key side when
    * small (AQE decides).
    */
  def constraintAudit(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val nulls = o.select(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("null_key"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
      sum(when(col("o_totalprice").isNull || col("o_totalprice") <= 0.0, 1L)
        .otherwise(0L)).as("nonpositive_price"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_keys"))
    val orphans = o.select("o_custkey")
      .join(Tables.customer(s, d).select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("fk_orphans"))
    val row = nulls.crossJoin(orphans)
    // long format via stack(): ONE aggregate pass fanned into one row per
    // check (a per-check self-union would recompute the aggregate per
    // branch — N scans for N checks)
    val checks = Seq("null_key", "null_cust", "nonpositive_price",
      "dup_keys", "fk_orphans")
    val stacked = checks
      .map(c => s"'$c', CAST($c AS BIGINT)").mkString(", ")
    row.selectExpr(
        s"stack(${checks.size}, $stacked) AS (check_name, n_violations)")
      .orderBy("check_name")
  }

  /** SCD Type-2 dimension history: collapse a keyed changelog into
    * versioned rows with [valid_from, valid_to) ranges — valid_to is the
    * next change's timestamp, NULL while current. The warehouse pattern
    * for "what did this dimension row look like at time t", and the
    * batch twin of the streaming merge sink (which keeps only the latest
    * version). One key-partitioned window (single shuffle); version
    * chains are per-key, so skew equals key skew, not table size.
    *
    * Changelog here: each customer's orders as successive status changes
    * (key = o_custkey, change ts = o_orderdate, tiebreak o_orderkey).
    */
  def scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("key")
      .orderBy(col("valid_from"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey").as("key"),
        col("o_orderstatus").as("status"),
        col("o_orderdate").as("valid_from"),
        col("o_orderkey"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("version", row_number().over(w).cast(LongType))
      .withColumn("is_current", col("valid_to").isNull)
      .select("key", "version", "status", "valid_from", "valid_to",
        "is_current")
      .orderBy("key", "version")
  }

  /** Per-column profile of the orders table: null count and distinct
    * count per column — the ANALYZE-style statistics a pipeline collects
    * to drive join planning and data-contract checks. Exact
    * `countDistinct` keeps the oracle comparable at gate scale; at 100 TB
    * every distinct becomes `approx_count_distinct` (one pass, one HLL
    * per column, all columns in a single aggregate — see
    * [[approxDistinct]] for the sketch-error contract).
    */
  def tableStats(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val cols = o.columns.toSeq
    val agg = o.select(
      count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null__$c"),
        countDistinct(col(c)).as(s"ndv__$c"))): _*)
    // stack() the single wide row into per-column rows — one aggregate
    // pass over the table, not one per profiled column
    val stacked = cols.map(c =>
      s"'$c', CAST(null__$c AS BIGINT), CAST(ndv__$c AS BIGINT)")
      .mkString(", ")
    agg.selectExpr("CAST(n_rows AS BIGINT) AS n_rows",
        s"stack(${cols.size}, $stacked) AS (column, n_null, n_distinct)")
      .select("column", "n_rows", "n_null", "n_distinct")
      .orderBy("column")
  }

  /** Equi-depth histogram of order value — the optimizer-statistics
    * primitive ([[tableStats]]'s distribution companion; what ANALYZE
    * TABLE computes per column): NTILE(10) buckets over the
    * determinate (value, key) order, each bucket reporting count and
    * exact [lo, hi] bounds. Equal-HEIGHT buckets expose the
    * distribution shape that equal-WIDTH bins hide under skew — bucket
    * boundaries are the deciles. Money stays DECIMAL(18,2) through
    * min/max and surfaces as DOUBLE (exact conversion); NTILE over an
    * identical total order is pure integer arithmetic, engine-exact.
    *
    * Scale shape: ONE partial-merged count-map aggregate
    * ([[graft.functions.EquidepthHist]], the [[graft.functions
    * .ExactQuantiles]] machinery) — every executor builds a local
    * value→count map, maps merge up the tree, and the finished map
    * yields every bucket's (count, lo, hi) with the exact NTILE
    * integer math. No global sort, no `Exchange SinglePartition`
    * under a fact-sized Window (the round-8 `weak` shape this
    * replaced); state ∝ distinct 2dp money values, not rows. Bucket
    * output is bit-identical to the NTILE form: v is non-decreasing
    * in the composite (v, key) order, so bucket min/max are the
    * values at the boundary ranks counting multiplicity, independent
    * of how the tie-break key splits equal values across buckets.
    */
  def equidepthHist(s: SparkSession, d: String,
      buckets: Int = 10): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_totalprice").cast("decimal(18,2)")
        .cast("double").as("v"))
    o.agg(graft.functions.EquidepthHist.equidepthHist(col("v"), buckets)
        .as("hist"))
      .select(explode(col("hist")).as("h"))
      .select(col("h.bucket").as("bucket"), col("h.n_rows").as("n_rows"),
        col("h.lo").as("lo"), col("h.hi").as("hi"))
      .orderBy("bucket")
  }

  /** Equi-WIDTH histogram of order value — [[equidepthHist]]'s
    * fixed-bin companion (the other histogram ANALYZE computes):
    * `buckets` equal-width cent ranges between the exact min and max,
    * each reporting its count and [lo, hi] bounds, EMPTY BUCKETS
    * INCLUDED (an equi-width histogram's empty bins are the signal —
    * they are where equi-depth hides the gaps).
    *
    * Exactness: money quantizes to integer CENTS (DECIMAL(18,2)·100 is
    * integral), the width is one integer ceil-division, bucket
    * assignment one integer div — no float touches a boundary; the
    * surfaced bounds are cents/100 doubles (exact conversion). Scale:
    * one min/max aggregate broadcast back + one stateless map-side
    * bucket pass + a buckets-sized grid join. No window, no sort.
    */
  def equiwidthHist(s: SparkSession, d: String,
      buckets: Int = 10): DataFrame = {
    val o = Tables.orders(s, d)
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
    val span = o.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    val counts = o.crossJoin(broadcast(span))
      .select(expr(s"(cents - lo) div ((hi - lo + $buckets) div $buckets)")
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
    s.range(0, buckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .crossJoin(broadcast(span))
      .withColumn("w", expr(s"(hi - lo + $buckets) div $buckets"))
      .select(col("bucket"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        ((col("lo") + col("bucket") * col("w")).cast("double") / 100)
          .as("bin_lo"),
        ((col("lo") + (col("bucket") + 1) * col("w") - 1).cast("double")
          / 100).as("bin_hi"))
      .orderBy("bucket")
  }

  /** Benford first-significant-digit audit of line-item revenue — the
    * classic forensic data-quality screen (Benford 1938; Nigrini 2012,
    * "Benford's Law: Applications for Forensic Accounting"): naturally
    * occurring multi-magnitude amounts follow P(d) = log10(1 + 1/d),
    * and a large per-digit chi-square term flags fabricated, truncated,
    * or unit-mangled data. Output per digit 1–9: observed count, the
    * Benford expectation (hardcoded 10-dp literals — universal
    * constants, so no cross-engine log10 in the plan), the chi-square
    * contribution, and the 8-df total repeated on every row (the
    * [[graft.ops.EventOps.psiValueDrift]] presentation).
    *
    * Exactness: the digit comes from the DECIMAL(18,2)-quantized
    * amount's string form (no data-dependent log10), counts are exact,
    * each chi term is a few IEEE ops on exact inputs, and the total is
    * an associative DECIMAL(24,9) sum — bit-exact.
    *
    * Scale shape: one map-side-combined 9-group aggregate over a
    * single projected column; the digit frame, total, and chi algebra
    * are 9-row driver-trivial broadcasts. No joins on the fact side,
    * no window over fact rows.
    */
  def benfordAudit(s: SparkSession, d: String): DataFrame = {
    val digits = s.range(1, 10).select(col("id").as("digit"))
    val obs = Tables.lineitem(s, d)
      .select(regexp_extract(col("l_extendedprice").cast("decimal(18,2)")
        .cast("string"), "[1-9]", 0).cast("long").as("digit"))
      .where(col("digit").isNotNull)
      .groupBy("digit").agg(count(lit(1)).as("observed"))
    // materialized ONCE (9 rows): the total and the chi terms both
    // consume this frame — without it each branch re-scans the fact
    val joined = digits.join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("observed"), lit(0L)).as("observed"))
      .localCheckpoint()
    val tot = joined.agg(sum(col("observed")).as("n"))
    val p = Seq(1 -> 0.3010299957, 2 -> 0.1760912591, 3 -> 0.1249387366,
        4 -> 0.0969100130, 5 -> 0.0791812460, 6 -> 0.0669467896,
        7 -> 0.0579919470, 8 -> 0.0511525224, 9 -> 0.0457574906)
      .foldLeft(lit(null).cast("double")) { case (acc, (dg, pr)) =>
        when(col("digit") === dg, lit(pr)).otherwise(acc)
      }
    val terms = joined.crossJoin(broadcast(tot))
      .withColumn("expected_p", p)
      .withColumn("expected_n", col("expected_p") * col("n").cast("double"))
      .withColumn("chi_dec",
        ((col("observed").cast("double") - col("expected_n"))
          * (col("observed").cast("double") - col("expected_n"))
          / col("expected_n")).cast("decimal(24,9)"))
    terms.withColumn("chi_sq",
        sum(col("chi_dec")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
          .cast("double"))
      .select(col("digit"), col("observed"), col("expected_p"),
        col("expected_n"), col("chi_dec").cast("double").as("chi_term"),
        col("chi_sq"))
      .orderBy("digit")
  }

  /** CDC-style diff of two keyed versions of a table: classify every key
    * as insert / delete / update / same, null-safely (`<=>`) across all
    * non-key columns. One full-outer shuffle join on the key —
    * O(|base| + |revised|), no pair term — and the column comparison is
    * row-local, so the shape survives any table size; at 100 TB both
    * sides bucketed by the key make even that one Exchange disappear
    * (see SCALE.md, bucketed layouts).
    */
  def tableDiff(base: DataFrame, revised: DataFrame,
      keys: Seq[String]): DataFrame = {
    val nonKey = base.columns.filterNot(keys.contains).toSeq
    val b = base.select(keys.map(col) ++
      nonKey.map(c => col(c).as(s"b_$c")) :+ lit(true).as("__in_b"): _*)
    val r = revised.select(keys.map(col) ++
      nonKey.map(c => col(c).as(s"r_$c")) :+ lit(true).as("__in_r"): _*)
    val changed = nonKey.map(c => !(col(s"b_$c") <=> col(s"r_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    b.join(r, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_b").isNull, "insert")
          .when(col("__in_r").isNull, "delete")
          .when(changed, "update")
          .otherwise("same"))
      .drop("__in_b", "__in_r")
  }

  /** Gate-facing diff: reconcile orders against its merged revision
    * ([[mergeOrders]]) with a deterministic slice deleted — all four
    * change classes populated. Publishes the reconciliation summary
    * (class, row count, key checksum).
    */
  def orderDiff(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val revised = mergeOrders(s, d).filter(col("o_orderkey") % 7 =!= 3)
    tableDiff(base, revised, Seq("o_orderkey"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy("change_type")
  }

  /** Incremental JOIN maintenance (the join analog of
    * [[graft.ops.EventOps.incrementalHourly]]): with a materialized
    * `H_l ⋈ H_r` and new batches `Δ_l`, `Δ_r`, the maintained join is
    *
    *   (H_l ∪ Δ_l) ⋈ (H_r ∪ Δ_r)
    *     = H_l⋈H_r  ∪  H_l⋈Δ_r  ∪  Δ_l⋈H_r  ∪  Δ_l⋈Δ_r
    *
    * so only the three delta terms are computed — each joins a
    * batch-sized side, which broadcasts (or bloom-prunes) against
    * history instead of re-joining two full tables. At 100 TB history ×
    * daily batches this is the difference between O(batch) and
    * O(history) per refresh. The algebra requires the four inputs be
    * disjoint partitions of the final tables (no key updated in place —
    * updates compose with [[tableDiff]]/[[mergeUpsert]] upstream).
    */
  def incrementalJoin(storedJoin: DataFrame,
      histLeft: DataFrame, histRight: DataFrame,
      newLeft: DataFrame, newRight: DataFrame,
      keys: Seq[String]): DataFrame =
    storedJoin
      .unionByName(histLeft.join(newRight, keys))
      .unionByName(newLeft.join(histRight, keys))
      .unionByName(newLeft.join(newRight, keys))

  /** Gate-facing incremental-join maintenance: orders⋈customer split
    * into deterministic history/batch slices, maintained incrementally,
    * summarized per market segment. The oracle is the full recompute —
    * equality IS the correctness statement (delta terms cover exactly:
    * no pair missed, none duplicated).
    */
  def incrementalJoinOrders(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_custkey").as("c_custkey"))
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    val (histO, newO) = (o.filter(col("o_orderkey") % 10 =!= 7),
      o.filter(col("o_orderkey") % 10 === 7))
    val (histC, newC) = (c.filter(col("c_custkey") % 10 =!= 3),
      c.filter(col("c_custkey") % 10 === 3))
    val stored = histO.join(histC, Seq("c_custkey"))
    val maintained = incrementalJoin(stored, histO, histC, newO, newC,
      Seq("c_custkey"))
    maintained.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .orderBy("c_mktsegment")
  }

  /** Gate-facing merge: orders with every 10th key's status/price updated
    * and a deterministic batch of new keys inserted (shifted key space).
    */
  def mergeOrders(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val updated = base.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + 100.0)
    val inserted = base.filter(col("o_orderkey") % 1000 === 1)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N"))
    mergeUpsert(base, updated.unionByName(inserted), Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** Bloom-filter semi-join (the sideways-information-passing shape
    * Spark's own AQE runtime filters use, expressed relationally so the
    * plan is explicit): the fact side is pre-filtered by the DIM side's
    * Bloom positions before the exact join ever shuffles a fact row.
    *
    * The dim's keys hash into k=3 positions of an m=2²⁰ bit space; the
    * distinct position set (≤ min(m, 3·|dim|) ints — **bounded by m = 8
    * MB no matter how large the dim grows**, which is the whole Bloom
    * property) broadcasts, and three broadcast LEFT SEMI probes drop
    * every fact row with any unmatched position. Only survivors (true
    * matches + the Bloom false-positive sliver) reach the exact
    * semi-join. At 100 TB this turns a full-fact shuffle into a shuffle
    * of the ~matching sliver; correctness is unconditional because Bloom
    * filters have no false negatives and the exact join removes the
    * false positives — which is also why the oracle is the plain join.
    */
  def bloomSemiJoin(s: SparkSession, d: String): DataFrame = {
    val m = 1L << 20
    val dim = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val positions = dim
      .select(explode(array((0 until 3).map(i =>
        pmod(xxhash64(lit(i), col("o_orderkey")), lit(m))): _*)).as("p"))
      .distinct()
    val pre = (0 until 3).foldLeft(Tables.lineitem(s, d)) { (f, i) =>
      f.join(broadcast(positions),
        pmod(xxhash64(lit(i), col("l_orderkey")), lit(m)) === col("p"),
        "left_semi")
    }
    pre
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Co-located join over BUCKETED tables ([[graft.sources.Sinks
    * .bucketedTable]]) — the recurring-join layout decision that matters
    * most at 100 TB: both sides written with `bucketBy(8, custkey)` +
    * in-bucket sort, so the join executes with ZERO Exchange below it
    * (each task zips bucket i with bucket i; plan snapshot
    * `plans/r_bucketed_join.txt`, invariant pinned in SinksAndIvfSpec).
    * The write pays one shuffle ONCE; every subsequent join on the
    * bucket key is shuffle-free — vs paying the fact⋈fact shuffle on
    * every pipeline run. The `merge` hint keeps the plan in the
    * sort-merge form bucketing exists for (at real scale neither side
    * broadcasts; without the hint the sf-sized fixture would broadcast
    * and the query would stop exercising the layout). Oracle is the
    * plain join — bucketing is pure layout, never semantics.
    */
  def bucketedJoinAgg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    // dataset-namespaced names: concurrent sessions over different
    // inputs sharing a warehouse must not clobber each other
    val oT = graft.sources.Sinks.namespaced("graft_orders_bkt", d)
    val cT = graft.sources.Sinks.namespaced("graft_customer_bkt", d)
    graft.sources.Sinks.resetManagedTable(s, oT)
    graft.sources.Sinks.resetManagedTable(s, cT)
    graft.sources.Sinks.bucketedTable(o, oT, 8, "o_custkey")
    graft.sources.Sinks.bucketedTable(c, cT, 8, "c_custkey")
    s.table(oT)
      .join(s.table(cT).hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("segment")
  }

  /** Storage-partitioned join as a DRIVER-GATED entry (round 7; the SPJ
    * seam was spec-only before): a self-join of two bucketed
    * [[graft.sources.v2.GraftDocsSource]] scans on (id_bucket, doc_id).
    * Each scan reports `KeyGroupedPartitioning(identity(id_bucket))`
    * over bucket-aligned `HasPartitionKey` splits, so under
    * `spark.sql.sources.v2.bucketing.enabled` the join plans with ZERO
    * Exchange — the Iceberg-style SPJ lever: co-location delivered by
    * the SOURCE's reported layout, no write-side bucketing step at all.
    * The `merge` hint keeps the sf-sized fixture on the SortMergeJoin
    * path the lever exists for (a broadcast would bypass the reported
    * partitioning). The two confs are the ENGINE SESSION DEFAULTS
    * ([[graft.EngineConf]]) — the sets below are idempotent no-ops
    * under any engine entry point and exist only so a standalone
    * caller on a vanilla session still gets the exchange-free plan.
    * (Round-12 lesson: these are NOT no-ops for the rest of the
    * registry — `requireAllClusterKeysForCoPartition=false` lets
    * EnsureRequirements accept subset-key co-partitioning everywhere,
    * eliding exchanges in seven other plans; setting them session-wide
    * from inside one query made those shapes depend on query ORDER,
    * which the plan-fingerprint gate forbids. The flip lives in
    * EngineConf now, applied at session setup.)
    *
    * Oracle: the generator's doc_id space is pure arithmetic
    * (`[0, rows)`, `id_bucket = doc_id div bucketSize`), so the
    * aggregate over the join is exactly reproducible from a DuckDB
    * `generate_series` — the layout is the engine's, the numbers are
    * engine-independent.
    */
  def storagePartitionedJoinAgg(s: SparkSession, rows: Long = 5000,
      bucketSize: Long = 250): DataFrame = {
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // join keys (id_bucket, doc_id) are a SUPERSET of the partition key
    s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    def scan = s.read.format("graft.sources.v2.GraftDocsSource")
      .option("rows", rows.toString)
      .option("bucketSize", bucketSize.toString)
      .load()
    scan.as("a")
      .join(scan.as("b").hint("merge"),
        col("a.id_bucket") === col("b.id_bucket") &&
          col("a.doc_id") === col("b.doc_id"))
      .groupBy(col("a.id_bucket").as("id_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("a.doc_id")).as("min_id"),
        max(col("a.doc_id")).as("max_id"))
      .orderBy("id_bucket")
  }

  /** 2-D skyline (Pareto frontier; Börzsönyi et al., ICDE 2001) of
    * parts minimizing (retail price, size): a part survives iff no
    * other part is ≤ on both dimensions and < on at least one. The
    * classic "best trade-offs" OLAP operator — here, the cheapest
    * acceptable part at every size point.
    *
    * Instead of the quadratic NOT EXISTS (the oracle's spec form),
    * the engine uses the sort-order identity: group to one
    * (price → min size) row per DISTINCT price, take the running
    * strict-prefix minimum size over ascending prices, and keep a
    * part iff its size equals its own price's min AND beats every
    * cheaper price's best (`size < prefix_min`). Same-price/same-size
    * duplicates both survive (neither strictly dominates).
    *
    * Scale: one fact-sized aggregate to the distinct-price frame, then
    * ONE ordered window over that frame only (price-domain-sized, not
    * data-sized — the distributed form is local per-partition skylines
    * then this merge over the tiny union). Price compares are exact
    * (double equality on unmodified stored values); everything else is
    * integer.
    */
  def skylineParts(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"),
        col("p_retailprice"), col("p_size"))
    val perPrice = parts.groupBy("p_retailprice")
      .agg(min(col("p_size")).as("min_size"))
    val prefix = perPrice.withColumn("prefix_min",
      min(col("min_size")).over(Window.orderBy(col("p_retailprice"))
        .rowsBetween(Window.unboundedPreceding, -1)))
    parts.join(prefix, Seq("p_retailprice"))
      .filter(col("p_size") === col("min_size") &&
        (col("prefix_min").isNull || col("p_size") < col("prefix_min")))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
        col("p_size").cast(LongType).as("p_size"))
      .orderBy("p_retailprice", "p_partkey")
  }

  /** Point-in-time (temporal/as-of) join of the fact stream against the
    * [[scd2]] dimension: every lineitem is joined to the customer-status
    * VERSION that was valid at its ship date, then rolled up per as-of
    * status — the "what did the dimension say when the fact happened"
    * join every warehouse backfill needs (joining to `is_current`
    * silently rewrites history).
    *
    * Implemented as the union-sort trick, not a range join: versions
    * and probes interleave on one (key, ts)-sorted stream and each
    * probe takes the LAST version at or before it (`last … ignoreNulls`
    * over a running frame) — version-at-equal-ts wins via the sort key
    * (ts, is_version DESC, version), which also collapses zero-width
    * versions (same valid_from twice ⇒ the later version is in effect),
    * exactly the [valid_from, valid_to) range semantics without the
    * per-key versions×probes blowup. ONE shuffle+sort on the key serves
    * the whole join — the scalable as-of shape ([[graft.plans]]' native
    * AsOfJoinExec is the operator form; this is the windowed form).
    *
    * Exactness: the picked version is a sort-unique row; quantity sums
    * ride DECIMAL(18,2). A probe earlier than its customer's first
    * version (the fixture ships lines before the order date for ~half
    * the rows) genuinely has no as-of row and lands in the NULL-status
    * group — the honest outer-join contract, not an error.
    */
  def pitJoin(s: SparkSession, d: String): DataFrame = {
    val versions = scd2(s, d).select(col("key"),
      col("valid_from").as("ts"), lit(1).as("is_v"), col("version"),
      col("status"), lit(null).cast("double").as("qty"))
    val probes = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("key"), col("l_shipdate").as("ts"),
        lit(0).as("is_v"), lit(0L).as("version"),
        lit(null).cast("string").as("status"), col("l_quantity").as("qty"))
    val w = Window.partitionBy("key")
      .orderBy(col("ts"), col("is_v").desc, col("version"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versions.unionByName(probes)
      .withColumn("as_of_status",
        last(when(col("is_v") === 1, col("status")), ignoreNulls = true)
          .over(w))
      .filter(col("is_v") === 0)
      .groupBy(col("as_of_status").as("status"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qty").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .orderBy("status")
  }

  /** Functional-dependency audit (the g3 error of Kivinen & Mannila
    * 1995) over a fixed candidate panel — the data-profiling readout
    * schema discovery and quality monitoring run: for each X → A
    * candidate, the minimum number of rows to delete for the FD to
    * hold (N − Σ_x max_a count(x, a)), its rate, and whether the FD
    * holds exactly. Key-determined pairs (c_custkey → c_nationkey,
    * n_nationkey → n_regionkey) must report 0 violations — a
    * regression here means upstream corruption.
    *
    * Exactness: pure integer counting end to end; one double division
    * per row at the surface. Scale: per candidate ONE (X, A) aggregate
    * (map-side combined) and one X-keyed rollup — the determinant's
    * cardinality bounds the shuffle, never a window or a self-join.
    */
  def fdAudit(s: SparkSession, d: String): DataFrame = {
    def one(tbl: String, df: DataFrame, det: String,
        dep: String): DataFrame =
      df.groupBy(col(det).as("x"), col(dep).as("a"))
        .agg(count(lit(1)).as("c"))
        .groupBy("x").agg(sum(col("c")).as("nx"), max(col("c")).as("mx"))
        .agg(sum(col("nx")).as("n_rows"),
          sum(col("nx") - col("mx")).as("n_violations"))
        .select(lit(tbl).as("tbl"), lit(det).as("determinant"),
          lit(dep).as("dependent"), col("n_rows"), col("n_violations"),
          (col("n_violations") === 0).as("fd_holds"),
          (col("n_violations").cast("double")
            / col("n_rows").cast("double")).as("g3_rate"))
    one("customer", Tables.customer(s, d), "c_custkey", "c_nationkey")
      .unionByName(one("events", Tables.events(s, d),
        "user_id", "event_type"))
      .unionByName(one("lineitem", Tables.lineitem(s, d),
        "l_orderkey", "l_suppkey"))
      .unionByName(one("lineitem", Tables.lineitem(s, d),
        "l_partkey", "l_suppkey"))
      .unionByName(one("nation", Tables.nation(s, d),
        "n_nationkey", "n_regionkey"))
      .unionByName(one("orders", Tables.orders(s, d),
        "o_custkey", "o_orderpriority"))
      .orderBy("tbl", "determinant", "dependent")
  }
}
