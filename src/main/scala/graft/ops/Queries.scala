package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** The reference's 9 analytics queries (SURVEY.md §2.13, Tasks 4-11 at
  * `(Clone) Pinterest Data Cleaning and Queries.py:111-322`) re-expressed
  * over the driver's TPC-H-ish testdata:
  *
  *   country          ≙ nation.n_name        (via customer.c_nationkey)
  *   category         ≙ orders.o_orderpriority
  *   follower_count   ≙ customer.c_acctbal
  *   date_joined / ts ≙ orders.o_orderdate
  *   age bucket       ≙ acctbal bucket (same CASE shape as `CLEAN:196-201`)
  *
  * Scale design notes (these run on 100 TB, tests only prove correctness):
  *  - nation/region are broadcast explicitly — the orders⋈customer join is
  *    the only unavoidable shuffle in q1-q9.
  *  - Every query projects the minimal column set *before* joining so
  *    parquet scans prune (verify via `.explain`: ReadSchema).
  *  - The year-range filter (q2) is written as a timestamp range, not
  *    `year(ts) BETWEEN`, so parquet min/max stats can skip row groups —
  *    the rewrite SURVEY.md §4.1 calls out as the reference's missed
  *    opportunity.
  *  - Medians use a deterministic lower-median (sort + row_number pick)
  *    rather than `percentile_approx` (`CLEAN:243`) so results are exact and
  *    engine-independent; the approximate variant is exposed separately
  *    (see `q6_median_follower_by_group_approx`) as the 100-TB scale path —
  *    a GK sketch aggregates in one pass with bounded memory, whereas any
  *    exact median must materialize each group.
  */
object Queries {

  /** acctbal bucketing, mirroring the age-bucket CASE at `CLEAN:196-201`
    * (three explicit ranges + catch-all). Strict `<` bounds — exact on
    * doubles in any engine.
    */
  def acctbalBucket(c: Column): Column =
    when(c < 0, "negative")
      .when(c < 2500, "0-2500")
      .when(c < 5000, "2500-5000")
      .otherwise("5000+")

  /** SQL twin of [[acctbalBucket]] for the DuckDB oracle. */
  val acctbalBucketSql: String =
    """CASE WHEN c_acctbal < 0 THEN 'negative'
      |     WHEN c_acctbal < 2500 THEN '0-2500'
      |     WHEN c_acctbal < 5000 THEN '2500-5000'
      |     ELSE '5000+' END""".stripMargin

  /** Deterministic lower-median of `valueCol` per `groupCols`: the element
    * at 1-based rank floor((n+1)/2) when sorted ascending. Exact (no
    * interpolation, no sketch) and identical in any SQL engine — used where
    * the oracle demands hash-equality. See scaladoc above for the
    * approx-sketch scale path.
    */
  def lowerMedian(df: DataFrame, groupCols: Seq[String], valueCol: String,
      alias: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
    val wc = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .filter(col("__rn") === floor((col("__cnt") + 1) / 2))
      .select(groupCols.map(col) :+ col(valueCol).as(alias): _*)
  }

  private def customerCountry(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey", "c_name",
      "c_acctbal")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
  }

  /** q1 / Task 4 (`CLEAN:111-124`): post count per (country, category). */
  def q1CategoryPerCountry(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_custkey", "o_orderpriority")
    val c = customerCountry(s, d).select("c_custkey", "n_name")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("n_name").as("country"),
        col("o_orderpriority").as("category"))
      .groupBy("country", "category")
      .agg(count(lit(1)).as("category_count"))
      .orderBy("country", "category")
  }

  /** q2 / Task 5 (`CLEAN:130-146`): posts per (year, category) in a year
    * range. Filter written as a timestamp range (stat-prunable at scale),
    * semantically identical to `YEAR(ts) BETWEEN 1996 AND 1999`.
    */
  def q2CategoryPerYear(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select("o_orderdate", "o_orderpriority")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("2000-01-01").cast("timestamp"))
    o.select(year(col("o_orderdate")).cast(LongType).as("post_year"),
        col("o_orderpriority").as("category"))
      .groupBy("post_year", "category")
      .agg(count(lit(1)).as("category_count"))
      .orderBy("post_year", "category")
  }

  /** [[q2CategoryPerYear]] over a year-partitioned layout — the scale
    * answer to the reference's weak point (SURVEY §4.1, `CLEAN:139-140`):
    * with the fact table written `PARTITION BY (year)` (one directory per
    * year, [[graft.sources.Sinks.partitionedParquet]]), the year-range
    * predicate becomes a PARTITION filter — non-matching years are
    * eliminated at planning from directory metadata, zero I/O, where the
    * unpartitioned form still scans every file and relies on row-group
    * stats. The predicate targets the partition column directly; the
    * year() repair rule covers the unpartitioned/stats path.
    * PlanSnapshotSpec pins PartitionFilters + the pruned partition count.
    */
  def q2CategoryPerYearPartitioned(s: SparkSession,
      partitionedPath: String): DataFrame =
    s.read.parquet(partitionedPath)
      .filter(col("o_year").between(1996, 1999))
      .select(col("o_year").cast(LongType).as("post_year"),
        col("o_orderpriority").as("category"))
      .groupBy("post_year", "category")
      .agg(count(lit(1)).as("category_count"))
      .orderBy("post_year", "category")

  /** q3 / Task 6a (`CLEAN:151-174`): most-followed poster per country —
    * row_number over (country, followers desc) with a deterministic
    * unique tiebreak key, then rank=1. At scale this is one shuffle by
    * country; Spark ≥3.3 pushes the rank-1 filter into the sort
    * (window group limit), so no group fully materializes.
    */
  def q3TopPosterPerCountry(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("country")
      .orderBy(col("follower_count").desc, col("c_custkey"))
    customerCountry(s, d)
      .select(col("n_name").as("country"), col("c_name").as("poster_name"),
        col("c_acctbal").as("follower_count"), col("c_custkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("country", "poster_name", "follower_count")
      .orderBy("country")
  }

  /** q4 / Task 6b (`CLEAN:176-185`): country whose top poster has the
    * globally max followers — q3 then global top-1. Spark plans
    * TakeOrderedAndProject (no full sort).
    */
  def q4TopCountry(s: SparkSession, d: String): DataFrame =
    q3TopPosterPerCountry(s, d)
      .orderBy(col("follower_count").desc, col("country"))
      .limit(1)
      .select("country", "follower_count")

  /** q5 / Task 7 (`CLEAN:192-222`): most popular category per "age group"
    * — bucket customers, join orders, distinct-count per (bucket, category).
    */
  def q5CategoryPerAgeGroup(s: SparkSession, d: String): DataFrame = {
    val bucket = Tables.customer(s, d)
      .select(col("c_custkey"), acctbalBucket(col("c_acctbal")).as("age_group"))
    val o = Tables.orders(s, d).select("o_custkey", "o_orderkey",
      "o_orderpriority")
    o.join(bucket, o("o_custkey") === bucket("c_custkey"))
      .select(col("age_group"), col("o_orderpriority").as("category"),
        col("o_orderkey"))
      .groupBy("age_group", "category")
      .agg(countDistinct(col("o_orderkey")).as("category_count"))
      .orderBy(col("age_group"), col("category_count").desc, col("category"))
  }

  /** q6 / Task 8 (`CLEAN:228-254`): median follower count per age group —
    * deterministic lower-median (oracle-exact).
    */
  def q6MedianFollowerByGroup(s: SparkSession, d: String): DataFrame = {
    val bucket = Tables.customer(s, d)
      .select(acctbalBucket(col("c_acctbal")).as("age_group"),
        col("c_acctbal").as("follower_count"))
    lowerMedian(bucket, Seq("age_group"), "follower_count",
        "median_follower_count")
      .orderBy(col("median_follower_count").desc, col("age_group"))
  }

  /** The `percentile_approx` formulation the reference actually uses
    * (`CLEAN:243`) — the one-pass bounded-memory scale path. Not
    * oracle-hash-comparable (sketch ≠ exact), verified rows-only + spec.
    */
  def q6MedianApprox(s: SparkSession, d: String): DataFrame = {
    val bucket = Tables.customer(s, d)
      .select(acctbalBucket(col("c_acctbal")).as("age_group"),
        col("c_acctbal").as("follower_count"))
    bucket.groupBy("age_group")
      .agg(percentile_approx(col("follower_count"), lit(0.5), lit(10000))
        .as("median_follower_count"))
      .orderBy(col("median_follower_count").desc, col("age_group"))
  }

  /** q6 again via [[graft.functions.ExactMedian]] — the count-map
    * `TypedImperativeAggregate`. One aggregation pass (map-side partial
    * fold, only value→count maps shuffle) instead of [[lowerMedian]]'s
    * full per-group sort: exact AND bounded by distinct-value count, the
    * shape that survives a billion-row group over a value-bounded domain.
    */
  def q6MedianExactAgg(s: SparkSession, d: String): DataFrame = {
    val bucket = Tables.customer(s, d)
      .select(acctbalBucket(col("c_acctbal")).as("age_group"),
        col("c_acctbal").as("follower_count"))
    bucket.groupBy("age_group")
      .agg(graft.functions.ExactMedian.exactMedian(col("follower_count"))
        .as("median_follower_count"))
      .orderBy(col("median_follower_count").desc, col("age_group"))
  }

  /** q7 / Task 9 (`CLEAN:259-270`): users joined per year. */
  def q7UsersPerYear(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(year(col("o_orderdate")).cast(LongType).as("post_year"),
        col("o_custkey"))
      .groupBy("post_year")
      .agg(countDistinct(col("o_custkey")).as("number_users_joined"))
      .orderBy(col("number_users_joined").desc, col("post_year"))

  /** q8 / Task 10 (`CLEAN:275-288`): median follower count by join-year —
    * orders⋈customer, lower-median of acctbal per year.
    */
  def q8MedianFollowerByYear(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_custkey", "o_orderdate")
    val c = Tables.customer(s, d).select("c_custkey", "c_acctbal")
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(year(col("o_orderdate")).cast(LongType).as("post_year"),
        col("c_acctbal").as("follower_count"))
    lowerMedian(joined, Seq("post_year"), "follower_count",
        "median_follower_count")
      .orderBy("post_year")
  }

  /** q9 / Task 11 (`CLEAN:293-322`): median followers by (age group ×
    * join-year). Mirrors the reference's 3-way shape: orders ⋈ customer ⋈
    * bucket-projection-of-customer (a self-join via CTE in the original —
    * Catalyst flattens/reorders it).
    */
  def q9MedianFollowerByGroupYear(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_custkey", "o_orderdate")
    val c = Tables.customer(s, d).select("c_custkey", "c_acctbal")
    val bucket = Tables.customer(s, d)
      .select(col("c_custkey").as("b_custkey"),
        acctbalBucket(col("c_acctbal")).as("age_group"))
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(bucket, col("c_custkey") === col("b_custkey"))
      .select(col("age_group"),
        year(col("o_orderdate")).cast(LongType).as("post_year"),
        col("c_acctbal").as("follower_count"))
    lowerMedian(joined, Seq("age_group", "post_year"), "follower_count",
        "median_follower_count")
      .orderBy(col("age_group").desc, col("post_year").desc)
  }
}
