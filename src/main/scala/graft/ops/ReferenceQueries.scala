package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 9 analytics queries in their ORIGINAL shape — over
  * cleaned pin/geo/user tables (not the testdata remapping in [[Queries]],
  * which exists for the DuckDB oracle). A user of the reference switches by
  * calling these with their three cleaned DataFrames.
  *
  * Semantics cite `(Clone) Pinterest Data Cleaning and Queries.py` (CLEAN).
  * Every query is pure DataFrame API — Catalyst sees the whole plan, so
  * pruning/pushdown/broadcast decisions happen exactly as in the SQL
  * originals (CTEs inline, `InlineCTE`).
  */
object ReferenceQueries {

  /** Task 4 (`CLEAN:111-124`): most popular category per country. */
  def q1(geo: DataFrame, pin: DataFrame): DataFrame =
    geo.join(pin, Seq("ind"))
      .groupBy("country", "category")
      .agg(count(lit(1)).as("category_count"))

  /** Task 5 (`CLEAN:130-146`): posts per category, 2018-2022. The year
    * filter is a timestamp range (stat-prunable), semantically identical
    * to `YEAR(timestamp) BETWEEN 2018 AND 2022`.
    */
  def q2(geo: DataFrame, pin: DataFrame): DataFrame =
    geo.filter(col("timestamp") >= lit("2018-01-01").cast("timestamp") &&
        col("timestamp") < lit("2023-01-01").cast("timestamp"))
      .join(pin, Seq("ind"))
      .groupBy(year(col("timestamp")).as("post_year"), col("category"))
      .agg(count(lit(1)).as("category_count"))
      .orderBy("post_year")

  /** Task 6a (`CLEAN:151-174`): most-followed poster per country. */
  def q3(geo: DataFrame, pin: DataFrame): DataFrame = {
    val w = Window.partitionBy("country")
      .orderBy(col("follower_count").desc, col("poster_name"))
    geo.join(pin, Seq("ind"))
      .select("country", "poster_name", "follower_count")
      .withColumn("row_num", row_number().over(w))
      .filter(col("row_num") === 1)
      .drop("row_num")
  }

  /** Task 6b (`CLEAN:176-185`): country whose top poster has globally max
    * followers — TakeOrderedAndProject, no full sort.
    */
  def q4(geo: DataFrame, pin: DataFrame): DataFrame =
    q3(geo, pin)
      .orderBy(col("follower_count").desc)
      .limit(1)
      .select("country", "follower_count")

  /** Task 7 (`CLEAN:192-222`): most popular category per age group. */
  def q5(user: DataFrame, pin: DataFrame): DataFrame =
    user.select(col("ind"), Cleaners.ageBucket(col("age")).as("age_group"))
      .join(pin, Seq("ind"))
      .groupBy("age_group", "category")
      .agg(countDistinct(col("ind"), col("category")).as("category_count"))
      .orderBy(col("age_group"), col("category_count").desc)

  /** Task 8 (`CLEAN:228-254`): median follower count per age group —
    * percentile_approx(0.5, 10000), the reference's own accuracy.
    */
  def q6(user: DataFrame, pin: DataFrame): DataFrame =
    user.select(col("ind"), Cleaners.ageBucket(col("age")).as("age_group"))
      .join(pin, Seq("ind"))
      .groupBy("age_group")
      .agg(percentile_approx(col("follower_count"), lit(0.5), lit(10000))
        .as("median_follower_count"))
      .orderBy(col("median_follower_count").desc)

  /** Task 9 (`CLEAN:259-270`): users joined per year. */
  def q7(user: DataFrame): DataFrame =
    user.groupBy(year(col("date_joined")).as("post_year"))
      .agg(countDistinct(col("ind")).as("number_users_joined"))
      .orderBy(col("number_users_joined").desc)

  /** Task 10 (`CLEAN:275-288`): median followers by join-year. */
  def q8(user: DataFrame, pin: DataFrame): DataFrame =
    user.join(pin, Seq("ind"))
      .groupBy(year(col("date_joined")).as("post_year"))
      .agg(percentile_approx(col("follower_count"), lit(0.5), lit(10000))
        .as("median_follower_count"))
      .orderBy("post_year")

  /** Task 11 (`CLEAN:293-322`): median followers by (age group ×
    * join-year) — the 3-way join with the age-group CTE self-join.
    */
  def q9(user: DataFrame, pin: DataFrame): DataFrame = {
    val buckets = user.select(col("ind"),
      Cleaners.ageBucket(col("age")).as("age_group"))
    user.join(pin, Seq("ind"))
      .join(buckets, Seq("ind"))
      .groupBy(col("age_group"), year(col("date_joined")).as("post_year"))
      .agg(percentile_approx(col("follower_count"), lit(0.5), lit(10000))
        .as("median_follower_count"))
      .orderBy(col("age_group").desc, col("post_year").desc)
  }
}
