package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the RUNTIME optimizations the 100 TB story leans on — the ones
  * a plan snapshot cannot show because they only appear during
  * execution (AQE re-plans between stages):
  *
  *  - AQE skew-join splitting: the built-in answer to hot keys, the
  *    automatic twin of the explicit `Relational.saltedJoinCounts`.
  *  - Runtime Bloom-filter injection: Spark's own sideways information
  *    passing, the native twin of the explicit `Relational.bloomSemiJoin`.
  *  - Dynamic partition pruning: join-driven directory elimination, the
  *    runtime twin of the static PartitionFilters pruning SinksSpec pins.
  *
  * Each test asserts on the FINAL adaptive plan (after execution), not
  * the initial one.
  */
class RuntimeOptimizationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def withConfs[T](confs: (String, String)*)(f: => T): T =
    TestSpark.withConfs(confs: _*)(f)

  /** Execute THIS DataFrame's own QueryExecution (collect — a noop
    * write or df.count() would plan a separate execution and leave this
    * one's adaptive plan un-finalized), then return the final plan.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the " +
      "final plan) — the automatic twin of the manual salted join") {
    import spark.implicits._
    // one hot key carrying ~100x the rows of every other key, with an
    // incompressible md5 payload that the aggregate keeps alive —
    // 100k rows of a bare repeated key LZ4-compress below any skew
    // threshold and AQE (correctly) sees no skew to split
    val skewed = spark.range(0, 120000)
      .select(when(col("id") < 100000, lit(7L)).otherwise(col("id") % 37)
        .as("k"), md5(col("id").cast("string")).as("p"))
    val dim = (0L until 64L).map(k => (k, s"dim_$k")).toDF("k", "name")
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // broadcast would erase the shuffle join AQE needs to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // NOTE: nothing above the join may REQUIRE the join's hash
      // distribution (e.g. a groupBy on the join key) — AQE refuses to
      // split a skewed partition when the split would break a parent's
      // required distribution without an extra shuffle. Real pipelines
      // project/filter after fact⋈dim far more often than they re-group
      // on the join key, so the split applies exactly where skew hurts.
      // global (keyless) aggregate: no distribution requirement on the
      // join's output, and nothing corpus-sized reaches the driver
      val joined = skewed.join(dim.hint("shuffle_merge"), Seq("k"))
        .groupBy().agg(sum(length(col("p"))).as("n"))
      val plan = finalPlan(joined)
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    }
  }

  test("Spark injects a runtime Bloom filter into a selective join (the " +
      "native sideways-information-passing twin of r_bloom_join)") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "50MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val dim = Tables.orders(spark, TestSpark.sf001)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val fact = Tables.lineitem(spark, TestSpark.sf001)
        .select("l_orderkey", "l_quantity")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
      assert(joined.collect().head.getDouble(0) > 0)
    }
  }

  test("dynamic partition pruning: a dimension filter prunes the fact's " +
      "partition directories AT RUNTIME (no static partition predicate)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dpp").toString + "/orders"
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .withColumn("o_year", year(col("o_orderdate")))
    graft.sources.Sinks.partitionedParquet(orders, dir, Seq("o_year"))
    val years = orders.select("o_year").distinct().count()
    withConfs(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // tiny fixture: force the reuse-broadcast DPP path to engage
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
        -> "10.0") {
      import spark.implicits._
      // dimension: the kept years are only known AFTER filtering the dim
      // TABLE — a static planner cannot prune on them. Two traps, both
      // hit while writing this test: (a) DPP requires a predicate its
      // isLikelySelective recognizes (IN/equality — Not(EqualTo) does
      // not count); (b) the dim must be a real scan — a local Seq gets
      // its filter CONSTANT-FOLDED into the LocalTableScan and the DPP
      // rule then sees a bare relation with no selective predicate.
      val dimDir = java.nio.file.Files
        .createTempDirectory("graft_dpp_dim").toString + "/dim"
      Seq((1995, "a"), (1996, "b"), (1997, "skip"))
        .toDF("y", "tag").write.parquet(dimDir)
      val dim = spark.read.parquet(dimDir)
        .filter(col("tag").isin("a", "b"))
      val fact = spark.read.parquet(dir)
      val joined = fact.join(dim, col("o_year") === col("y"))
        .groupBy("y").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.nonEmpty)
      val scan = joined.queryExecution.executedPlan.toString
      assert(scan.contains("dynamicpruning") ||
        scan.contains("DynamicPruning") ||
        scan.contains("dynamicpruningexpression"),
        s"no dynamic pruning subscription in the scan:\n$scan")
      assert(years > 2, "fixture must span more years than the dim keeps")
    }
  }
}
