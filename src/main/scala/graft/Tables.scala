package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Central loaders for the driver test tables (see TESTDATA.md).
  *
  * All parquet reads go through here so that scan behavior is uniform:
  * schemas come from parquet footers (deterministic, unlike the reference's
  * JSON `inferSchema`, cf. `(Clone) Pinterest Data Cleaning and Queries.py:46`),
  * and column pruning / filter pushdown reach the scan because every
  * downstream op stays in the DataFrame API.
  *
  * Scale note: at 100 TB these would be partitioned-directory reads; the
  * single-file layout here is the driver's fixture format. Nothing below
  * assumes single-file (no coalesce/collect at read time).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any realistic scale
    * (region/nation are bounded by geography; supplier is tiny in this set).
    */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos and floor-convert to a
    * microsecond timestamp (integer division — ns values exceed 2^53, so
    * double arithmetic would corrupt them). The DuckDB oracle mirrors this
    * with CAST(ts AS TIMESTAMP), the same floor-to-micros truncation.
    */
  /** Events with `ts` normalized to TIMESTAMP regardless of how the
    * fixture writer encoded it — int64 nanos (pre-regeneration driver
    * fixtures) or a native parquet timestamp (current fixtures). The
    * branch is on the FOOTER type, so both generations load identically.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
