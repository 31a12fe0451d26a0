package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink-side layout control (SURVEY.md §2.10 + the scale story the
  * reference's flat `saveAsTable` misses): partitioned directories for
  * partition pruning, in-file ordering for row-group min/max locality,
  * bounded file sizes for balanced downstream tasks.
  */
object Sinks {

  /** Overwrite-parquet with Hive-style partition directories. Reads with a
    * predicate on `partitionCols` then scan only matching directories
    * (PartitionFilters in the plan — verified in SinksSpec).
    */
  def partitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): Unit = {
    val sorted =
      if (sortCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else df
    val w = sorted.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    else w).parquet(path)
  }

  /** Bucketed managed table — the co-located-join layout: both sides of a
    * recurring equi-join written with `bucketBy(n, key)` (+ in-bucket
    * sort) join WITHOUT any Exchange: each task zips bucket i with bucket
    * i. At 100 TB this converts the recurring fact⋈fact shuffle (the
    * dominant cost of repeated pipeline runs) into a one-time write-side
    * layout decision — the same trade the reference's flat `saveAsTable`
    * never makes. Bucket counts must match (or divide) across join sides.
    * Uses the session catalog (bucketing metadata lives in the table
    * definition, not the parquet files).
    */
  def bucketedTable(df: DataFrame, table: String, buckets: Int,
      bucketCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** The reference's `saveAsTable` + re-query pattern without a metastore:
    * write parquet, read it back, register a temp view — the manual
    * materialization it performs between q3 and q4
    * (`(Clone) Pinterest Data Cleaning and Queries.py:174-183`).
    */
  def materialize(df: DataFrame, path: String, viewName: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    val back = df.sparkSession.read.parquet(path)
    back.createOrReplaceTempView(viewName)
    back
  }
}
