package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-method bridge into `private[sql]` plan construction — the standard
  * extension-library pattern (Delta/Iceberg/Sedona ship the same shim):
  * turning a custom resolved `LogicalPlan` into a `DataFrame` has no
  * public API, and `Dataset.ofRows` is the blessed internal entry.
  */
object Internal {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
