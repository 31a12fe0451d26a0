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

  /** Register a function builder into an ALREADY-RUNNING session's
    * registry — the runtime twin of `SparkSessionExtensions.injectFunction`
    * (which only applies at session build). `sessionState` is
    * `private[sql]`, hence the shim.
    */
  def registerFunction(s: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    s.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
