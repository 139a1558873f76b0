package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` bridge the engine needs: constructing a
  * DataFrame from a custom LogicalPlan (`graft.plans.AsOfJoinPlan`).
  * Spark exposes custom-node INJECTION (SparkSessionExtensions
  * strategies/rules) as public API but not plan→Dataset construction,
  * so every library shipping its own operator node (Delta, Iceberg,
  * frameless, …) carries exactly this shim. Nothing else in the repo
  * reaches into the spark namespace.
  */
object GraftSql {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Column → resolved Catalyst Expression (Spark 4 moved `.expr`
    * behind the classic ColumnNode converter). */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
