package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan ⇄ DataFrame bridge (`Dataset.ofRows` and `queryExecution`
  * are `private[sql]`): lets an optimizer/resolution rule assemble its
  * replacement plan with the public Dataset API instead of hand-building
  * Catalyst trees. */
object PlanBridge {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def plan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
