package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the sql-package-private `Dataset.ofRows` so graft's
  * custom logical plan nodes (`graft.plans.*`) can be wrapped back
  * into ordinary `DataFrame`s. Pure visibility shim, same pattern as
  * [[GraftColumnBridge]].
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
