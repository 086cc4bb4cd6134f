package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal package-private bridge: lets the graft library wrap a custom
  * [[LogicalPlan]] (e.g. [[graft.plans.AsOfJoin]]) in a DataFrame —
  * `Dataset.ofRows` is `private[sql]`, the standard extension-library
  * seam for SparkSessionExtensions-based operators. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
