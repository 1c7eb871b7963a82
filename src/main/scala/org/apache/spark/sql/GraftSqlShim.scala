package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors for graft's custom logical
  * plans (the standard extension-library pattern: a DataFrame must be
  * minted from a hand-built LogicalPlan, and `Dataset.ofRows` is the
  * only door). Kept to this single accessor. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
