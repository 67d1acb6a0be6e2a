package org.apache.spark.sql.classic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan construction — the standard pattern for
  * Spark extension libraries that create their own logical operators
  * (a `Dataset` can only be built from a `LogicalPlan` inside the sql
  * package). Kept to the single call the engine needs. */
object GraftBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** Column over a raw Catalyst expression (e.g. a `Literal` of a struct
    * value that `functions.lit` cannot build). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column — for composing Columns into
    * Catalyst nodes `functions._` exposes no builder for (e.g. `StringSplit`
    * with a non-literal regex). */
  def expr(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)
}
