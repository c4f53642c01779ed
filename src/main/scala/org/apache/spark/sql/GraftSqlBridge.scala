package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** Bridge into the `org.apache.spark.sql` package namespace: building a
  * DataFrame from a custom LogicalPlan requires the package-private
  * `Dataset.ofRows`.  This is the standard extension-library technique —
  * no Spark internals are modified, we only re-export one constructor.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** Column over a raw Catalyst expression (and back) — needed to use a
    * custom TypedImperativeAggregate through the DataFrame API. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
