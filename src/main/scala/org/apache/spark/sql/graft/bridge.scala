package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ClassicConversions, Dataset}

/** Minimal bridge to two `private[sql]` seams the custom-operator API
  * needs (the standard pattern for Spark extension libraries):
  * Column → Catalyst Expression, and planning a custom LogicalPlan as
  * a DataFrame. Nothing else from the private surface is touched.
  */
object bridge {
  /** Eagerly converts the Column's node tree through the session's
    * converter (ExpressionUtils.expression only wraps it lazily in an
    * Unevaluable ColumnNodeExpression, which custom operators cannot
    * evaluate). */
  def expression(spark: SparkSession, c: Column): Expression =
    ClassicConversions.castToImpl(spark).expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(ClassicConversions.castToImpl(spark), plan)

  /** The inverse seam: wrap a Catalyst Expression back into a Column
    * (lets queries use codegen-capable internal expressions — e.g.
    * BloomFilterMightContain — that have no public function). */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
