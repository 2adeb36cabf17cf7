package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge over the `private[sql]` Column ⇄ Expression seam in
  * Spark 4's classic API (columnNodeSupport.scala). The standard pattern
  * for Catalyst extension libraries: one object inside the
  * `org.apache.spark.sql` package tree, nothing else of Spark's internals
  * leaks out.
  */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Execute a resolved [[LogicalPlan]] as a DataFrame — the
    * `Dataset.ofRows` seam, `private[sql]` in Spark 4. Used by the
    * IndexedTopK rule's plan-time saturation probe. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark), plan)
}
