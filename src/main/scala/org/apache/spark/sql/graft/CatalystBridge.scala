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

  /** Unload every loaded state-store provider and stop the shared
    * maintenance task (both restart lazily on the next stateful query —
    * Spark's own state-store test suites cycle stop() the same way).
    * For a process that drains MANY short-lived stateful streams
    * (finite replays: correctness gates, benches, specs), the
    * JVM-global provider registry and its maintenance work otherwise
    * accumulate across drains and progressively tax later ones — a
    * measured 3× per-drain inflation by ~250 drains (SCALING.md r18).
    * A production standing stream never hits this: it loads its
    * providers once and keeps them. */
  def resetStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
