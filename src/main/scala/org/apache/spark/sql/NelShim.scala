package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Spark 4.x moved the `Column` ↔ Catalyst `Expression` bridge behind
 * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`). This
 * shim — placed in the `org.apache.spark.sql` package, the standard
 * pattern used by public Spark extension libraries — re-exposes exactly
 * the two conversions nelspark's function facade needs.
 */
object NelShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a SQL function name backed by a Catalyst expression builder. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** Drain the async listener event bus (`private[spark]`): listener
    * totals read right after an action would otherwise miss queued
    * tail SparkListenerTaskEnd events. */
  def waitForListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
