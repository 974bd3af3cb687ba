package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard technique for exposing custom Catalyst expressions as
  * `Column`s from library code on Spark 4.x (where `Column` wraps a
  * ColumnNode rather than an Expression directly).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Execute a hand-built LogicalPlan as a DataFrame (test harness for
    * optimizer rules applied outside an extensions-built session).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a custom expression as a session-scoped SQL function (for
    * sessions not built via `withExtensions(new GraftExtensions)`).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
