package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the classic
  * `ExpressionUtils` `private[sql]` (the Column API is decoupled from
  * Catalyst for Connect), so third-party native expressions reach it
  * through a shim in the `org.apache.spark.sql` package — the standard
  * pattern for Spark-native extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan (`Dataset.ofRows` is
    * `private[sql]` in Spark 4 — same shim rationale as above; needed
    * to surface custom logical operators like graft's AsofJoin through
    * the public DataFrame API).
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
