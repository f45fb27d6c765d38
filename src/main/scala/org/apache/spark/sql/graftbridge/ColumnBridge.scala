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
}
