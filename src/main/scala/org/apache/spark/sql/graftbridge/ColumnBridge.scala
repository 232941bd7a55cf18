package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge: `ExpressionUtils.column` is private[sql], and
  * wrapping a custom Catalyst Expression into a user-facing Column is the
  * supported-but-internal path in Spark 4 (the classic Column wraps a
  * ColumnNode, not an Expression). Subpackage placement grants access.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
