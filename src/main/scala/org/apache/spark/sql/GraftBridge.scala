package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the standard
  * shim any Spark extension library needs to surface custom Catalyst
  * expressions through the public Column API (Spark 4 moved Column to a
  * ColumnNode wrapper; these are the sanctioned classic-mode converters).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
