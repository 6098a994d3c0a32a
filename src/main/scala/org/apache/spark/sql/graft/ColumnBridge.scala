package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's `Column` wraps a ColumnNode, not an Expression, and the
  * converter (`classic.ExpressionUtils`) is `private[sql]` — custom
  * expressions that can't go through the FunctionRegistry (they carry
  * runtime state like a `Broadcast`, which no SQL argument can express,
  * e.g. graft.functions.BloomContains) need this two-method bridge in the
  * sql package to become `Column`s. Same precedent as
  * org.apache.spark.graft.ListenerBridge.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
