package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's sql-private Column <-> catalyst Expression
  * conversions, needed to expose custom Catalyst expressions
  * (graft.functions.NativeExpressions) as user-facing Columns. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
