package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public Column <-> Expression accessors; the classic
  * bridge (org.apache.spark.sql.classic.ExpressionUtils) is private[sql], so
  * this shim re-exports the two conversions our custom Catalyst expressions
  * need. No Spark internals are modified. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
