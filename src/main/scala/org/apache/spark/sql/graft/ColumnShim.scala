package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  * `ExpressionUtils` is `private[sql]` in Spark 4 (Column no longer
  * wraps an Expression directly), so custom native expressions need
  * this in-package shim — the standard pattern for Spark extension
  * libraries. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
