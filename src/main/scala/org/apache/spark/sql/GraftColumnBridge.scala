package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column<->Expression conversions so graft's
  * custom Catalyst expressions can surface as ordinary Columns. Spark 4 hides
  * the classic converters behind private[sql]; this is the supported extension
  * seam (same trick Spark's own connectors use). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
