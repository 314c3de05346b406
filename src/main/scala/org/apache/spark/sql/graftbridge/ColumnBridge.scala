package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (classic.ExpressionUtils); custom Catalyst expressions still need it to
  * expose a Column API. This bridge lives inside the org.apache.spark.sql
  * package solely to re-export those two conversions — the standard pattern
  * for Catalyst-extending libraries. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
