package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (classic.ExpressionUtils); custom Catalyst expressions still need it to
  * expose a Column API. This bridge lives inside the org.apache.spark.sql
  * package solely to re-export those two conversions — the standard pattern
  * for Catalyst-extending libraries. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a resolved logical plan as a DataFrame (Dataset.ofRows is
    * `private[sql]` too) — what lets a diagnostic run a side query over
    * a rule's join children (the overlap-rewrite preflight). */
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `StringType.supportsBinaryEquality` is `private[sql]` — true iff
    * SQL equality on this string type is plain byte equality (the
    * UTF8_BINARY collation), the property that makes xxhash64-keyed
    * join topologies sound on string elements. */
  def binaryEqualityString(s: org.apache.spark.sql.types.StringType): Boolean =
    s.supportsBinaryEquality
}
