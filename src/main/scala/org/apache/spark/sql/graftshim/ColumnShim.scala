package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-private Column<->Expression converters (Spark 4 moved
  * Column to a plan-agnostic wrapper; ExpressionUtils is private[sql]).
  * Lives under org.apache.spark.sql so the access qualifier is satisfied.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
