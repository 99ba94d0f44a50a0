package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's Catalyst expressions and the public Column API.
  * Spark 4 made Expression <-> Column conversion private[sql]; extensions
  * conventionally shim it from inside the spark namespace.
  */
object ColumnBridge {
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
