package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionColumnNode, ExpressionUtils}

/** Package-placed bridge: Spark 4 made the Expression↔Column seams
  * (`ExpressionUtils`, `ColumnNode`) private[sql]; custom native
  * expressions still need them to surface as Columns in classic mode.
  * This is the only file outside the graft namespace.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = Column(ExpressionColumnNode(e))
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
