package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge into `private[sql]` helpers: wrap a Catalyst Expression
  * as a public `Column` and back. Spark 4 made the Column↔Expression
  * boundary internal (`ColumnNode`); this is the sanctioned conversion
  * path (`org.apache.spark.sql.classic.ExpressionUtils`).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
