package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge. Spark 4 made the Expression-backed Column
  * constructor `private[sql]` (`classic.ExpressionUtils`); custom Catalyst
  * expressions (graft.functions.HashExpressions) still need it, so this
  * two-liner lives inside the `org.apache.spark.sql` package — the standard
  * pattern for Spark-native extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
