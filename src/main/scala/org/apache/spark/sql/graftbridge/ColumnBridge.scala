package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge: `ExpressionUtils` is `private[sql]`, so the conversion
  * between `Column` and Catalyst `Expression` (needed to expose custom
  * codegen expressions like graft's DotProduct through the public Column
  * API) lives in a package under `org.apache.spark.sql`. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
