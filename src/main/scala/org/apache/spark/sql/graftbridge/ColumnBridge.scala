package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the one
  * hook a library needs to expose custom Catalyst expressions (e.g.
  * graft.expr.FloatVecDot) through the public Column API without
  * registering session extensions. Standard extension-library
  * technique; keep this file as the only package-cheat in the repo.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
