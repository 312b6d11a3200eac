package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters so
  * graft's native Catalyst expressions (graft.expressions.*) can be
  * exposed as plain `Column`s — the standard pattern for extension
  * libraries that ship their own codegen'd expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
