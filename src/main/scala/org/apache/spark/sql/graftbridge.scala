package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ↔ Expression
  * converters — the standard pattern for third-party Catalyst
  * extensions (graft's custom expressions need a public way to surface
  * as `Column`s without a session FunctionRegistry round-trip). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
