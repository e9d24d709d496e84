package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-package-private Column ⇄ Expression converters so
  * graft's custom Catalyst expressions (e.g. `graft.functions.DotProduct`)
  * can surface as ordinary `Column`s on Spark 4's Connect-compatible
  * Column API. No behavior — pure visibility shim.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
