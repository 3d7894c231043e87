package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-access shim: Column ↔ Catalyst Expression conversion for the
  * engine's native expressions (graft.functions). Spark 4 scopes
  * `classic.ExpressionUtils` as private[sql], so the bridge lives in this
  * package — the same technique Spark's own connectors use. Only
  * conversion; no Spark internals are re-implemented here. */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
