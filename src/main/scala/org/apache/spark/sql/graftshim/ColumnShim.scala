package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge — `ExpressionUtils` is
  * `private[sql]`, and graft's native expressions (e.g.
  * [[graft.functions.RankInCuts]]) need wrapping without a
  * FunctionRegistry round trip when they carry non-literal payloads. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
