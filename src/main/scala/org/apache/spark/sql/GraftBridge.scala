package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ catalyst Expression bridge for graft's native expressions.
  *
  * Spark 4 hides the Expression-backed Column factory behind
  * `private[sql]` (`classic.ExpressionUtils`); the established pattern for
  * external libraries shipping custom catalyst expressions is a minimal
  * bridge object living in the `org.apache.spark.sql` package. Nothing
  * else in this package — all engine code lives under `graft`.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
