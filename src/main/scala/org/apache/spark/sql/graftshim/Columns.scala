package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** `classic.ExpressionUtils` is `private[sql]` in Spark 4; this shim lives
  * inside the `org.apache.spark.sql` package tree solely to convert between
  * [[Column]] and a custom Catalyst [[Expression]] (the standard
  * access-widening pattern for Spark-internal hooks). Used by the compiled
  * Bloblang subset's native expressions (graft.functions.Exprs).
  */
object Columns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
