package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge from custom Catalyst `Expression`s to the public `Column` API.
  * `classic.ExpressionUtils.column` is `private[sql]` in Spark 4, so the
  * accessor lives in the `org.apache.spark.sql` package — the standard
  * pattern for Spark-extension libraries shipping native expressions.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
