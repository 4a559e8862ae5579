package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression converters —
  * the standard pattern public Spark extension libraries use to wrap a
  * custom Catalyst `Expression` as a `Column` without registering it in a
  * session's function registry (which would break callers that build their
  * own SparkSession). Nothing else from the private surface is exposed.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
