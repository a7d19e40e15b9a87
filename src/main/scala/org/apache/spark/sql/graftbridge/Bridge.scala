package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Accessor for the `private[sql]` Column ↔ Expression bridge — the
  * standard shim a Spark extension library compiles into an
  * `org.apache.spark.sql` subpackage to expose custom Catalyst
  * expressions through the public Column API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
