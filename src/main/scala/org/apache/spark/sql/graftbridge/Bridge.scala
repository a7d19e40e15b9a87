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

  /** `SparkSession.cloneSession()` is `private[sql]` in Spark 4: a new
    * session sharing the SparkContext/SharedState with a COPY of the
    * caller's SessionState (confs, temp views) that then diverges.
    * Exposed for conf-scoped query building — raise a session conf for
    * one returned DataFrame without mutating the caller's session
    * (`newSession()` is public but resets confs instead of inheriting).
    */
  def cloneSession(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
