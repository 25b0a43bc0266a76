package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal `private[sql]` access shim — the single intentional intrusion
  * into the Spark namespace (cf. SURVEY §2.11: the reference keeps three
  * such shims; we keep one). Spark 4 moved Column↔Expression conversion
  * behind `sql.classic.ExpressionUtils`, which custom Catalyst expressions
  * need to surface as user-facing `Column`s.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
