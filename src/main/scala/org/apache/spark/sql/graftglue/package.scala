package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters — the
  * standard pattern for libraries that define native Catalyst expressions
  * against Spark 4's split Column API (Column no longer wraps Expression
  * publicly).
  */
package object graftglue {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
