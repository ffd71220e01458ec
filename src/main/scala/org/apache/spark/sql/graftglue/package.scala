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

  /** `AbstractDataType` is `private[sql]`, but ExpectsInputTypes —
    * the analysis-time type guard every well-formed native expression
    * should mix in — needs it in `inputTypes` signatures. Alias it out
    * the same way the Column converters are bridged. */
  type AbstractDT = org.apache.spark.sql.types.AbstractDataType
}
