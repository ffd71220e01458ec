package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character-statistics expressions: per-document Shannon entropy
  * (bits) and distinct-character count — q56's quality signals as
  * ROW-LOCAL functions.
  *
  * Why native expressions rather than composition: entropy of a document
  * is a pure function of that one row, but the declarative formulation is
  * forced through `explode(chars) → groupBy(doc, ch) → groupBy(doc)` —
  * two corpus-wide shuffles whose exchanged volume is the character count
  * of the corpus — or through array HOFs, which run interpreted (the ~70×
  * trap, SCALE.md). A 30-line histogram loop in codegen does the same
  * work with ZERO shuffles and stays inside whole-stage codegen (the
  * generated code calls the static helper below, like builtin expressions
  * call their runtime helpers).
  *
  * Oracle-parity by construction: each (c/n)·ln(c/n) term is computed on
  * the same doubles the DataFrame formulation produced, rounded to
  * DECIMAL(30,8) with exactly Spark's double→decimal cast semantics
  * (`BigDecimal.valueOf(d).setScale(8, HALF_UP)` — the shortest-repr
  * conversion `Decimal(Double)` uses), and summed exactly (decimal
  * addition is associative, so histogram iteration order cannot matter —
  * the same argument that made the shuffled dsum portable). Characters
  * iterate as UTF-16 code units, which equals the oracle's per-code-point
  * substr on this corpus (pure ASCII — the q71-verified invariant; a
  * non-BMP corpus would need a codePoints loop).
  */
object CharStats {

  /** −Σ p·ln p over the char histogram, DECIMAL(30,8)-accumulated,
    * surfaced in NATS (the caller divides by ln 2 — q56 divides by an
    * exact Ln2 literal so both engines share the operand). 0.0 for empty
    * input, matching the anchored left join it replaces. */
  def entropyNatsNeg(s: UTF8String): Double = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[Character, Integer]()
    var i = 0
    while (i < n) {
      val ch = str.charAt(i)
      counts.put(ch, counts.getOrDefault(ch, 0) + 1)
      i += 1
    }
    var sum = JBigDecimal.ZERO
    val it = counts.values().iterator()
    val nd = n.toDouble
    while (it.hasNext) {
      val p = it.next().doubleValue() / nd
      val term = p * math.log(p)
      sum = sum.add(JBigDecimal.valueOf(term).setScale(8, RoundingMode.HALF_UP))
    }
    -sum.doubleValue()
  }

  def distinctChars(s: UTF8String): Long = {
    val str = s.toString
    val seen = new java.util.HashSet[Character]()
    var i = 0
    while (i < str.length) { seen.add(str.charAt(i)); i += 1 }
    seen.size().toLong
  }

  /** Column API. */
  def charEntropyNatsNeg(c: Column): Column =
    org.apache.spark.sql.graftglue.columnOf(
      CharEntropyNatsNeg(org.apache.spark.sql.graftglue.exprOf(c)))

  def charDistinct(c: Column): Column =
    org.apache.spark.sql.graftglue.columnOf(
      CharDistinct(org.apache.spark.sql.graftglue.exprOf(c)))
}

/** −Σ p·ln p (nats) of the char histogram of a string. */
case class CharEntropyNatsNeg(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy_nats_neg"

  override def nullSafeEval(input: Any): Any =
    CharStats.entropyNatsNeg(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStats.entropyNatsNeg($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct-character count of a string. */
case class CharDistinct(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_distinct"

  override def nullSafeEval(input: Any): Any =
    CharStats.distinctChars(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStats.distinctChars($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
