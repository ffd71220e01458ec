package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.AbstractDT
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Native Catalyst expressions for the int8 serving tier's ROW-LOCAL
  * integer arithmetic (VERDICT r13 #1).
  *
  * The symmetric int8 quantization stores code = floor(v/scale + 0.5)
  * per component with one scale per vector, so the quantized cosine's
  * three sums factor completely out of the scales:
  *
  *   dot = Σ (code_i·scale)·(qcode_i·qscale) = scale·qscale·Σ code_i·qcode_i
  *   |v'|² = scale²·Σ code_i²      |q'|² = qscale²·Σ qcode_i²
  *
  * and the Σs are EXACT 64-bit integer sums (|code| ≤ 127, d = 64 ⇒
  * |Σ| ≤ 64·127² ≈ 1.03e6 — fifteen orders below Long overflow). The
  * pre-r14 serve plans materialized the 64 reconstructed components per
  * probed vector with posexplode and shuffle-aggregated them back — a
  * 64× row blowup plus an exchange per candidate where every other
  * tier's candidate stage is row-local. These expressions make the int8
  * candidate stage one codegen'd loop over the codes array, the
  * CosineSimilarity shape (same rationale: higher-order `zip_with` +
  * `aggregate` fall out of whole-stage codegen's tight loop).
  *
  * [[Int8Dot]]: Σ codes(i)·qcodes(i) over ARRAY<TINYINT> × ARRAY<BIGINT>
  * (the query side arrives as floor()'s BIGINT), shorter-prefix on
  * length mismatch. [[Int8NormSq]]: Σ codes(i)² over ARRAY<TINYINT>.
  * Both return BIGINT, null only on null input arrays.
  *
  * NULL ELEMENTS (ADVICE r14): ExpectsInputTypes type-matching ignores
  * containsNull, so a nullable array reaches eval — and getByte/getLong
  * on an unset slot would read garbage bytes. Every producer today is
  * null-free (index codes arrays are built from non-null components;
  * query codes come from floor() over a cast embedding), but the loops
  * SKIP null slots anyway — the exact semantics of the retired
  * long-form plan, whose sum() dropped null terms — so a null element
  * can never silently contribute garbage to a ranking.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Pinned input types: getByte/getLong read RAW packed bytes — a wider
  // element type would silently compute garbage, so reject it at
  // analysis, not at ranking time.
  override def inputTypes: Seq[AbstractDT] =
    Seq(ArrayType(ByteType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int8_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getByte(i).toLong * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ((long) $a.getByte($i)) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class Int8NormSq(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDT] = Seq(ArrayType(ByteType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int8_norm_sq"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0L; var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) { val c = x.getByte(i).toLong; s += c * c }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => {
      val f = ctx.freshName("int8NormSq")
      val fn = ctx.addNewFunction(f,
        s"""
           |private long $f(org.apache.spark.sql.catalyst.util.ArrayData arr) {
           |  int n = arr.numElements();
           |  long s = 0L;
           |  for (int i = 0; i < n; i++) {
           |    if (!arr.isNullAt(i)) { long c = arr.getByte(i); s += c * c; }
           |  }
           |  return s;
           |}
         """.stripMargin)
      s"$fn($a)"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Codes {
  /** Column API: Σ codes(i)·qcodes(i) — ARRAY<TINYINT> × ARRAY<BIGINT> → BIGINT. */
  def int8Dot(codes: Column, qcodes: Column): Column =
    org.apache.spark.sql.graftglue.columnOf(
      Int8Dot(org.apache.spark.sql.graftglue.exprOf(codes),
        org.apache.spark.sql.graftglue.exprOf(qcodes)))

  /** Column API: Σ codes(i)² — ARRAY<TINYINT> → BIGINT. */
  def int8NormSq(codes: Column): Column =
    org.apache.spark.sql.graftglue.columnOf(
      Int8NormSq(org.apache.spark.sql.graftglue.exprOf(codes)))
}
