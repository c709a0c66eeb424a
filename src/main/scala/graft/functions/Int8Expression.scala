package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, FloatType, LongType}

/** Symmetric per-vector int8 scalar quantization in one per-row pass:
  * `q_i = round(x_i · 127 / max|x|)` clamped to [−127, 127], byte
  * output — 4× narrower than the float vector it replaces, which is the
  * point: a quantized corpus broadcasts/shuffles/stores at a quarter of
  * the width, and the int dot products downstream are exact integers
  * (no cross-engine float-parity risk in the coarse ranking).
  *
  * Rounding is ties-away-from-zero (Spark's and DuckDB's `round`), NOT
  * `Math.round`'s floor(x+0.5) — they differ on negative halves. The
  * arithmetic is fixed as (x.toDouble · 127.0) / maxAbs so any engine
  * reproduces the exact doubles. All-zero vector → all-zero bytes.
  * NULL element → NULL result (mirrors the HOF transform's NULL
  * propagation). Registered as `graft_quantize_i8(vec)`.
  */
case class QuantizeI8Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "graft_quantize_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_quantize_i8 needs array<float>, got ${other.simpleString}")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Int8Kernel.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => s"""
      ${ev.value} = graft.functions.Int8Kernel.quantize($vec);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeI8Expr = copy(child = newChild)
}

/** Exact integer dot product of two int8 (byte-array) vectors, LONG
  * result — the quantized coarse score. Length mismatch or NULL element
  * → NULL (same degenerate-case contract as [[DotProduct]]).
  * Registered as `graft_dot_i8(a, b)`.
  */
case class DotI8Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_dot_i8 needs two arrays of tinyint, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Int8Kernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = graft.functions.Int8Kernel.dot($a, $b);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Long) r).longValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI8Expr =
    copy(left = newLeft, right = newRight)
}

object Int8Kernel {

  /** See [[QuantizeI8Expr]]; returns null on a NULL element. */
  def quantize(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    var maxAbs = 0d
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val a = Math.abs(vec.getFloat(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val q =
        if (maxAbs == 0d) 0L
        else {
          val v = (vec.getFloat(i).toDouble * 127.0) / maxAbs
          // ties away from zero, like Spark's and DuckDB's round()
          val r = if (v < 0) Math.ceil(v - 0.5) else Math.floor(v + 0.5)
          Math.max(-127d, Math.min(127d, r)).toLong
        }
      out(i) = q.toByte
      i += 1
    }
    new GenericArrayData(out)
  }

  /** See [[DotI8Expr]]; boxed Long (null = degenerate input). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
