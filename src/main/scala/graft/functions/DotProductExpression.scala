package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two float/double array columns, in double
  * arithmetic, summed left-to-right.
  *
  * Semantically identical to the composable HOF form
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0d, (acc, v) => acc + v)`
  * (and to DuckDB's `list_dot_product`) INCLUDING the degenerate cases:
  * length mismatch → NULL (zip_with pads with NULL, the sum absorbs it)
  * and any NULL element → NULL. The difference is purely physical: HOF
  * lambdas evaluate interpreted — one or two function invocations plus an
  * intermediate array allocation per element — which made pairwise cosine
  * scoring the dominant cost of the similarity operators. `doGenCode`
  * emits the obvious fused loop (no intermediate array, no virtual
  * calls), keeping the whole scoring expression inside whole-stage
  * codegen. Registered as `graft_dot` (see GraftExtensions).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if (lt == FloatType || lt == DoubleType) && lt == rt =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "graft_dot needs two arrays of float or two arrays of double, " +
            s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val float = elemType == FloatType
    var acc = 0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc +=
        (if (float) x.getFloat(i).toDouble else x.getDouble(i)) *
        (if (float) y.getFloat(i).toDouble else y.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = leftGen.value
    val b = rightGen.value
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val bad = ctx.freshName("bad")
    val getter = if (elemType == FloatType) "getFloat" else "getDouble"
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          int $n = $a.numElements();
          if ($b.numElements() == $n) {
            boolean $bad = false;
            double $acc = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
              $acc += (double) $a.$getter($i) * (double) $b.$getter($i);
            }
            if (!$bad) { ${ev.isNull} = false; ${ev.value} = $acc; }
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
