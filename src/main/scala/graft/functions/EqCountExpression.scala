package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of positions where two long arrays agree — the MinHash
  * signature match-counter that turns a banded candidate pair into an
  * estimated Jaccard (m / k). Value-identical to the HOF form
  * `aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
  * 0, _ + _)` INCLUDING its padding algebra: zip_with extends to the
  * longer array with NULLs, a NULL-padded comparison is NULL, and
  * `otherwise(0)` absorbs it — so positions past the shorter array (or
  * with a NULL element on either side) contribute 0, and only a NULL
  * ARRAY nulls the result. The HOF form evaluates interpreted per
  * element per PAIR — in the heavy-duplication regime the banded join
  * emits tens of millions of pairs, each paying k lambda dispatches
  * plus an intermediate array; this is one static-kernel call.
  * Registered as `graft_eq_count` (GraftExtensions).
  */
case class EqCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_eq_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_eq_count needs two arrays of bigint, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EqCountKernel.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.EqCountKernel.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqCountExpr =
    copy(left = newLeft, right = newRight)
}

object EqCountKernel {
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
          a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    m
  }
}
