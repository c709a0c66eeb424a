package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a LITERAL string set:
  * `graft_count_in(toks, array('the','a',...))`. Duplicates count each
  * occurrence — value-identical (for non-NULL arrays) to the composable
  * `size(filter(toks, x => x.isin(set)))`, whose lambda evaluates
  * interpreted per token; here the set is materialized ONCE into a hash
  * set shared by all rows, and `doGenCode` emits one static call per row
  * — the marker-counting hot path of language ID and stopword ratios
  * stays inside whole-stage codegen. NULL elements never match; a NULL
  * array yields NULL.
  */
case class CountInExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_count_in"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _))
          if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_count_in needs a FOLDABLE (literal) set argument")
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_count_in needs (array<string>, array<string>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        val u = arr.getUTF8String(i)
        if (u != null) { s.add(u.clone()); () }
        i += 1
      }
    }
    s
  }

  override protected def nullSafeEval(a: Any, unused: Any): Any =
    CountInKernel.count(a.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, (arr, _) =>
      s"${ev.value} = graft.functions.CountInKernel.count($arr, $setRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInExpr =
    copy(left = newLeft, right = newRight)
}

object CountInKernel {
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      if (u != null && set.contains(u)) c += 1
      i += 1
    }
    c
  }
}
