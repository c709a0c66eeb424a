package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Max element multiplicity of a string array in one O(n) per-row pass —
  * the primitive behind repetition quality signals (top-token fraction,
  * top-n-gram fraction à la the Gopher repetition rules): the naive
  * Column formulation `array_max(transform(arr, x -> size(filter(arr,
  * y -> y = x))))` is an O(n²) INTERPRETED double lambda per row.
  * Empty array → 0. NULL elements count as one shared bucket (the
  * operator path never produces them — `tokens()` is NULL-free — but
  * the registered SQL function must not NPE on user input).
  * Registered as `graft_top_count(arr)`.
  */
case class TopCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_top_count"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_top_count needs array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TopCountKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TopCountKernel.compute($arr);")

  override protected def withNewChildInternal(
      newChild: Expression): TopCountExpr = copy(child = newChild)
}

object TopCountKernel {

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var nulls = 0
    var best = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s == null) {
        nulls += 1
        if (nulls > best) best = nulls
      } else {
        val c = counts.merge(s, 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best.toLong
  }
}
