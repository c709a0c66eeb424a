package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-prefix length of two strings —
  * `graft_lcp('abcx', 'abcy') = 3`. The storage-layout primitive
  * behind delta/prefix compression estimates: a sorted column's
  * adjacent-row LCP sum IS the bytes a prefix-compressed encoding
  * saves, and the neighborhood function behind sorted-order
  * candidate generation ([[graft.operators.NearDup]]'s sorted
  * neighborhood).
  *
  * Spark has no LCP function; the composable alternative — a
  * `filter(sequence(1, n), i -> substr(a,1,i) = substr(b,1,i))` HOF
  * tree (the q202 oracle trick) — allocates a fresh substring PAIR
  * per position, O(L²) characters per row. This is a native
  * BinaryExpression: one O(min(m,n)) scan, codegen'd into the stage.
  * Lengths are UTF-16 code units (≡ codepoints for BMP text; the
  * engine's corpus is ASCII-normalized upstream).
  */
case class LcpExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lcp"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_lcp needs (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LcpKernel.lcp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.LcpKernel.lcp($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcpExpr =
    copy(left = newLeft, right = newRight)
}

object LcpKernel {
  def lcp(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i
  }
}
