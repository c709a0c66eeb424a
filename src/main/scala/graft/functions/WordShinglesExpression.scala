package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a token array: element i is
  * `tokens[i..i+n-1]` joined by single spaces; fewer than n tokens yields
  * an empty array.
  *
  * Value-identical to the composable HOF form
  * (`transform(sequence(...), i => concat_ws(" ", slice(toks, i, n)))`,
  * TextAnalysis.wordShinglesOf) including concat_ws's skip-NULL-element
  * behavior — but the HOF evaluates interpreted: per shingle, a sequence
  * element box, a lambda dispatch, a slice COPY of n elements, and a
  * varargs concat. The generated loop below reads the n tokens in place
  * and emits one UTF8String concat per shingle, keeping the whole
  * shingle derivation (the scan-stage cost of every near-dup operator)
  * inside whole-stage codegen. Registered as `graft_shingles(toks, n)`.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles needs array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val total = toks.numElements()
    val count = math.max(total - n + 1, 0)
    val out = new Array[AnyRef](count)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val total = ctx.freshName("total")
      val count = ctx.freshName("count")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val sep = ctx.addReferenceObj("sep", UTF8String.fromString(" "),
        classOf[UTF8String].getName)
      val parts = (0 until n)
        .map(j => s"$toks.getUTF8String($i + $j)").mkString(", ")
      s"""
        int $total = $toks.numElements();
        int $count = $total - ${n - 1} > 0 ? $total - ${n - 1} : 0;
        UTF8String[] $out = new UTF8String[$count];
        for (int $i = 0; $i < $count; $i++) {
          $out[$i] = UTF8String.concatWs($sep, $parts);
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}
