package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein distance (Lowrance–Wagner):
  * edit distance where a transposition of two ADJACENT characters
  * costs 1 — `graft_damerau('abcd', 'abdc') = 1` where plain
  * `levenshtein` says 2. The typo model behind vocabulary
  * normalization and fuzzy entity linkage: most human typos are
  * transpositions, and counting them as two substitutions splits
  * typo clusters in half.
  *
  * UNRESTRICTED (true DL), not the common OSA restriction: a
  * transposed pair may be edited again later, so
  * `graft_damerau('CA', 'ABC') = 2`, where OSA says 3 — matching the
  * standard Lowrance–Wagner definition (and DuckDB's
  * `damerau_levenshtein`, which the oracle uses). Distances are over
  * UTF-16 code units — identical to codepoints for all BMP text; the
  * engine's normalized-token inputs are ASCII.
  *
  * Spark ships no DL expression (only `levenshtein`); a Scala UDF
  * would box both strings per row and black-box the null handling.
  * This is a native BinaryExpression: `doGenCode` emits one static
  * kernel call, so the comparison stays inside whole-stage codegen —
  * the same pattern as the engine's other text kernels.
  */
case class DamerauExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_damerau"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_damerau needs (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauKernel.distance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauKernel.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauExpr =
    copy(left = newLeft, right = newRight)
}

object DamerauKernel {

  /** Lowrance–Wagner DP over a (m+2)×(n+2) matrix: `d(i,j)` rows are
    * offset by 2; `da` maps each code unit to the last row where it
    * appeared in `a`, `db` the last column where `b(j) == a(i)` held
    * in the current row — together they locate the transposition
    * candidate. O(m·n) time/space; linkage strings are short by
    * contract (the engine blocks before comparing, never corpus×corpus).
    */
  def distance(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val m = a.length
    val n = b.length
    if (m == 0) return n
    if (n == 0) return m
    val inf = m + n
    val d = Array.ofDim[Int](m + 2, n + 2)
    val da = new java.util.HashMap[Character, Integer]()
    var i = 0
    while (i <= m) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= n) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    d(0)(0) = inf
    i = 1
    while (i <= m) {
      var db = 0
      j = 1
      while (j <= n) {
        val k: Int = {
          val v = da.get(b.charAt(j - 1))
          if (v == null) 0 else v.intValue()
        }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 }
                   else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(m + 1)(n + 1)
  }
}
