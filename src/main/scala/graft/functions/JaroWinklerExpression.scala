package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity — the ORDER-TOLERANT string scorer that
  * complements [[DamerauExpr]]'s edit DISTANCE: Jaro credits matching
  * characters within a sliding half-length window and discounts
  * transpositions proportionally, so near-misses score on a smooth
  * [0,1] scale instead of an integer cliff; the Winkler boost
  * (`+ ℓ·0.1·(1−jaro)` for a common prefix ℓ ≤ 4, applied only when
  * jaro > 0.7) rewards shared prefixes — the empirically right prior
  * for names and identifiers, which typo at the tail. The standard
  * linkage CONFIDENCE to attach to candidate pairs a blocked
  * generator (symmetric-delete / blocking keys) already produced.
  *
  * Conventions match DuckDB's `jaro_winkler_similarity` (the oracle):
  * either string empty → 0 (including both-empty), matches and
  * lengths counted over code UNITS (identical to DuckDB's bytes for
  * ASCII — the engine's normalized-name inputs, same contract as
  * [[DamerauExpr]]), boost threshold strictly 0.7, prefix cap 4,
  * scaling 0.1. Native BinaryExpression with a static-kernel
  * `doGenCode` — the score stays inside whole-stage codegen.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_jaro_winkler needs (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerKernel.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerKernel {

  /** Classic two-pass Jaro: greedy in-window match marking, then an
    * ordered walk of the matched characters counting half-
    * transpositions. O(m·n) worst case on the marking pass; linkage
    * strings are short by contract.
    */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val m = a.length
    val n = b.length
    if (m == 0 || n == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(m, n) / 2 - 1, 0)
    val am = new Array[Boolean](m)
    val bm = new Array[Boolean](n)
    var matches = 0
    var i = 0
    while (i < m) {
      val lo = math.max(0, i - window)
      val hi = math.min(n - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // half-transpositions: k-th matched char of a vs k-th of b
    var halfT = 0
    var k = 0
    i = 0
    while (i < m) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val t = halfT / 2
    val md = matches.toDouble
    val jaro = (md / m + md / n + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val cap = math.min(4, math.min(m, n))
      while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
