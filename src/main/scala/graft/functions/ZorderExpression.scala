package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two bucket coordinates:
  * `graft_zorder(x, y)` packs the low [[ZorderKernel.BITS]] bits of
  * each input as `… y₁ x₁ y₀ x₀` into one long — the space-filling
  * curve key behind multi-dimensional data CLUSTERING. Sorting a
  * table by the z-value co-locates rows that are close in BOTH
  * dimensions, so every written file carries tight min/max ranges on
  * x AND y simultaneously and a scan filtered on either dimension
  * prunes files — the layout trick a linear sort on one column
  * cannot deliver (it leaves the second column's per-file ranges
  * full-width). This is the engine's write-side answer to the
  * "filter on two columns at 100 TB" problem; Delta/Iceberg OPTIMIZE
  * ZORDER is the same construction.
  *
  * 21 bits per dimension (coordinates in [0, 2^21); the z-value fits
  * 42 bits, sign-safe in a long). Inputs outside that range fail the
  * caller's contract — they are masked, not rejected, matching how
  * hash-bucket coordinates are produced upstream (`pmod`). A native
  * BinaryExpression with a static-kernel `doGenCode`, so the key
  * computation stays inside whole-stage codegen on the write path.
  *
  * Relationship to [[graft.sources.Layout.zValue2]]: that is the same
  * interleave as a PARAMETERIZED Column-arithmetic tree (any bit
  * width, replayable verbatim in an external oracle); this is the
  * fixed-width codegen kernel for hot write paths. They agree bit-for-
  * bit on inputs inside the narrower width (LayoutSpec pins it).
  */
case class ZorderExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_zorder needs (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZorderKernel.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZorderKernel.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZorderExpr =
    copy(left = newLeft, right = newRight)
}

object ZorderKernel {

  /** Bits kept per dimension; 2·BITS = 42 ≤ 63 keeps the result
    * positive.
    */
  final val BITS = 21

  /** Bit-by-bit interleave: x occupies even positions, y odd. A loop
    * (not the magic-constant spread) keeps the kernel obviously
    * equivalent to the oracle's per-bit SQL sum; 21 iterations of
    * shift/mask are branchless and JIT-trivial either way.
    */
  def interleave(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < BITS) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
