package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused IVF cell assignment: argmax-cosine centroid id for a float
  * vector against a fixed centroid bank (constants baked into the
  * expression at operator build, like [[HyperplaneSigExpr]]'s plane
  * bank). This is the corpus-side hot path of EVERY IVF operator
  * (ivfTopK, cosineNearDupPairs, kmeansIter/Train, semantic dedup): the
  * composable form — a Column `aggregate()` fold over a typedlit
  * centroid array — evaluates its lambda INTERPRETED per centroid per
  * row, and recomputes the row norm k times; the fused loop is one norm
  * pass plus k·d multiply-adds through a static kernel, one call per
  * row, inside whole-stage codegen.
  *
  * Value-identical to the fold, INCLUDING the degenerate cases the
  * fold's NULL algebra produced: the fold seeded with (−∞, −1) and
  * scored each centroid `coalesce(when(normProd > 0, dot/normProd),
  * Double.MinValue)`, so a NULL vector, a NULL element, a zero-norm
  * vector, or a length-mismatched centroid scored Double.MinValue —
  * which still beats the −∞ seed. Hence: degenerate rows assign to the
  * LOWEST centroid id (never NULL), ties keep the earlier (lower) id
  * (strict `>`), and all float→double sums run left-to-right — the
  * same arithmetic the DuckDB oracle's `list_dot_product` replays.
  *
  * `cents` must be sorted ascending by id and non-empty (the operator
  * collects them that way); kept as Seq (not arrays) so two identical
  * expressions compare equal for Catalyst plan caching.
  */
case class ArgmaxCentroidExpr(child: Expression,
                              cents: Seq[(Long, Seq[Float], Double)])
    extends UnaryExpression {

  require(cents.nonEmpty, "argmax assignment needs at least one centroid")
  require(cents.map(_._1) == cents.map(_._1).sorted,
    "centroids must be sorted ascending by id (ties resolve to lowest)")

  @transient private lazy val ids: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val vecs: Array[Array[Float]] =
    cents.map(_._2.toArray).toArray
  @transient private lazy val norms: Array[Double] = cents.map(_._3).toArray

  override def dataType: DataType = LongType
  // degenerate inputs (incl. a NULL vector) assign to the lowest id —
  // the fold's NULL algebra, see class doc — so the output is total
  override def nullable: Boolean = false
  override def prettyName: String = "graft_argmax_centroid"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_argmax_centroid needs array<float>, got ${t.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ids(0)
    else ArgmaxCentroidKernel.assign(v.asInstanceOf[ArrayData],
      vecs, ids, norms)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val vecsRef = ctx.addReferenceObj("centVecs", vecs, "float[][]")
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = false;
        long ${ev.value} = ${childGen.isNull}
          ? $idsRef[0]
          : graft.functions.ArgmaxCentroidKernel.assign(
              ${childGen.value}, $vecsRef, $idsRef, $normsRef);
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArgmaxCentroidExpr = copy(child = newChild)
}

object ArgmaxCentroidKernel {

  /** One pass: row norm (left-to-right double sum of squares), then per
    * centroid one fused dot; score = dot / (vnorm · cnorm) when the
    * norm product is positive, else Double.MinValue (the fold's NULL →
    * coalesce value). Strict `>` keeps the first (lowest-id) maximum.
    */
  def assign(v: ArrayData, vecs: Array[Array[Float]], ids: Array[Long],
             norms: Array[Double]): Long = {
    val n = v.numElements()
    var hasNull = false
    var i = 0
    while (!hasNull && i < n) { if (v.isNullAt(i)) hasNull = true; i += 1 }
    var vnorm = 0d
    if (!hasNull) {
      var sq = 0d
      i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble
        sq += x * x
        i += 1
      }
      vnorm = math.sqrt(sq)
    }
    var bestS = Double.NegativeInfinity
    var bestId = ids(0)
    var j = 0
    while (j < ids.length) {
      val c = vecs(j)
      var s = Double.MinValue
      if (!hasNull && c.length == n) {
        val normProd = vnorm * norms(j)
        if (normProd > 0d) {
          var dot = 0d
          var d = 0
          while (d < n) { dot += v.getFloat(d).toDouble * c(d); d += 1 }
          s = dot / normProd
        }
      }
      if (s > bestS) { bestS = s; bestId = ids(j) }
      j += 1
    }
    bestId
  }
}
