package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Fused random-hyperplane LSH signature kernel: for a float vector and
  * a fixed bank of hyperplanes (a constant baked into the expression —
  * md5-derived, see Similarity.hyperplanes), computes every sign bit
  * and packs them into band values in ONE codegen'd pass over the
  * vector. Returns array<int> of length planes/bandBits; band b's value
  * has bit i set iff round(dot(vec, plane[b·bandBits+i]), 6) > 0.
  *
  * Value-identical to the composable HOF form the operator first
  * shipped with (per-bit `when(round(aggregate(zip_with(...)),6) > 0,
  * 1<<i)`), INCLUDING the edge semantics: a NULL vector → NULL; a
  * vector whose length differs from the plane dimension, or with a NULL
  * element, contributes 0 for every bit (zip_with pads with NULL, the
  * NULL dot fails the `> 0` test, `otherwise(0)` applies). The rounding
  * is the same HALF_UP-at-6-places Spark's `round` performs — applied
  * here so an oracle whose sum order differs in the last ulp can't flip
  * a sign at the 0 boundary. The HOF form evaluates interpreted: two
  * lambda dispatches and an intermediate array per element, ×bits per
  * row — the fused loop is bits×dim multiply-adds inside whole-stage
  * codegen. Registered as `graft_hyperplane_sig` (GraftExtensions).
  */
object HyperplaneSigExpr {
  /** Deterministic pseudo-random hyperplane components: (j, d) =
    * 2·u − 1, u = first 15 hex chars of md5("hp:j:d") scaled to [0, 1).
    * md5-derived so ANY engine reproduces the exact doubles
    * (`CAST('0x' || substr(md5(..), 1, 15) AS BIGINT) / 2^60` in
    * DuckDB/ANSI). Constants computed at operator build — no data job,
    * no collect.
    */
  def planes(bits: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(bits) { j =>
      Seq.tabulate(dim) { d =>
        val hex = md.digest(s"hp:$j:$d".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.substring(0, 15)
        java.lang.Long.parseLong(hex, 16).toDouble /
          (1L << 60).toDouble * 2d - 1d
      }
    }
  }
}

// planes is Seq[Seq[Double]] (not arrays) ON PURPOSE: case-class
// equality over arrays is reference identity, and Catalyst keys plan
// caching / common-subexpression reuse on expression equality — two
// separately built but identical signature expressions must compare
// equal or every cache lookup misses.
case class HyperplaneSigExpr(child: Expression,
                             planes: Seq[Seq[Double]],
                             bandBits: Int)
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length % bandBits == 0,
    s"${planes.length} planes not divisible into $bandBits-bit bands")
  // band values are packed into Ints: 1 << 31 would flip the sign and
  // diverge from the portable (non-negative) band-value formula
  require(bandBits >= 1 && bandBits <= 31,
    s"bandBits must be in 1..31, got $bandBits")

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_sig needs array<float>, got ${t.simpleString}")
  }

  private def dim: Int = planeArr(0).length
  private def bands: Int = planeArr.length / bandBits

  /** round-half-up at 6 places, exactly what Spark's `round(col, 6)`
    * computes for a double — keep in sync with the HOF formulation.
    */
  private def rounded(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](bands)
    if (v.numElements() == dim) {
      var ok = true
      var i = 0
      while (ok && i < dim) { if (v.isNullAt(i)) ok = false; i += 1 }
      if (ok) {
        var j = 0
        while (j < planeArr.length) {
          val p = planeArr(j)
          var acc = 0d
          var d = 0
          while (d < dim) { acc += v.getFloat(d).toDouble * p(d); d += 1 }
          if (rounded(acc) > 0d) out(j / bandBits) |= 1 << (j % bandBits)
          j += 1
        }
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planeArr,
      "double[][]")
    val childGen = child.genCode(ctx)
    val v = childGen.value
    val out = ctx.freshName("out")
    val ok = ctx.freshName("ok")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val d = ctx.freshName("d")
    val acc = ctx.freshName("acc")
    val p = ctx.freshName("p")
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          int[] $out = new int[$bands];
          if ($v.numElements() == $dim) {
            boolean $ok = true;
            for (int $i = 0; $ok && $i < $dim; $i++) {
              if ($v.isNullAt($i)) $ok = false;
            }
            if ($ok) {
              for (int $j = 0; $j < ${planeArr.length}; $j++) {
                double[] $p = $planesRef[$j];
                double $acc = 0.0;
                for (int $d = 0; $d < $dim; $d++) {
                  $acc += (double) $v.getFloat($d) * $p[$d];
                }
                if (java.math.BigDecimal.valueOf($acc)
                      .setScale(6, java.math.RoundingMode.HALF_UP)
                      .doubleValue() > 0.0) {
                  $out[$j / $bandBits] |= 1 << ($j % $bandBits);
                }
              }
            }
          }
          ${ev.value} =
            new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneSigExpr = copy(child = newChild)
}
