package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused 64-bit SimHash kernel: token array → per-token md5 → 64 ±1 bit
  * contributions → majority threshold, all in ONE per-row call returning
  * the packed signature (band j = bits 16j..16j+15, s0 lowest).
  *
  * Value-identical to the exploded formulation (md5 per token, 64
  * `sum(simhashBitContribution)` aggregates, `when(sum > 0, 1<<i)`
  * packing — `TextAnalysis.simhashBitContribution` remains the portable
  * template any SQL engine can reproduce). That form pays |tokens| rows
  * through an explode, 64 long aggregation buffers per group, and a
  * groupBy exchange; here the whole signature never leaves the row, so
  * SimHash derivation becomes a zero-shuffle scan-stage projection.
  * `doGenCode` emits one static call per row (MessageDigest reused
  * across the row's tokens), staying inside whole-stage codegen.
  * Registered as `graft_simhash(toks)`.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash needs array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.SimHashKernel.compute($toks);")

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64Expr = copy(child = newChild)
}

object SimHashKernel {

  /** For each token: md5, then position p ∈ 0..63 contributes +1 if bit
    * (p mod 2) of hex nibble ⌊p/2⌋ is set, else −1 (exactly
    * `TextAnalysis.simhashBitContribution`'s hex-char test, read straight
    * from the digest bytes). Signature bit p is set iff the sum over
    * tokens is > 0. A NULL token element contributes −1 at every
    * position — the same thing the exploded form's
    * `when(NULL.isin(...), 1).otherwise(-1)` evaluates to (tokens()
    * never yields NULL elements, but the registered SQL function must
    * match on arbitrary input). Empty array → signature 0.
    */
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t == null) {
        var p = 0
        while (p < 64) { counts(p) -= 1; p += 1 }
      } else {
        md.reset()
        val d = md.digest(t.getBytes)
        var p = 0
        while (p < 64) {
          // nibble k = p/2: even k = high nibble of byte k/2, odd k = low
          val k = p >> 1
          val nib =
            if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf else d(k >> 1) & 0xf
          if (((nib >> (p & 1)) & 1) == 1) counts(p) += 1
          else counts(p) -= 1
          p += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < 64) {
      if (counts(p) > 0) sig |= 1L << p
      p += 1
    }
    sig
  }
}
