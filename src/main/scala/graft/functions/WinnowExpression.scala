package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused winnowing-fingerprint kernel: token array → positional k-gram
  * strings → md5 → 60-bit longs → per-window (width w) minima → distinct
  * selection, all in ONE per-row call.
  *
  * Value-identical to the composable pipeline
  * `graft_shingles → transform(md5/conv) → transform(array_min(slice))
  * → array_distinct` (selection ORDER within the array may differ — the
  * selected SET is identical, and every consumer explodes or treats it
  * as a set). The composable form pays two interpreted HOF lambdas per
  * element on the dedup hot path; here `doGenCode` emits one static
  * call per row into a tight JVM loop (MessageDigest reused across all
  * k-grams of the row), so the expression stays inside whole-stage
  * codegen. Registered as `graft_winnow(toks, k, w)`.
  */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_winnow needs array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.compute(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.WinnowKernel.compute($toks, $k, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprintsExpr = copy(child = newChild)
}

object WinnowKernel {

  /** Exactly `CAST(('0x' || substr(md5(kgram), 1, 15)) AS BIGINT)` for
    * each positional k-gram (space-joined, UTF-8 bytes — identical to
    * concat_ws(' ', ...) and DuckDB md5), then the winnowing selection:
    * m = 0 → empty; 0 < m < w → the single overall min; else the
    * distinct minima of the m-w+1 sliding windows.
    */
  def compute(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      var appended = 0
      while (j < k) {
        // NULL elements are SKIPPED, exactly like UTF8String.concatWs in
        // the composable WordShingles form (the operator path never
        // produces them — tokens() is NULL-free — but the registered SQL
        // function must not NPE on user input)
        val t = toks.getUTF8String(i + j)
        if (t != null) {
          if (appended > 0) sb.append(' ')
          sb.append(t.toString)
          appended += 1
        }
        j += 1
      }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars of the digest = bytes 0..6 fully + the high
      // nibble of byte 7, parsed base-16 (always fits: < 2^60)
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = (v << 4) | ((d(7) & 0xf0L) >> 4)
      i += 1
    }
    val selected = new java.util.LinkedHashSet[java.lang.Long]()
    if (m < w) {
      var mn = hs(0); var t = 1
      while (t < m) { if (hs(t) < mn) mn = hs(t); t += 1 }
      selected.add(mn)
    } else {
      var s = 0
      while (s + w <= m) {
        var mn = hs(s); var t = s + 1
        while (t < s + w) { if (hs(t) < mn) mn = hs(t); t += 1 }
        selected.add(mn)
        s += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }
}
