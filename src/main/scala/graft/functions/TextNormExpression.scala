package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-hygiene kernels: `graft_nfc(str)` (NFC normalization — the
  * composed form every downstream exact-match/dedup step should see:
  * "Cafe" + U+0301 and "Café" are byte-different but render identically,
  * so un-normalized corpora under-deduplicate) and
  * `graft_strip_accents(str)` (NFD → drop combining marks — the
  * diacritic fold used for accent-insensitive matching and langid
  * marker robustness).
  *
  * Both are native expressions so the hygiene pass stays inside
  * whole-stage codegen — they run in the scan stage on every document
  * of a crawl. The kernels take an ASCII fast path (zero allocation:
  * returns the input buffer untouched) since real corpora are
  * overwhelmingly ASCII-clean; only rows containing non-ASCII bytes pay
  * the String round-trip through `java.text.Normalizer` (the JDK's
  * Unicode tables — the exact algorithm DuckDB's `nfc_normalize` /
  * `strip_accents(nfc_normalize(...))` implement, which is what keeps
  * the oracle engine-portable).
  */
abstract class TextNormExprBase extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string argument, got ${other.simpleString}")
    }
}

case class NfcExpr(child: Expression) extends TextNormExprBase {
  override def prettyName: String = "graft_nfc"
  override protected def nullSafeEval(s: Any): Any =
    TextNormKernel.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormKernel.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)
}

case class StripAccentsExpr(child: Expression) extends TextNormExprBase {
  override def prettyName: String = "graft_strip_accents"
  override protected def nullSafeEval(s: Any): Any =
    TextNormKernel.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNormKernel.stripAccents($c)")
  override protected def withNewChildInternal(
      newChild: Expression): StripAccentsExpr = copy(child = newChild)
}

/** Shannon entropy (bits) of the string's CODEPOINT distribution:
  * `graft_char_entropy(str)`. The classic gibberish/compression screen —
  * keyboard-mash and base64 blobs sit far from natural-language entropy
  * (English ≈ 4.1 bits/char). One pass, one small int-histogram per row,
  * inside whole-stage codegen; empty strings score 0.0 (DuckDB's
  * `entropy()` aggregate over the exploded chars is the oracle form,
  * log base 2 both sides).
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_char_entropy"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string argument, got ${other.simpleString}")
    }
  override protected def nullSafeEval(s: Any): Any =
    TextNormKernel.charEntropy(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNormKernel.charEntropy($c)")
  override protected def withNewChildInternal(
      newChild: Expression): CharEntropyExpr = copy(child = newChild)
}

object TextNormKernel {
  /** True iff every byte is ASCII — such strings are NFC by definition
    * and contain no combining marks, so both kernels return the input
    * UTF8String UNTOUCHED (no copy, no String).
    */
  private def isAscii(u: UTF8String): Boolean = {
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      if ((u.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  private val LOG2 = math.log(2.0)

  def charEntropy(u: UTF8String): Double = {
    val s = u.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Int](1))
      slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * math.log(p) / LOG2
    }
    h
  }

  def nfc(u: UTF8String): UTF8String =
    if (isAscii(u)) u
    else UTF8String.fromString(java.text.Normalizer.normalize(
      u.toString, java.text.Normalizer.Form.NFC))

  def stripAccents(u: UTF8String): UTF8String =
    if (isAscii(u)) u
    else {
      val d = java.text.Normalizer.normalize(u.toString,
        java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val cp = d.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
}
