package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst expression for the range-bucket id:
  * `bucket_id(pos, width) = floor(pos / width)` with non-negative inputs
  * — the reference's `reg = pos / chrRegionSize(chr)`
  * (`program/src/main/scala/hmushtaq/sparkga1/utils/SamRegionsParser.scala:60`).
  *
  * Why a custom Expression instead of `floor(col/width)`: the composed
  * form routes through DOUBLE division + floor (two casts, a double
  * divide, and a rounding call per row); for integral inputs the whole
  * thing is one integer division. `doGenCode` emits exactly that, so the
  * expression stays inside whole-stage codegen with zero boxing — the
  * pattern to follow for any hot scalar the engine needs that Spark
  * lacks.
  */
case class BucketId(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bucket_id"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"bucket_id needs (bigint, bigint), got " +
          s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(pos: Any, width: Any): Any = {
    val w = width.asInstanceOf[Long]
    if (w <= 0L) 0 else (pos.asInstanceOf[Long] / w).toInt
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pos, width) =>
      s"${ev.value} = ($width <= 0L) ? 0 : (int) ($pos / $width);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketId =
    copy(left = newLeft, right = newRight)
}

object BucketId {
  /** Column-API entry. Resolves through the session function registry —
    * call `GraftExtensions.installInto(spark)` once per session (or build
    * the session with the extensions class).
    */
  def apply(pos: Column, width: Column): Column =
    call_function("bucket_id", pos, width)
}

/** SparkSessionExtensions installer: makes `bucket_id(pos, width)`
  * available from SQL and the Column API. Use
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`; for an
  * already-running session, `GraftExtensions.installInto(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.entries.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Md5, Size, StringSplit, StringTrim, Substring}

  /** Normalized text as a raw Catalyst tree (lower → collapse ws → trim)
    * — the SQL-facing twin of TextAnalysis.normalize.
    */
  private def normalizeExpr(text: Expression): Expression =
    StringTrim(org.apache.spark.sql.catalyst.expressions.RegExpReplace(
      org.apache.spark.sql.catalyst.expressions.Lower(text),
      Literal("\\s+"), Literal(" ")))

  private def arity(name: String, n: Int)(
      builder: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.size != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${children.size}")
      builder(children)
    }

  private[functions] val entries: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("bucket_id"),
       new ExpressionInfo(classOf[BucketId].getName, "bucket_id"),
       // widen integer args like built-in arithmetic does
       arity("bucket_id", 2)(c => BucketId(
         Cast(c(0), org.apache.spark.sql.types.LongType),
         Cast(c(1), org.apache.spark.sql.types.LongType)))),
      // graft_fingerprint(text): 16-hex-char md5 of the normalized text
      (FunctionIdentifier("graft_fingerprint"),
       new ExpressionInfo(classOf[Md5].getName, "graft_fingerprint"),
       arity("graft_fingerprint", 1)(c =>
         Substring(Md5(Cast(normalizeExpr(c.head),
             org.apache.spark.sql.types.BinaryType)),
           Literal(1), Literal(16)))),
      // graft_token_count(text): whitespace token count of normalized text
      (FunctionIdentifier("graft_token_count"),
       new ExpressionInfo(classOf[Size].getName, "graft_token_count"),
       arity("graft_token_count", 1)(c =>
         Size(StringSplit(normalizeExpr(c.head),
           Literal(" "), Literal(-1))))))

  /** Register the engine's functions on a live session. */
  def installInto(spark: SparkSession): Unit =
    entries.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
