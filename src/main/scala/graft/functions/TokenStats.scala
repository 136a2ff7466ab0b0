package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token statistics as one struct — `token_stats(text)` =
  * {n_tokens, n_stop} from the same byte-level kernel as
  * [[TokenQuality]] ([[TokenQuality.packedCounts]]), so the two agree
  * by construction.
  *
  * Why a STRUCT: a projection that derives several columns from the same
  * tokenization (t23: n_tokens, stop_ratio, avg_word_len, is_quality)
  * would re-evaluate a scalar expression once per derived column after
  * projection collapse — the interpreted HOF form tokenized every
  * document ~6×. CollapseProject does NOT inline a non-cheap alias that
  * is referenced more than once (SPARK-36718), so aliasing this struct
  * once and extracting fields keeps exactly ONE tokenization pass per
  * row (PlanSpec gates the plan shape).
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_stats requires a string input, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))
  override def prettyName: String = "token_stats"

  override protected def nullSafeEval(s: Any): Any =
    TokenStats.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  /** Static entry for generated code: one byte pass → {n_tokens, n_stop}. */
  def compute(s: UTF8String): InternalRow = {
    val packed = TokenQuality.packedCounts(s)
    new GenericInternalRow(Array[Any]((packed >>> 32).toInt,
      (packed & 0xFFFFFFFFL).toInt))
  }

  /** Column-API entry: `token_stats(text)`. */
  def apply(c: Column): Column =
    GraftBridge.column(TokenStats(GraftBridge.expression(c)))
}
