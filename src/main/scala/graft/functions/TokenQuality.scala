package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd document-quality predicate — the SURVEY §2
  * custom-operator tier (b) path for corpus quality gates (x90's scan
  * filter evaluates it once per document of the whole corpus).
  *
  * Semantics are EXACTLY the SQL predicate
  * {{{size(split(text, ' ')) BETWEEN minTok AND maxTok AND
  *    cast(size(filter(split(text, ' '), x -> x = 'the' OR x = 'a')) as double)
  *      / size(split(text, ' ')) <= maxStopRatio}}}
  * (single-space split with limit -1: trailing empties kept, empty string
  * → one empty token — Spark's `split` and DuckDB's `string_split` agree).
  * Written as that SQL, projection collapse substitutes the `split` into
  * the pushed-down filter THREE times, so the scan tokenizes every
  * document three times; this expression makes one character pass with no
  * array allocation at all, and participates in whole-stage codegen.
  */
case class TokenQuality(child: Expression, minTok: Int, maxTok: Int,
    maxStopRatio: Double) extends UnaryExpression {
  // doGenCode interpolates maxStopRatio into Java source; Infinity/NaN
  // would render as invalid literals ("InfinityD") and break codegen
  // compilation (silent interpreted fallback). A ratio outside [0, 1] is
  // meaningless anyway, so reject it at construction.
  require(maxStopRatio >= 0.0 && maxStopRatio <= 1.0,
    s"maxStopRatio must be in [0, 1], got $maxStopRatio")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_quality requires a string input, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "token_quality"

  override protected def nullSafeEval(s: Any): Any =
    TokenQuality.check(s.asInstanceOf[UTF8String], minTok, maxTok, maxStopRatio)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenQuality.check($c, $minTok, $maxTok, ${maxStopRatio}D)")

  override protected def withNewChildInternal(newChild: Expression): TokenQuality =
    copy(child = newChild)
}

object TokenQuality {
  /** One pass over the raw UTF-8 bytes: tokens = 0x20 bytes + 1
    * (split-with-limit--1 semantics; 0x20 never occurs inside a multibyte
    * UTF-8 sequence, so byte- and char-level splits agree), stop tokens =
    * segments byte-equal to "the" or "a". No String or array allocation.
    * Returns (n_tokens << 32) | n_stop packed in one long — the shared
    * kernel behind [[TokenQuality]] and [[TokenStats]]. Static so
    * generated code calls it directly. */
  def packedCounts(s: UTF8String): Long = {
    val len = s.numBytes()
    var n = 1
    var stop = 0
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.getByte(i) == ' ') {
        val l = i - start
        if (l == 1 && s.getByte(start) == 'a') stop += 1
        else if (l == 3 && s.getByte(start) == 't' &&
          s.getByte(start + 1) == 'h' && s.getByte(start + 2) == 'e') stop += 1
        if (i < len) n += 1
        start = i + 1
      }
      i += 1
    }
    (n.toLong << 32) | stop.toLong
  }

  def check(s: UTF8String, minTok: Int, maxTok: Int,
      maxStopRatio: Double): Boolean = {
    val packed = packedCounts(s)
    val n = (packed >>> 32).toInt
    val stop = (packed & 0xFFFFFFFFL).toInt
    n >= minTok && n <= maxTok && stop.toDouble / n <= maxStopRatio
  }

  /** Column-API entry: `token_quality(text, 20, 120, 0.25)`. */
  def apply(c: Column, minTok: Int, maxTok: Int, maxStopRatio: Double): Column =
    GraftBridge.column(
      TokenQuality(GraftBridge.expression(c), minTok, maxTok, maxStopRatio))
}
