package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE token count of a text column under the bundled fixture merge
  * table ([[graft.text.Bpe]]) — a native codegen `Expression` (the
  * [[RollingMinHash]] / [[WordNgramHashes]] extension pattern), so the
  * real token denominator rides the corpus scan inside whole-stage
  * codegen: no UDF, no join, no shuffle; the merge table lives once
  * per executor JVM.
  *
  * Normalization is applied internally (the [[graft.text.TextOps.norm]]
  * chain), so `bpe_token_count(text)` is the BPE analogue of
  * `tokenCountWs(text)`. Engine-portable: the DuckDB oracles recompute
  * the same counts by replaying the merge table as a rank-ordered
  * `replace` chain over a delimiter-encoded token string (see the Bpe
  * object doc for the equivalence argument).
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    graft.text.Bpe.fixtureCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Bpe.fixtureCount($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** The token STRINGS of the same encode — for audit rows and anywhere
  * the pieces themselves matter (vocab coverage, OOV analysis).
  */
case class BpeTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    graft.text.Bpe.fixtureTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Bpe.fixtureTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** The token IDS of the same encode — the int form a packed training
  * artifact stores (4 B/token). Id scheme (mirrored arithmetically by
  * the oracles): single-codepoint tokens are their codepoint; merge
  * products are [[graft.text.Bpe.IdBase]] (0x110000, one past the
  * codepoint space) + the lowest producing rank — see
  * [[graft.text.Bpe.Table.idOf]] for the totality/collision argument.
  */
case class BpeTokenIds(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    graft.text.Bpe.fixtureIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Bpe.fixtureIds($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenIds =
    copy(child = newChild)
}

/** The pre-tokenized arm of the same count — merges confined to
  * GPT-2-style space-attached pre-tokens (see
  * [[graft.text.Bpe.fixtureCountPretok]]); qt42 measures the
  * word-boundary delta against the free-crossing [[BpeTokenCount]].
  */
case class BpeTokenCountPretok(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    graft.text.Bpe.fixtureCountPretok(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Bpe.fixtureCountPretok($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCountPretok =
    copy(child = newChild)
}

object BpeEncode {
  def bpe_token_count(c: Column): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(c)))

  def bpe_token_count_pretok(c: Column): Column =
    ColumnBridge.column(BpeTokenCountPretok(ColumnBridge.expression(c)))

  def bpe_tokens(c: Column): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(c)))

  def bpe_token_ids(c: Column): Column =
    ColumnBridge.column(BpeTokenIds(ColumnBridge.expression(c)))
}
