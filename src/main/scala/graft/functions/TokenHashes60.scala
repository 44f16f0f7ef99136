package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** hash60 of every element of a string array in one native pass — the
  * codegen form of `transform(tokens, t => hash60(t))`, which walks an
  * interpreted md5 expression per element. Feeds the simhash
  * fingerprint and the sorted verification arrays of the dedup family.
  * Order-preserving; bit-identical to the HOF form (null elements are
  * rejected loudly, matching the engine's dense-array contract).
  */
case class TokenHashes60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes60 needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TokenHashes60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashes60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes60 =
    copy(child = newChild)
}

object TokenHashes60 {

  /** hash60 of ONE string against a caller-held digest — the scalar
    * twin of [[compute]]'s inner loop (same md5-nibble walk,
    * bit-identical), for stream-edge local scorers that mirror the
    * column form ([[graft.text.Dsir.scoreLocal]]). The digest is a
    * parameter so a per-document loop reuses one instance.
    */
  def hashOne(md: MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 15) {
      val nib = if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xF else d(i >> 1) & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** Called from generated code. */
  def compute(tokens: ArrayData): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    val out = new Array[Long](n)
    var t = 0
    while (t < n) {
      if (tokens.isNullAt(t))
        throw new IllegalArgumentException(
          s"token_hashes60: null element at index $t — filter upstream")
      val d = md.digest(tokens.getUTF8String(t).toString.getBytes("UTF-8"))
      var v = 0L
      var i = 0
      while (i < 15) {
        val nib = if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xF else d(i >> 1) & 0xF
        v = (v << 4) | nib
        i += 1
      }
      out(t) = v
      t += 1
    }
    new GenericArrayData(out)
  }

  def token_hashes60(tokens: Column): Column =
    ColumnBridge.column(TokenHashes60(ColumnBridge.expression(tokens)))
}
