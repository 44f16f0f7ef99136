package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash-LSH band keys of a token array in ONE native pass — the
  * codegen replacement for the interpreted chain
  * `transform(lshBandKeys(minhashSignature(toks, k), bands, k/bands),
  * (b, i) => hash60(i || ":" || b))`, which evaluates k·|toks| md5
  * lambdas per row through three HOF layers (the dominant cost of the
  * qd3/qd6/qx3 pair pipelines).
  *
  * Bit-compatible with the column form it replaces (and with the DuckDB
  * oracle that recomputes it):
  *   sig[i]   = min over tokens t of hash60(i || ":" || t)
  *   bandHex  = md5 hex of the comma-joined DECIMAL strings of the
  *              band's slice of sig
  *   key[b]   = hash60(b || ":" || bandHex)
  * where hash60(x) = first 15 hex digits of md5(x) as a long. An empty
  * token array follows concat_ws semantics (nulls dropped -> md5 of "").
  */
case class MinhashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {

  require(k >= 1 && bands >= 1 && k % bands == 0,
    s"signature length k=$k must be a positive multiple of bands=$bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands needs array<string> tokens, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashBands.compute(input.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashBands.compute($c, $k, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

object MinhashBands {

  private val HexChars = "0123456789abcdef".toCharArray

  private def hash60(md: MessageDigest, s: String): Long = {
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

  private def md5Hex(md: MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Called from generated code. */
  def compute(tokens: ArrayData, k: Int, bands: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    val rows = k / bands
    val out = new Array[Long](bands)
    if (n == 0) {
      // concat_ws over an all-null slice is "" — keep HOF parity
      var b = 0
      while (b < bands) {
        out(b) = hash60(md, b.toString + ":" + md5Hex(md, ""))
        b += 1
      }
      return new GenericArrayData(out)
    }
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var t = 0
    while (t < n) {
      if (tokens.isNullAt(t))
        throw new IllegalArgumentException(
          s"minhash_bands: null token element at index $t — filter upstream")
      val tok = tokens.getUTF8String(t).toString
      var i = 0
      while (i < k) {
        val h = hash60(md, i.toString + ":" + tok)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    val sb = new java.lang.StringBuilder(rows * 20)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append(',')
        sb.append(sig(b * rows + r))
        r += 1
      }
      out(b) = hash60(md, b.toString + ":" + md5Hex(md, sb.toString))
      b += 1
    }
    new GenericArrayData(out)
  }

  def minhash_bands(tokens: Column, k: Int, bands: Int): Column =
    ColumnBridge.column(MinhashBands(ColumnBridge.expression(tokens), k, bands))
}
