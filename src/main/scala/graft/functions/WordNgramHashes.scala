package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram 60-bit hashes of a text column in ONE native
  * pass — the codegen replacement for the interpreted chain
  * `transform(array_distinct(transform(sequence(...), concat_ws(...))),
  * hash60)` that dominates n-gram dedup runtime (each HOF layer
  * allocates and interprets per element).
  *
  * Bit-compatible with the column form it replaces:
  * tokens = split(lower(trim(regexp_replace(text, "\\s+", " "))), " "),
  * gram i = tokens[i..i+n-1] joined by a single space, hash =
  * first 15 hex digits of md5 as a long
  * (DuckDB: `('0x' || substr(md5(g), 1, 15))::BIGINT`), distinct by
  * first occurrence. Texts with fewer than n tokens yield an empty
  * array.
  */
case class WordNgramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordNgramHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
}

/** POSITIONAL variant: every word n-gram hash in sequence order, no
  * dedup — element i is the hash of the gram starting at token i, so
  * `posexplode` yields (position, hash) pairs. The anchor generator of
  * exact-substring matching ([[graft.text.Decontaminate
  * .longestSharedRun]]): consecutive shared positions on one diagonal
  * chain into runs. Same normalization/hash contract as
  * [[WordNgramHashes]] (the DuckDB twin is identical md5 arithmetic).
  */
case class WordNgramHashesPos(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordNgramHashes.computePos(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgramHashes.computePos($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashesPos =
    copy(child = newChild)
}

object WordNgramHashes {

  /** The norm mirror — collapse, SPACE-ONLY trim, UTF8String
    * lowercase, in TextOps.norm's operation order. Java's
    * `String.trim` is the wrong trim here: it strips every char
    * <= 0x20, while Spark's `trim` (and DuckDB's) strips ' ' alone —
    * a text with a leading control byte (U+0001 survives the \s+
    * collapse: it is not \s) would tokenize one element SHORTER than
    * the TextOps.tokens array the excision operators index, silently
    * shifting every gram position by one (the NgramLm gram-key lesson,
    * found again one layer down).
    */
  private def normalize(text: UTF8String): String = {
    val collapsed = text.toString.replaceAll("\\s+", " ")
    var b = 0
    var e = collapsed.length
    while (b < e && collapsed.charAt(b) == ' ') b += 1
    while (e > b && collapsed.charAt(e - 1) == ' ') e -= 1
    UTF8String.fromString(collapsed.substring(b, e)).toLowerCase.toString
  }

  /** Called from generated code: positional (all grams, in order). */
  def computePos(text: UTF8String, n: Int): ArrayData = {
    val normed = normalize(text)
    if (normed.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val toks = normed.split(' ')
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      var v = 0L
      var k = 0
      while (k < 15) {
        val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xF else d(k >> 1) & 0xF
        v = (v << 4) | nib
        k += 1
      }
      out(i) = v
      i += 1
    }
    new GenericArrayData(out)
  }

  def word_ngram_hashes_pos(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramHashesPos(ColumnBridge.expression(text), n))

  /** Called from generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val normed = normalize(text)
    if (normed.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val toks = normed.split(' ')
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      // first 15 hex digits of the md5 as a long (60 bits)
      var v = 0L
      var k = 0
      while (k < 15) {
        val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xF else d(k >> 1) & 0xF
        v = (v << 4) | nib
        k += 1
      }
      seen.add(v)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  def word_ngram_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramHashes(ColumnBridge.expression(text), n))
}
