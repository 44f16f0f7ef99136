package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Packed hyperplane-LSH bucket of a numeric vector — native codegen
  * Expression replacing the interpreted HOF form that re-derived the
  * ±1 plane weights from md5 parity PER ROW (planes × dim md5 calls per
  * row; the weights depend only on (plane, dim), not the row).
  *
  * Bit p of the result is set iff the dot product of the vector with
  * plane p's weights is > 0. Weights are the same deterministic md5
  * parity the HOF used — weight(p, i) = +1 if
  * bit_count(first-15-hex-chars(md5("{p + table*1000}:{i}")) as int) is
  * even else −1 — derived once per (planes, table, dim) per JVM and
  * cached; any engine can reproduce them (see
  * [[HyperplanePack.planeWeights]], used to embed the same weights as
  * literals in the DuckDB oracle). The dot product is a 0.0-seeded
  * ascending-index fold of double products, matching both the old HOF
  * and DuckDB's list_reduce bit-for-bit.
  */
case class HyperplanePack(child: Expression, planes: Int, table: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  // child is unresolved at construction — type-check after analysis
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_pack needs array<float|double>, got $other")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HyperplanePack.compute(
      input.asInstanceOf[ArrayData], planes, table, isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplanePack.compute($c, $planes, $table, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): HyperplanePack =
    copy(child = newChild)
}

object HyperplanePack {

  /** ±1 weight of plane `p` (within table offset) at dimension `i`:
    * md5 parity of "p:i" — identical to the SQL
    * `if(bit_count(cast(conv(substring(md5(concat(p, ':', i)), 1, 15),
    * 16, 10) as bigint)) % 2 = 0, 1.0, -1.0)`.
    */
  private def weight(p: Int, i: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p:$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val v = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    if (java.lang.Long.bitCount(v) % 2 == 0) 1.0 else -1.0
  }

  /** Full weight matrix for a plane family: planes × dim, table offset
    * `table * 1000` (independent tables get independent hyperplanes).
    */
  def planeWeights(planes: Int, table: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim)((p, i) => weight(p + table * 1000, i))

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]

  /** Called from generated code. One compiled O(planes·dim) loop. Null
    * elements are rejected up front (one pass, not per plane) — a null
    * in a dense embedding is corruption better surfaced than hashed.
    */
  def compute(vec: ArrayData, planes: Int, table: Int, isFloat: Boolean): Long = {
    val dim = vec.numElements()
    var j = 0
    while (j < dim) {
      if (vec.isNullAt(j))
        throw new IllegalArgumentException(
          s"hyperplane_pack: null vector element at index $j — filter or impute upstream")
      j += 1
    }
    val w = cache.computeIfAbsent((planes, table, dim),
      _ => planeWeights(planes, table, dim))
    var out = 0L
    var p = 0
    while (p < planes) {
      val wp = w(p)
      var s = 0.0
      var i = 0
      while (i < dim) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        s += x * wp(i)
        i += 1
      }
      if (s > 0.0) out |= (1L << p)
      p += 1
    }
    out
  }

  def hyperplane_pack(vec: Column, planes: Int, table: Int = 0): Column =
    ColumnBridge.column(
      HyperplanePack(ColumnBridge.expression(vec), planes, table))
}
