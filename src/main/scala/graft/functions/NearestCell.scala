package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Nearest-centroid cell id of a float vector — native codegen
  * Expression so IVF cell assignment is a per-row column computation
  * inside the corpus scan instead of a typed map + re-join (the join
  * shuffled the full corpus twice; at lake scale assignment must ride
  * the scan). Tie rule matches [[graft.sim.Ivf.Model.nearest]]: smallest
  * distance, then smallest cell index.
  */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell needs array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(
      NearestCell.compute(input.asInstanceOf[ArrayData], centroids))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.NearestCell.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {

  /** Called from generated code. Ascending scan with strict-less update
    * ⇒ first minimal index wins (= smallest cell id among ties). Null
    * elements are rejected up front (one pass, not per centroid).
    */
  def compute(vec: ArrayData, centroids: Array[Array[Double]]): Int = {
    val n = vec.numElements()
    var j = 0
    while (j < n) {
      if (vec.isNullAt(j))
        throw new IllegalArgumentException(
          s"nearest_cell: null vector element at index $j — filter or impute upstream")
      j += 1
    }
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      while (i < cent.length) {
        val t = cent(i) - vec.getFloat(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def nearest_cell(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(vec), centroids))
}
