package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (nearest-event) joins, re-expressing the reference's
  * `pd.merge_asof(..., direction="forward", allow_exact_matches=True)`
  * (reference: legacy_scripts/factor_builder.py:261-267, 320-326 — each
  * split/dividend event snaps to the first trading day >= its date;
  * events after the last trading day are dropped).
  *
  * Implementation is the union+window technique rather than a
  * `left.join(right, cond >= ...)` range join: tag both sides, union on
  * (key, time), and take `first(value) ignoring nulls` over the frame
  * [currentRow, unboundedFollowing] (forward) or `last` over
  * [unboundedPreceding, currentRow] (backward). This costs ONE shuffle on
  * the join key and a single sorted pass — no O(|L|·|R|) range-join blowup,
  * so it survives 100 TB fact tables where a broadcast range join would not.
  */
object AsOf {

  private val SideCol = "__asof_is_right"

  /** Forward as-of join: for every left row, attach the columns of the
    * first right row with `right(rTime) >= left(lTime)` and equal keys.
    * Exact timestamp matches DO match. Left rows with no following right
    * row get nulls (caller drops them to mirror the reference's dropna).
    *
    * @param valueCols columns of `right` to carry over (must not collide
    *                  with left column names)
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lTime: String,
      rTime: String,
      valueCols: Seq[String]): DataFrame =
    joinDirectional(left, right, keys, lTime, rTime, valueCols, forward = true)

  /** Backward as-of join: last right row with `right(rTime) <= left(lTime)`. */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lTime: String,
      rTime: String,
      valueCols: Seq[String]): DataFrame =
    joinDirectional(left, right, keys, lTime, rTime, valueCols, forward = false)

  private def joinDirectional(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lTime: String,
      rTime: String,
      valueCols: Seq[String],
      forward: Boolean): DataFrame = {
    val time = "__asof_time"
    val packed = "__asof_vals"
    val leftCols = left.columns.toSeq
    require(valueCols.nonEmpty, "as-of join needs at least one value column")
    require(!valueCols.exists(leftCols.contains),
      s"valueCols ${valueCols.mkString(",")} collide with left columns")

    // All carried values ride ONE struct column: the window picks a whole
    // right row atomically (never a per-column mix of tied rows), and a
    // single window function replaces one-per-value-column.
    val valueStruct = StructType(valueCols.map(c => right.schema(c)))
    val r = right
      .select(keys.map(col) ++ Seq(col(rTime).as(time),
        struct(valueCols.map(col): _*).as(packed)): _*)
      .withColumn(SideCol, lit(1))
    // Right rows keep their key columns (they drive the partitioning);
    // every other left column is null-padded. Left rows carry a NULL
    // struct so first/last(ignoreNulls) skips them.
    val rPadded = r.select(
      leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(time), col(packed), col(SideCol)): _*)
    val lPadded = left
      .select(leftCols.map(col) ++ Seq(col(lTime).as(time),
        lit(null).cast(valueStruct).as(packed)): _*)
      .withColumn(SideCol, lit(0))

    // Ordering at equal timestamps: forward ⇒ left first (so the frame
    // [current, following] from a left row still sees the same-time right
    // row ⇒ exact matches allowed); backward ⇒ right first, symmetric.
    val sideOrder = if (forward) col(SideCol).asc else col(SideCol).desc
    // Tie-break among right rows sharing (keys, time): order by the packed
    // struct (lexicographic over the value tuple, nulls first) so the
    // smallest tuple wins in both directions — asc for `first` forward,
    // desc for `last` backward. Struct comparison needs orderable field
    // types; with an unorderable value column (e.g. a map) the pick among
    // exact ties falls back to arbitrary-but-atomic.
    val valueOrder =
      if (RowOrdering.isOrderable(valueStruct))
        Seq(if (forward) col(packed).asc else col(packed).desc)
      else Seq.empty
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(time).asc +: sideOrder +: valueOrder: _*)
    val frame =
      if (forward) w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // forward: FIRST right row at-or-after; backward: LAST at-or-before
    val picked =
      if (forward) first(col(packed), ignoreNulls = true).over(frame)
      else last(col(packed), ignoreNulls = true).over(frame)
    lPadded.unionByName(rPadded)
      .withColumn(packed, picked)
      .filter(col(SideCol) === 0)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(packed).getField(c).as(c)): _*)
  }
}
