package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      s"valueCols ${valueCols.mkString(",")} collide with left columns")

    // Right side: only keys + time + carried values. Determinism for
    // right rows sharing a timestamp comes from the window orderBy below,
    // which extends (time, side) with the value columns themselves.
    val r = right
      .select((keys.map(col) :+ col(rTime).as(time)) ++ valueCols.map(col): _*)
      .withColumn(SideCol, lit(1))
    val l = left
      .select((leftCols.map(col) :+ col(lTime).as(time)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
      .withColumn(SideCol, lit(0))

    // Pad the narrower side with nulls for the other side's columns so the
    // union lines up by name.
    val lPadded = l.select((leftCols ++ Seq(time) ++ valueCols ++ Seq(SideCol)).map(col): _*)
    // Right rows keep their key columns (they drive the partitioning);
    // every other left column is null-padded.
    val rPadded = r.select(
      leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(time)) ++ valueCols.map(col) ++ Seq(col(SideCol)): _*)

    // Ordering at equal timestamps: forward ⇒ left first (so the frame
    // [current, following] from a left row still sees the same-time right
    // row ⇒ exact matches allowed); backward ⇒ right first, symmetric.
    val sideOrder = if (forward) col(SideCol).asc else col(SideCol).desc
    // Tie-break among right rows sharing (keys, time): order by the value
    // columns so the picked row is the one with the smallest value tuple
    // in BOTH directions (asc for `first` forward, desc for `last`
    // backward). Without this, first/last ignoring nulls picks
    // nondeterministically among equal-time right rows.
    val valueOrder = valueCols.map(c => if (forward) col(c).asc else col(c).desc)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(time).asc +: sideOrder +: valueOrder: _*)
    val frame =
      if (forward) w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // forward: FIRST right value at-or-after; backward: LAST at-or-before
    val filled = valueCols.foldLeft(lPadded.unionByName(rPadded)) { (df, c) =>
      val picked =
        if (forward) first(col(c), ignoreNulls = true).over(frame)
        else last(col(c), ignoreNulls = true).over(frame)
      df.withColumn(c, picked)
    }
    filled
      .filter(col(SideCol) === 0)
      .select((leftCols ++ valueCols).map(col): _*)
  }
}
