package graft.adjust

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Factor application + materialization — builds the adjusted lake from
  * raw bars and refdata dims (reference pipeline stages 3-10,
  * legacy_scripts/factor_builder.py:1125-1166; column policy :466-476).
  */
object Adjuster {

  /** Materialization policies (factor_builder.py:466-476). */
  val MaterializeMinimal = "minimal"
  val MaterializeClose = "close"
  val MaterializeOhlc = "ohlc"

  /** Full adjusted build: identity attach → split factors → apply →
    * dividend factors on the split base → apply → select by policy.
    * Dims ride broadcast joins.
    *
    * Scale notes: `withId` (the full bar lake + identity) feeds three
    * consumers (day grid, split application, TR base) and `withSplit`
    * feeds two — without materialization each branch would re-scan and
    * re-attach the whole lake. Both are persisted (memory-spilling-to-
    * disk), and `withId` is hash-partitioned by `id` up front so every
    * downstream window (`partitionBy(id)`) and factor join
    * (`id, event_day` — subset-clustered) reuses one distribution
    * instead of re-shuffling the fact table per stage.
    */
  def buildAdjusted(
      bars: DataFrame,
      securityMaster: DataFrame,
      splits: DataFrame,
      dividends: DataFrame,
      materialize: String = MaterializeClose): DataFrame = {
    val withId = Factors.attachId(bars, securityMaster)
      .repartition(col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val days = Factors.idDays(withId)
    val sf = Factors.splitFactorGrid(days, splits)

    val withSplit = withId
      .join(sf, Seq("id", "event_day"), "left")
      .withColumn("split_price_factor", coalesce(col("split_price_factor"), lit(1.0)))
      .withColumn("split_volume_factor", coalesce(col("split_volume_factor"), lit(1.0)))
      .withColumn("close_split", col("close") * col("split_price_factor"))
      .withColumn("volume_split",
        (col("volume") * col("split_volume_factor")).cast("double"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Day-level base: the (last) split-adjusted close of each trading
    // day — for day bars this is the row itself; for minute bars the
    // day's final bar (factor_builder.py:707-725 edge extraction).
    val dayBase = withSplit
      .groupBy(col("id"), col("ticker"), col("event_day"))
      .agg(max_by(col("close_split"), col("datetime")).as("close_split"))

    val gf = Factors.dividendFactorGrid(dayBase, dividends)
    val adjusted = withSplit
      .join(gf, Seq("id", "event_day"), "left")
      .withColumn("tr_price_factor", coalesce(col("tr_price_factor"), lit(1.0)))
      .withColumn("close_tr", col("close_split") * col("tr_price_factor"))

    materializeColumns(adjusted, materialize)
  }

  /** Column policy: minimal / close (adds factors) / ohlc (adds adjusted
    * open/high/low).
    */
  def materializeColumns(adjusted: DataFrame, policy: String): DataFrame = policy match {
    case MaterializeMinimal => adjusted.select(
      col("datetime"), col("ticker"), col("id"), col("event_day"),
      col("close"), col("volume"),
      col("close_split"), col("volume_split"), col("close_tr"))
    case MaterializeClose => adjusted.select(
      col("datetime"), col("ticker"), col("id"), col("event_day"),
      col("close"), col("volume"),
      col("close_split"), col("volume_split"), col("close_tr"),
      col("split_price_factor"), col("split_volume_factor"), col("tr_price_factor"))
    case MaterializeOhlc =>
      val extra = Seq("open", "high", "low").flatMap { c =>
        Seq((col(c) * col("split_price_factor")).as(s"${c}_split"),
          (col(c) * col("split_price_factor") * col("tr_price_factor")).as(s"${c}_tr"))
      }
      adjusted.select(Seq(
        col("datetime"), col("ticker"), col("id"), col("event_day"),
        col("close"), col("volume"),
        col("close_split"), col("volume_split"), col("close_tr"),
        col("split_price_factor"), col("split_volume_factor"),
        col("tr_price_factor")) ++ extra: _*)
    case other => throw new IllegalArgumentException(s"unknown materialize policy: $other")
  }

  /** Per-id audit summary (factor_builder.py:568-602 `_event_summary`):
    * trading days, span, cumulative split ratio (volume factor of the
    * first day = total forward split product), total dividend cash.
    */
  def auditSummary(adjusted: DataFrame, dividends: DataFrame): DataFrame = {
    val perId = adjusted.groupBy(col("id"), col("ticker")).agg(
      countDistinct(col("event_day")).as("n_days"),
      min(col("event_day")).as("first_day"),
      max(col("event_day")).as("last_day"),
      max_by(col("split_volume_factor"), col("datetime")).as("last_svf"),
      min_by(col("split_volume_factor"), col("datetime")).as("first_svf"))
    val cash = dividends.groupBy(col("ticker"))
      .agg(sum(col("cash_amount")).as("total_cash"))
    perId.join(broadcast(cash), Seq("ticker"), "left")
      .withColumn("cum_split_ratio", col("first_svf") / col("last_svf"))
      .drop("first_svf", "last_svf")
  }
}
