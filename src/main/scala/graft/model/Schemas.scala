package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas for the market-data lake — the single declared
  * schema per table that the reference never writes down (it re-detects
  * columns at every boundary; SURVEY.md §1.3). Sources normalize INTO
  * these; everything downstream is strictly typed.
  *
  * Prices are float32 at rest (reference: src/polygon_ingest/ingest.py:220-226),
  * factor math is float64 (legacy_scripts/factor_builder.py numpy default).
  * Timestamps are UTC instants; Eastern wall-clock is a derived display
  * column, not storage (deviation from the reference noted in SURVEY §7.4).
  */
object Schemas {

  /** OHLCV bars, minute or day granularity (ingest.py:219-227). */
  val bars: StructType = StructType(Seq(
    StructField("datetime", TimestampType, nullable = false),
    StructField("ticker", StringType, nullable = false),
    StructField("open", FloatType),
    StructField("high", FloatType),
    StructField("low", FloatType),
    StructField("close", FloatType),
    StructField("vwap", FloatType),
    StructField("volume", LongType),
    StructField("transactions", LongType)))

  /** Security master with point-in-time validity windows
    * (polygon_pullers/__init__.py:108-121; factor_builder.py:151-161).
    */
  val securityMaster: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("name", StringType),
    StructField("active", BooleanType),
    StructField("composite_figi", StringType),
    StructField("list_date", DateType),
    StructField("effective_start", DateType),
    StructField("effective_end", DateType)))

  /** Stock splits keyed by execution date
    * (polygon_pullers/__init__.py:208-215).
    */
  val splits: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("execution_date", DateType, nullable = false),
    StructField("split_from", DoubleType),
    StructField("split_to", DoubleType),
    StructField("ratio", DoubleType)))

  /** Cash dividends keyed by ex-date
    * (polygon_pullers/__init__.py:160-169).
    */
  val dividends: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("ex_date", DateType, nullable = false),
    StructField("pay_date", DateType),
    StructField("cash_amount", DoubleType),
    StructField("frequency", IntegerType)))

  /** Split/TR factor table F/G (factor_builder.py:238-348). */
  val factors: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("event_day", DateType, nullable = false),
    StructField("split_price_factor", DoubleType),
    StructField("split_volume_factor", DoubleType),
    StructField("tr_price_factor", DoubleType)))
}
