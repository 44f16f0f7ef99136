package graft.refdata

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Refdata REST pullers: security master, splits, dividends — the
  * driver-side source family (reference: src/polygon_pullers/__init__.py
  * S9-S12). HTTP happens on the driver behind [[HttpFetch]] (dimension
  * tables are small — hundreds of tickers); the payloads then become
  * DataFrames via `from_json`, so parsing is Spark-native and the same
  * path can later back a DataSourceV2 MicroBatchStream. Tests inject a
  * canned fetcher; zero-egress environments never call out.
  */
object RefData {

  /** Pluggable transport. */
  trait HttpFetch { def get(url: String): String }

  /** Retry with exponential backoff on transient failures — the S12
    * wrapper (polygon_pullers/__init__.py:54-80: 5 retries, 0.5 s base,
    * ×2 growth).
    */
  def withRetry[T](retries: Int = 5, baseDelayMs: Long = 500)(f: => T): T = {
    var attempt = 0
    var delay = baseDelayMs
    while (true) {
      try return f
      catch {
        case NonFatal(e) =>
          attempt += 1
          if (attempt > retries) throw e
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private val splitPayload = StructType(Seq(
    StructField("ticker", StringType),
    StructField("execution_date", StringType),
    StructField("split_from", DoubleType),
    StructField("split_to", DoubleType)))

  private val dividendPayload = StructType(Seq(
    StructField("ticker", StringType),
    StructField("ex_dividend_date", StringType),
    StructField("pay_date", StringType),
    StructField("cash_amount", DoubleType),
    StructField("frequency", IntegerType)))

  private val tickerPayload = StructType(Seq(
    StructField("ticker", StringType),
    StructField("name", StringType),
    StructField("active", BooleanType),
    StructField("composite_figi", StringType),
    StructField("list_date", StringType)))

  private def parse(spark: SparkSession, jsonLines: Seq[String],
      schema: StructType): DataFrame = {
    import spark.implicits._
    spark.createDataset(jsonLines)
      .select(from_json(col("value"), schema).as("r"))
      .select(col("r.*"))
  }

  /** Splits puller (S11): fetch per ticker, derive the zero-guarded
    * ratio (polygon_pullers/__init__.py:207).
    */
  def pullSplits(spark: SparkSession, http: HttpFetch, baseUrl: String,
      tickers: Seq[String]): DataFrame = {
    val payloads = tickers.flatMap { t =>
      withRetry()(http.get(s"$baseUrl/v3/reference/splits?ticker=$t"))
        .linesIterator.filter(_.nonEmpty)
    }
    parse(spark, payloads, splitPayload)
      .withColumn("execution_date", to_date(col("execution_date")))
      .withColumn("ratio",
        when(col("split_from") > 0, col("split_to") / col("split_from")))
  }

  /** Dividends puller (S10). */
  def pullDividends(spark: SparkSession, http: HttpFetch, baseUrl: String,
      tickers: Seq[String]): DataFrame = {
    val payloads = tickers.flatMap { t =>
      withRetry()(http.get(s"$baseUrl/v3/reference/dividends?ticker=$t"))
        .linesIterator.filter(_.nonEmpty)
    }
    parse(spark, payloads, dividendPayload)
      .withColumnRenamed("ex_dividend_date", "ex_date")
      .withColumn("ex_date", to_date(col("ex_date")))
      .withColumn("pay_date", to_date(col("pay_date")))
  }

  /** Security-master puller (S9). */
  def pullSecurityMaster(spark: SparkSession, http: HttpFetch, baseUrl: String,
      tickers: Seq[String]): DataFrame = {
    val payloads = tickers.flatMap { t =>
      withRetry()(http.get(s"$baseUrl/v3/reference/tickers/$t"))
        .linesIterator.filter(_.nonEmpty)
    }
    parse(spark, payloads, tickerPayload)
      .withColumn("list_date", to_date(col("list_date")))
  }

  /** Empty ticker-events placeholder (S13) so downstream joins never
    * fail on a missing dim (polygon_pullers/__init__.py:234-249).
    */
  def emptyTickerEvents(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("ticker", StringType),
        StructField("event_type", StringType),
        StructField("date", DateType),
        StructField("old_value", StringType),
        StructField("new_value", StringType))))

  /** Symbol preflight (run_pullers.py:38-63): probe spelling variants of
    * a symbol in deterministic order until the fetcher resolves one.
    * Returns (requested, resolvedOrNone).
    */
  def resolveSymbols(http: HttpFetch, baseUrl: String,
      symbols: Seq[String]): Seq[(String, Option[String])] =
    symbols.map { raw =>
      val norm = raw.trim.toUpperCase
        .replaceAll("[/\\-^ ]", ".").replaceAll("\\.{2,}", ".")
        .replaceAll("^\\.+|\\.+$", "")
      val variants = Seq(norm, norm.replace(".", "-"),
        norm.replace(".", ""), norm.split("\\.").head).distinct
      raw -> variants.find { v =>
        try { http.get(s"$baseUrl/v3/reference/tickers/$v"); true }
        catch { case NonFatal(_) => false }
      }
    }
}
