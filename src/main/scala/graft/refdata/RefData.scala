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

  /** Normalized spelling guess for a raw symbol (run_pullers.py
    * normalize_guess): upper-cased, separators collapsed to dots.
    */
  def normalizeGuess(raw: String): String = raw.trim.toUpperCase
    .replaceAll("[/\\-^ ]", ".").replaceAll("\\.{2,}", ".")
    .replaceAll("^\\.+|\\.+$", "")

  /** Deterministic probe order for a symbol's spelling variants
    * (run_pullers.py candidate_variants).
    */
  def candidateVariants(raw: String): Seq[String] = {
    val norm = normalizeGuess(raw)
    Seq(norm, norm.replace(".", "-"), norm.replace(".", ""),
      norm.split("\\.").head).distinct
  }

  /** Symbol preflight (run_pullers.py:38-63): probe spelling variants of
    * a symbol in deterministic order until the fetcher resolves one.
    * Returns (requested, resolvedOrNone).
    */
  def resolveSymbols(http: HttpFetch, baseUrl: String,
      symbols: Seq[String]): Seq[(String, Option[String])] =
    symbols.map { raw =>
      raw -> candidateVariants(raw).find { v =>
        try { http.get(s"$baseUrl/v3/reference/tickers/$v"); true }
        catch { case NonFatal(_) => false }
      }
    }

  /** One preflight outcome row (run_pullers.py:65-152
    * `preflight_validate`): status OK / MISSING, or ASSUMED when
    * probing is disabled (the identity mapping on the normalized
    * guess).
    */
  final case class PreflightRow(original: String, normalizedGuess: String,
      resolved: Option[String], status: String, triedVariants: Seq[String])

  /** Preflight a symbol list: probe each symbol's variants (or assume
    * the normalized guess when `probe` is false — the reference's
    * `--no-preflight` identity path).
    */
  def preflight(http: HttpFetch, baseUrl: String, symbols: Seq[String],
      probe: Boolean = true): Seq[PreflightRow] =
    if (!probe) symbols.map { raw =>
      val norm = normalizeGuess(raw)
      PreflightRow(raw, norm, Some(norm), "ASSUMED", Seq(norm))
    } else resolveSymbols(http, baseUrl, symbols).map { case (raw, res) =>
      PreflightRow(raw, normalizeGuess(raw), res,
        if (res.isDefined) "OK" else "MISSING", candidateVariants(raw))
    }

  /** Write the preflight report artifacts the reference drops next to
    * its refdata (run_pullers.py:140-144): `_ticker_normalization_map
    * .csv` (one row per requested symbol) and `_missing_tickers.txt`
    * (unresolved symbols, one per line). Driver-side metadata files —
    * the symbol universe is watchlist-sized, never data-sized.
    */
  def writePreflightReport(rows: Seq[PreflightRow], outDir: String): Unit = {
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(outDir))
    def csvQ(s: String): String =
      if (s.exists(c => c == ',' || c == '"' || c == '\n'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val header = "original,normalized_guess,resolved,status,tried_variants"
    val lines = rows.map { r =>
      Seq(r.original, r.normalizedGuess, r.resolved.getOrElse(""),
        r.status, r.triedVariants.mkString("|")).map(csvQ).mkString(",")
    }
    Files.write(Paths.get(outDir, "_ticker_normalization_map.csv"),
      (header +: lines).mkString("", "\n", "\n").getBytes("UTF-8"))
    val missing = rows.filter(_.status == "MISSING").map(_.original)
    Files.write(Paths.get(outDir, "_missing_tickers.txt"),
      (if (missing.isEmpty) ""
       else missing.mkString("", "\n", "\n")).getBytes("UTF-8"))
  }
}
