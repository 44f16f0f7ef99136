package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 micro-batch streaming source for a paginated refdata
  * REST feed — the reference's dividend/split pullers
  * (src/polygon_pullers/__init__.py:145-228: `list_dividends(order=asc,
  * sort=ex_dividend_date, limit=1000)` cursor pagination) re-expressed
  * as a first-class Spark streaming source instead of a driver-side
  * loop.
  *
  * Two transports share every piece of the streaming machinery (cursor
  * offsets with checkpoint resume, per-batch admission — `recordsPerBatch`
  * = the REST page size — and partition planning that splits a batch's
  * cursor range across `numPartitions` readers):
  *  - default: a deterministic in-process generator keyed by cursor
  *    position, shaped exactly like a dividends page (this container has
  *    no egress, so CI never calls out);
  *  - `baseUrl` set: a REAL socket path — each partition GETs its cursor
  *    range (`{baseUrl}/v3/reference/dividends?cursor.gte=lo&cursor.lt=hi`,
  *    JSON lines) through [[graft.refdata.RefData.withRetry]], so
  *    transient failures (429s, resets) back off and retry exactly like
  *    the reference's pullers. RefdataStreamSpec binds an in-JVM
  *    localhost fixture and drives pagination, a 429 retry, and a
  *    checkpoint resume through this path end-to-end.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-refdata")
  *     .option("tickers", "AAPL,MSFT,NVDA")
  *     .option("totalRecords", 1000)     // feed end (stub horizon)
  *     .option("recordsPerBatch", 100)   // REST page size per pull
  *     .option("numPartitions", 4)
  *     .load()
  * }}}
  */
class RefdataStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-refdata"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RefdataStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RefdataStreamTable(new CaseInsensitiveStringMap(properties))
}

object RefdataStream {
  /** One dividend-like record per cursor position. */
  val schema: StructType = StructType(Seq(
    StructField("cursor", LongType, nullable = false),
    StructField("ticker", StringType, nullable = false),
    StructField("ex_date", DateType, nullable = false),
    StructField("cash_amount", DoubleType, nullable = false)))

  /** STUB endpoint: the deterministic record at cursor `k`. A real
    * implementation pages `GET /v3/reference/dividends?cursor=k` via
    * [[graft.refdata.RefData.HttpFetch]] and parses the JSON page.
    */
  def recordAt(k: Long, tickers: Array[String], epochDay0: Int): InternalRow = {
    val t = tickers((k % tickers.length).toInt)
    val day = epochDay0 + (k / tickers.length).toInt
    val cash = 0.05 + (k % 40) * 0.01
    new GenericInternalRow(Array[Any](
      k, UTF8String.fromString(t), day, cash))
  }

  private val CursorRe = """"cursor"\s*:\s*(\d+)""".r
  private val TickerRe = """"ticker"\s*:\s*"([^"]*)"""".r
  private val ExDateRe = """"ex_date"\s*:\s*"(\d{4}-\d{2}-\d{2})"""".r
  private val CashRe = """"cash_amount"\s*:\s*(-?[0-9.eE+\-]+)""".r

  /** One JSON-lines page record → InternalRow. Field extraction is
    * regex-anchored to the fixed page shape the feed contract
    * declares (the four schema fields, scalar values) — a production
    * endpoint with nested payloads would swap in a JSON parser here;
    * nothing upstream (offsets, planning, retry) would change.
    * Throws (→ withRetry at the fetch layer, then the task) on a
    * malformed line rather than silently dropping records.
    */
  def parsePageLine(line: String): InternalRow = {
    def req(re: scala.util.matching.Regex): String =
      re.findFirstMatchIn(line).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"malformed page line: $line"))
    new GenericInternalRow(Array[Any](
      req(CursorRe).toLong,
      UTF8String.fromString(req(TickerRe)),
      java.time.LocalDate.parse(req(ExDateRe)).toEpochDay.toInt,
      req(CashRe).toDouble))
  }

  /** Blocking GET returning the body; throws on any non-2xx status so
    * [[graft.refdata.RefData.withRetry]] sees 429/5xx as retryable.
    */
  def httpGetPage(url: String): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    try {
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"HTTP $code from $url")
      val in = conn.getInputStream
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } finally conn.disconnect()
  }
}

private[sources] class RefdataStreamTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft-refdata-stream"
  override def schema(): StructType = RefdataStream.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = RefdataStream.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new RefdataMicroBatchStream(options)
      }
    }
}

/** Cursor offset — serialized into the streaming checkpoint, so a
  * restarted query resumes from the last committed page boundary
  * (exactly the "resume from cursor" semantics a REST puller needs).
  */
case class CursorOffset(cursor: Long) extends Offset {
  override def json(): String = cursor.toString
}

private[sources] class RefdataMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val tickers: Array[String] =
    options.getOrDefault("tickers", "AAPL,MSFT,NVDA")
      .split(",").map(_.trim.toUpperCase).filter(_.nonEmpty)
  // recordAt indexes k % tickers.length in every reader task — an
  // empty list (option "tickers" -> "," splits to zero elements) would
  // surface as an ArithmeticException deep in PartitionReader.get; say
  // what the bad option was at construction instead
  require(tickers.nonEmpty,
    "refdata stream needs at least one ticker (option \"tickers\")")
  private val totalRecords = options.getLong("totalRecords", 1000L)
  private val recordsPerBatch = options.getLong("recordsPerBatch", 100L)
  private val numPartitions = options.getInt("numPartitions", 2)
  // real-socket mode: when set, partitions GET their cursor range from
  // this endpoint instead of the in-process generator
  private val baseUrl: Option[String] = Option(options.get("baseUrl"))
  // retry backoff base for the socket path — the reference's 500 ms in
  // production; tests shrink it so a 429 retry doesn't stall the suite
  private val retryBaseMs = options.getLong("retryBaseMs", 500L)
  private val epochDay0 = 19723 // 2024-01-01

  // Trigger.AvailableNow latches the feed horizon at query start and
  // drains up to it (in page-sized batches), then stops — the semantics
  // a bounded REST backfill needs. A real endpoint would snapshot the
  // remote cursor end here instead of the stub horizon.
  @volatile private var latchedHorizon: Long = -1L
  override def prepareForTriggerAvailableNow(): Unit =
    latchedHorizon = totalRecords

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(recordsPerBatch)

  // Admission-controlled poll: advance from the engine-supplied start
  // cursor by at most the read limit (the REST page size), bounded by
  // the feed horizon. Restarts resume from the checkpointed offset the
  // engine passes in — no re-pull of committed pages.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CursorOffset].cursor
    val horizon = if (latchedHorizon >= 0) latchedHorizon else totalRecords
    val step = limit match {
      case mr: ReadMaxRows => mr.maxRows()
      case _ => recordsPerBatch
    }
    CursorOffset(math.max(s, math.min(s + step, horizon)))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(Offset, ReadLimit)")
  override def initialOffset(): Offset = CursorOffset(0L)
  override def deserializeOffset(json: String): Offset = CursorOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CursorOffset].cursor
    val e = end.asInstanceOf[CursorOffset].cursor
    val n = math.max(1, math.min(numPartitions.toLong, e - s)).toInt
    (0 until n).map { i =>
      val lo = s + (e - s) * i / n
      val hi = s + (e - s) * (i + 1) / n
      CursorRangePartition(lo, hi, tickers, epochDay0,
        baseUrl, retryBaseMs): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[CursorRangePartition]
        p.baseUrl match {
          case Some(base) => new PartitionReader[InternalRow] {
            // one paginated GET per partition range, fetched lazily on
            // the first next() so planning stays socket-free; the
            // whole page rides one withRetry — a 429/5xx backs off
            // and re-pulls the SAME range (cursor-keyed pages are
            // idempotent re-reads, the property REST pagination is
            // designed around)
            private var rows: Iterator[InternalRow] = _
            private var cur: InternalRow = _
            private var n = 0L
            override def next(): Boolean = {
              if (rows == null) {
                val body = graft.refdata.RefData.withRetry(
                  retries = 5, baseDelayMs = p.retryBaseMs) {
                  RefdataStream.httpGetPage(
                    s"$base/v3/reference/dividends?cursor.gte=${p.lo}&cursor.lt=${p.hi}")
                }
                rows = body.linesIterator.filter(_.nonEmpty)
                  .map(RefdataStream.parsePageLine)
              }
              val has = rows.hasNext
              if (has) { cur = rows.next(); n += 1 }
              else if (n != p.hi - p.lo)
                // a truncated / page-capped response would otherwise
                // commit the full cursor range while silently dropping
                // the missing records — permanent data loss the
                // checkpoint would never re-pull. Fail the task loudly
                // instead; the endpoint contract is exactly [lo, hi).
                throw new java.io.IOException(
                  s"page [${p.lo}, ${p.hi}) returned $n of ${p.hi - p.lo} records")
              has
            }
            override def get(): InternalRow = cur
            override def close(): Unit = ()
          }
          case None => new PartitionReader[InternalRow] {
            private var k = p.lo - 1
            override def next(): Boolean = { k += 1; k < p.hi }
            override def get(): InternalRow =
              RefdataStream.recordAt(k, p.tickers, p.epochDay0)
            override def close(): Unit = ()
          }
        }
      }
    }
}

private[sources] case class CursorRangePartition(
    lo: Long, hi: Long, tickers: Array[String], epochDay0: Int,
    baseUrl: Option[String], retryBaseMs: Long)
  extends InputPartition
