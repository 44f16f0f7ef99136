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
  * The HTTP endpoint is STUBBED (this container has no egress): records
  * come from a deterministic generator keyed by cursor position, shaped
  * exactly like a dividends page. Everything Spark-side is real:
  * cursor offsets (checkpointable JSON, resume-from-offset), per-batch
  * admission (`recordsPerBatch` = the REST page size), partition
  * planning that splits a batch's cursor range across
  * `numPartitions` readers, and InternalRow production. Swapping the
  * generator for an HttpFetch-backed page reader changes none of the
  * streaming machinery.
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
      CursorRangePartition(lo, hi, tickers, epochDay0): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[CursorRangePartition]
        new PartitionReader[InternalRow] {
          private var k = p.lo - 1
          override def next(): Boolean = { k += 1; k < p.hi }
          override def get(): InternalRow =
            RefdataStream.recordAt(k, p.tickers, p.epochDay0)
          override def close(): Unit = ()
        }
      }
    }
}

private[sources] case class CursorRangePartition(
    lo: Long, hi: Long, tickers: Array[String], epochDay0: Int)
  extends InputPartition
