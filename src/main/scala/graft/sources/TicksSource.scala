package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSourceV2 BATCH connector — the "custom source"
  * leg of the S-family, exercised end to end instead of through files:
  * a deterministic synthetic tick feed whose generator formula is pure
  * integer arithmetic (so a SQL oracle can replay it exactly), read via
  *
  *   spark.read.format("graft.sources.TicksProvider")
  *     .option("rows", n).option("parts", p).load()
  *
  * The point is the V2 pushdown contract, implemented for real:
  *
  *  - [[SupportsPushDownFilters]]: range/equality predicates on
  *    `tick_id` (the generation variable) are ACCEPTED and narrow the
  *    generated id range — the connector never materializes filtered-out
  *    rows, the source-side analog of parquet row-group pruning. All
  *    other predicates are declined (returned as post-scan filters), so
  *    Spark keeps them — the contract that makes pushdown safe.
  *  - [[SupportsPushDownRequiredColumns]]: the reader emits exactly the
  *    pruned schema; unprojected columns are never computed.
  *  - Parallelism: the (possibly narrowed) id range splits into `parts`
  *    contiguous [[InputPartition]]s — each a pure function of its
  *    bounds, so the scan distributes with no driver state.
  *
  * Row formula (mirrored by q288's DuckDB oracle):
  *   symbol   = 'S' || (tick_id % 8)
  *   ts_sec   = 1700000000 + tick_id
  *   px_cents = 10000 + (tick_id * 37) % 2000 - 1000
  *   qty      = 1 + (tick_id * 7) % 100
  */
class TicksProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-ticks"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TicksSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TicksTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(100000L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(8),
      Option(properties.get("ratePerBatch")).map(_.toLong).getOrElse(1000L))
}

object TicksSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("tick_id", LongType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("ts_sec", LongType, nullable = false),
    StructField("px_cents", LongType, nullable = false),
    StructField("qty", LongType, nullable = false)))

  def colValue(name: String, id: Long): Any = name match {
    case "tick_id" => id
    case "symbol" => UTF8String.fromString("S" + (id % 8))
    case "ts_sec" => 1700000000L + id
    case "px_cents" => 10000L + (id * 37) % 2000 - 1000
    case "qty" => 1L + (id * 7) % 100
  }
}

class TicksTable(rows: Long, parts: Int, ratePerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_ticks($rows)"
  override def schema(): StructType = TicksSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new TicksScanBuilder(rows, parts, ratePerBatch)
}

class TicksScanBuilder(rows: Long, parts: Int, ratePerBatch: Long = 1000L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = TicksSource.SCHEMA

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case GreaterThan("tick_id", _: Long) => true
      case GreaterThanOrEqual("tick_id", _: Long) => true
      case LessThan("tick_id", _: Long) => true
      case LessThanOrEqual("tick_id", _: Long) => true
      case EqualTo("tick_id", _: Long) => true
      case _ => false
    }
    ok.foreach {
      case GreaterThan("tick_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("tick_id", v: Long) => lo = math.max(lo, v)
      case LessThan("tick_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("tick_id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("tick_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    accepted = ok
    rest // Spark re-applies everything we did not accept
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new TicksScan(required, math.min(lo, hi), hi, parts, accepted,
      ratePerBatch)
}

/** Offset = "number of ticks emitted so far" serialized as a decimal
  * string — replayable (the generator is a pure function of the id),
  * so checkpoint-restart re-plans exactly the uncommitted range. */
case class TicksOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

class TicksScan(schema: StructType, lo: Long, hi: Long, parts: Int,
    pushed: Array[Filter], ratePerBatch: Long) extends Scan with Batch
    with org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_ticks range=[$lo,$hi) pushed=${pushed.mkString(",")} " +
      s"cols=${schema.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    split(lo, hi)
  override def createReaderFactory(): PartitionReaderFactory =
    new TicksReaderFactory(schema)

  private def split(from: Long, until: Long): Array[InputPartition] = {
    val n = math.max(0L, until - from)
    val p = math.max(1, parts)
    (0 until p).map { i =>
      TicksRange(from + n * i / p, from + n * (i + 1) / p)
    }.filter(r => r.until > r.from).toArray[InputPartition]
  }

  // ---- MicroBatchStream: the same generator as a rate-limited,
  // replayable stream. The rate limit lives in ADMISSION CONTROL
  // (latestOffset(start, limit) caps each batch's END offset) — never
  // in planInputPartitions, where truncating [start, end) would
  // silently drop the tail of a committed batch.
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, SupportsAdmissionControl}
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    this
  // Trigger.AvailableNow: the drain target is the row cap, already
  // fixed at scan build — prepare is a no-op and the rate-limited
  // batches walk to `hi` and stop, which is exactly the availableNow
  // contract (process everything that existed at start, in bounded
  // batches, then terminate).
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def initialOffset(): Offset = TicksOffset(lo)
  override def latestOffset(): Offset = TicksOffset(hi)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    TicksOffset(
      math.min(hi, start.asInstanceOf[TicksOffset].pos + ratePerBatch))
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = TicksOffset(hi)
  override def deserializeOffset(json: String): Offset =
    TicksOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] =
    split(start.asInstanceOf[TicksOffset].pos,
      end.asInstanceOf[TicksOffset].pos)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class TicksRange(from: Long, until: Long) extends InputPartition

class TicksReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[TicksRange]
    val names = schema.fieldNames
    new PartitionReader[InternalRow] {
      private var id = r.from - 1
      override def next(): Boolean = { id += 1; id < r.until }
      override def get(): InternalRow =
        InternalRow.fromSeq(names.toSeq.map(TicksSource.colValue(_, id)))
      override def close(): Unit = ()
    }
  }
}
