package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset {
  private var lo = 0L
  private var hi = rows // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = TicksSource.SCHEMA
  private var aggPushed: Option[Seq[
    org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc]] = None
  private var aggGrouped = false
  private var limitPushed: Option[Int] = None
  private var offsetPushed: Option[Int] = None

  // ---- Aggregate pushdown: the connector analog of answering
  // COUNT/MIN/MAX from parquet footer statistics. tick_id and ts_sec
  // are AFFINE in the generation variable, so over the (filter-
  // narrowed) range [lo, hi) these aggregates are O(1) CLOSED FORMS —
  // no row is ever generated. Two shapes, exercising BOTH halves of
  // the V2 contract:
  //  - ungrouped → COMPLETE pushdown (supportCompletePushDown = true):
  //    one closed-form row, Spark plans no aggregate at all (q299);
  //  - GROUP BY symbol → PARTIAL pushdown (supportCompletePushDown =
  //    false): each partition returns per-group partial rows — symbol
  //    is tick_id % 8, so per-residue count/min/max over a contiguous
  //    range are closed forms too — and Spark's final aggregate
  //    combines them (COUNT partials are SUMmed). This is what a real
  //    columnar source does with per-row-group footer stats (q301).
  // Any other shape is declined and falls back to the normal scan with
  // Spark aggregating, which is always correct.
  private def isAffineCol(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference =>
        nr.fieldNames.toSeq == Seq("tick_id") ||
          nr.fieldNames.toSeq == Seq("ts_sec")
      case _ => false
    }
  private def supportedFuncs(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isAffineCol(m.column)
        case m: Max => isAffineCol(m.column)
        case _ => false
      }
  }
  private def supportedAgg(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = a.groupByExpressions.isEmpty && supportedFuncs(a)
  private def supportedGroupedAgg(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    a.groupByExpressions.toSeq.map {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference =>
        nr.fieldNames.toSeq
      case _ => Nil
    } == Seq(Seq("symbol")) && supportedFuncs(a)
  override def supportCompletePushDown(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = supportedAgg(a) // grouped is PARTIAL, never complete
  override def pushAggregation(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    if (supportedAgg(a)) {
      aggPushed = Some(a.aggregateExpressions.toSeq); true
    } else if (supportedGroupedAgg(a)) {
      aggPushed = Some(a.aggregateExpressions.toSeq)
      aggGrouped = true; true
    } else false

  // ---- Limit/TopN pushdown: LIMIT n truncates the generated range to
  // its first n ids (deterministic, and any n rows satisfy an
  // unordered LIMIT); ORDER BY tick_id ASC LIMIT n is the SAME
  // truncation because generation order IS tick_id order — both fully
  // pushed, so Spark drops its own limit machinery. Any other sort
  // order is declined (the scan would have to materialize everything
  // anyway, and a wrong "fully pushed" answer here is silent data
  // corruption).
  override def pushLimit(n: Int): Boolean =
    aggPushed.isEmpty && {
      hi = math.min(hi, math.max(lo, 0L) + n)
      limitPushed = Some(n); true
    }
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean =
    aggPushed.isEmpty && orders.length == 1 && {
      val o = orders(0)
      isAffineCol(o.expression()) && (o.expression() match {
        case nr: org.apache.spark.sql.connector.expressions.NamedReference =>
          nr.fieldNames.toSeq == Seq("tick_id")
        case _ => false
      }) &&
        o.direction() ==
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING
    } && {
      hi = math.min(hi, math.max(lo, 0L) + n)
      limitPushed = Some(n); true
    }
  // both Limit and TopN are pushed EXACTLY (range truncation), never
  // partially — Scala requires the diamond default be disambiguated
  override def isPartiallyPushed(): Boolean = false

  // ---- Offset pushdown: OFFSET m advances the range START by m rows,
  // the front-truncation dual of pushLimit's tail truncation. Spark's
  // pushdown rule establishes the composition order: for `LIMIT n
  // OFFSET m` it first pushes limit (n + m) and then offset m, so the
  // connector contract is "skip the first m rows of the already
  // limit-truncated stream" — for this source, lo += m after hi was
  // clamped. OFFSET without ORDER BY is nondeterministic by SQL
  // semantics (any m rows may be skipped), so range truncation is a
  // valid answer in every declension; with ORDER BY tick_id the TopN
  // path has already pinned generation order = result order and the
  // truncation is exact. Declined under aggregate pushdown (offset of
  // an aggregated stream is Spark's job, not the scan's).
  override def pushOffset(n: Int): Boolean =
    aggPushed.isEmpty && {
      lo = math.min(hi, math.max(lo, 0L) + n)
      offsetPushed = Some(n); true
    }

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
  override def build(): Scan = aggPushed match {
    case Some(funcs) if aggGrouped =>
      new TicksGroupedAggScan(math.min(lo, hi), hi, parts, funcs)
    case Some(funcs) =>
      new TicksAggScan(math.min(lo, hi), hi, funcs)
    case None =>
      new TicksScan(required, math.min(lo, hi), hi, parts, accepted,
        ratePerBatch, limitPushed, offsetPushed)
  }
}

/** The one-row result of a completely-pushed-down aggregation: every
  * supported aggregate over the (filter-narrowed) id range [lo, hi) is
  * a closed form of the range bounds — COUNT(*) = hi−lo, MIN/MAX of
  * the affine columns land on the endpoints. Empty range → SQL
  * semantics: COUNT 0, MIN/MAX null. */
class TicksAggScan(lo: Long, hi: Long,
    funcs: Seq[org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc])
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
  private val n = math.max(0L, hi - lo)
  private def colName(e: org.apache.spark.sql.connector.expressions.Expression)
      : String =
    e.asInstanceOf[org.apache.spark.sql.connector.expressions.NamedReference]
      .fieldNames.head
  override def readSchema(): StructType = StructType(funcs.map {
    case _: CountStar => StructField("count(*)", LongType, nullable = false)
    case m: Min =>
      StructField(s"min(${colName(m.column)})", LongType, nullable = true)
    case m: Max =>
      StructField(s"max(${colName(m.column)})", LongType, nullable = true)
    case f => throw new IllegalStateException(s"unsupported pushed agg $f")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_ticks AGGPUSHED range=[$lo,$hi) " +
      s"aggs=${funcs.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(TicksAggPartition(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory = {
    // the closed forms evaluate on the DRIVER — the task ships only the
    // finished primitive values (AggregateFunc instances are connector
    // expressions, not serializable task state)
    def endpoint(e: org.apache.spark.sql.connector.expressions.Expression,
                 id: Long): Any =
      if (n == 0L) null
      else colName(e) match {
        case "tick_id" => id
        case "ts_sec" => 1700000000L + id
      }
    val values: Array[Any] = funcs.map {
      case _: CountStar => n
      case m: Min => endpoint(m.column, lo)
      case m: Max => endpoint(m.column, hi - 1)
      case f => throw new IllegalStateException(s"unsupported $f")
    }.toArray
    new TicksAggReaderFactory(values)
  }
}

case class TicksAggPartition(lo: Long, hi: Long) extends InputPartition

class TicksAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = new PartitionReader[InternalRow] {
    private var emitted = false
    override def next(): Boolean = !emitted && { emitted = true; true }
    override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
    override def close(): Unit = ()
  }
}

/** PARTIAL grouped pushdown — the other half of the V2 aggregate
  * contract (`supportCompletePushDown = false`): each partition returns
  * per-group PARTIAL rows `(symbol, aggs…)` and Spark's final aggregate
  * combines them (COUNT partials are SUMmed, MIN/MAX are re-min/maxed).
  * Still zero generated ticks: symbol is `tick_id % 8`, so a group's
  * count and min/max of the affine columns over a contiguous id range
  * are closed forms per residue class. This is exactly how a columnar
  * source answers a grouped aggregate from per-row-group footer
  * statistics — each split contributes metadata-derived partials, the
  * engine merges. The ≤ 8-row partials are computed ON THE DRIVER at
  * partition-planning time (pure integer arithmetic, metadata scale)
  * and shipped inside the InputPartition, so the reader carries no
  * connector expressions across serialization. */
class TicksGroupedAggScan(lo: Long, hi: Long, parts: Int,
    funcs: Seq[org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc])
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
  private def colName(e: org.apache.spark.sql.connector.expressions.Expression)
      : String =
    e.asInstanceOf[org.apache.spark.sql.connector.expressions.NamedReference]
      .fieldNames.head
  // group-by columns FIRST, then the aggregates — the column order the
  // V2 pushdown rule zips its rewritten Aggregate against
  override def readSchema(): StructType = StructType(
    StructField("symbol", StringType, nullable = false) +: funcs.map {
      case _: CountStar => StructField("count(*)", LongType, nullable = false)
      case m: Min =>
        StructField(s"min(${colName(m.column)})", LongType, nullable = true)
      case m: Max =>
        StructField(s"max(${colName(m.column)})", LongType, nullable = true)
      case f => throw new IllegalStateException(s"unsupported pushed agg $f")
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_ticks AGGPUSHED GROUPED(symbol) PARTIAL range=[$lo,$hi) " +
      s"parts=$parts aggs=${funcs.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    val p = math.max(1, parts)
    (0 until p).iterator
      .map(i => (lo + n * i / p, lo + n * (i + 1) / p))
      .filter { case (f, u) => u > f }
      .map { case (f, u) =>
        val rows = (0 until 8).iterator.flatMap { s =>
          // ids ≡ s (mod 8) inside [f, u): count via the prefix form
          // |{i ∈ [0, x) : i ≡ s}|, endpoints by rounding f up / u−1
          // down to the residue class
          def upTo(x: Long): Long = if (x <= s) 0L else (x - s + 7) / 8
          val cnt = upTo(u) - upTo(f)
          if (cnt == 0L) Iterator.empty
          else {
            val minId = f + java.lang.Math.floorMod(s - f, 8L)
            val maxId = (u - 1) - java.lang.Math.floorMod(u - 1 - s, 8L)
            def endpoint(name: String, id: Long): Long = name match {
              case "tick_id" => id
              case "ts_sec" => 1700000000L + id
            }
            Iterator.single(("S" + s) +: funcs.map {
              case _: CountStar => cnt
              case m: Min => endpoint(colName(m.column), minId)
              case m: Max => endpoint(colName(m.column), maxId)
              case f => throw new IllegalStateException(s"unsupported $f")
            })
          }
        }.toArray
        TicksGroupedAggPartition(rows): InputPartition
      }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TicksGroupedAggReaderFactory
}

/** One partition's precomputed partial rows: (symbol, agg values…). */
case class TicksGroupedAggPartition(rows: Array[Seq[Any]])
    extends InputPartition

class TicksGroupedAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = new PartitionReader[InternalRow] {
    private val rows = partition.asInstanceOf[TicksGroupedAggPartition].rows
    private var i = -1
    override def next(): Boolean = { i += 1; i < rows.length }
    override def get(): InternalRow = InternalRow.fromSeq(rows(i).map {
      case s: String => UTF8String.fromString(s)
      case v => v
    })
    override def close(): Unit = ()
  }
}

/** Offset = absolute tick id of the stream's position, PLUS the pushed
  * predicate range the scan was built with. The range matters because
  * this scan serves both the batch and micro-batch legs, and pushed
  * tick_id filters narrow the generated id range — so the same `pos`
  * means different data under different predicates. Persisting [lo,hi)
  * into every checkpointed offset lets a restart VALIDATE that the
  * query still narrows to the range the checkpoint was written under,
  * and fail loudly instead of silently reinterpreting committed
  * offsets (round-13 advice). The generator itself is a pure function
  * of the id, so within a stable range the offset is fully replayable. */
case class TicksOffset(pos: Long, lo: Long, hi: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"pos":$pos,"lo":$lo,"hi":$hi}"""
}

object TicksOffset {
  private val Pat =
    """\{"pos":(-?\d+),"lo":(-?\d+),"hi":(-?\d+)\}""".r
  def parse(json: String): TicksOffset = json.trim match {
    case Pat(p, l, h) => TicksOffset(p.toLong, l.toLong, h.toLong)
    // the pre-range offset format was the bare decimal position; a
    // checkpoint written under it must fail with a message that NAMES
    // the migration, not a misleading "not an offset" (the bytes are a
    // perfectly valid offset of the old shape)
    case legacy if legacy.matches("-?\\d+") =>
      throw new IllegalArgumentException(
        s"graft-ticks offset format changed: checkpoint holds a legacy " +
          s"bare-position offset ($legacy), current offsets also record " +
          "the pushed tick_id range as {\"pos\":..,\"lo\":..,\"hi\":..}. " +
          "Restart the query from a new checkpoint location (the " +
          "generator is deterministic, so reprocessing is idempotent).")
    case other => throw new IllegalArgumentException(
      s"not a graft-ticks offset: $other")
  }
}

class TicksScan(schema: StructType, lo: Long, hi: Long, parts: Int,
    pushed: Array[Filter], ratePerBatch: Long,
    limitPushed: Option[Int] = None,
    offsetPushed: Option[Int] = None) extends Scan with Batch
    with SupportsReportStatistics
    with SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_ticks range=[$lo,$hi) pushed=${pushed.mkString(",")} " +
      limitPushed.fold("")(n => s"limit=$n ") +
      offsetPushed.fold("")(n => s"offset=$n ") +
      s"cols=${schema.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val st = rt
    st.runs match {
      case Some(runs) => runs.iterator
        .map { case (f, u) => (math.max(f, st.lo), math.min(u, st.hi)) }
        .collect { case (f, u) if u > f => TicksRange(f, u) }
        .toArray[InputPartition]
      case None => split(st.lo, st.hi)
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TicksReaderFactory(schema)

  private def split(from: Long, until: Long): Array[InputPartition] = {
    val n = math.max(0L, until - from)
    val p = math.max(1, parts)
    (0 until p).map { i =>
      TicksRange(from + n * i / p, from + n * (i + 1) / p)
    }.filter(r => r.until > r.from).toArray[InputPartition]
  }

  // ---- SupportsReportStatistics: size/row estimates AFTER pushdown,
  // so Catalyst's broadcast-threshold decision sees the narrowed range
  // (a predicate-pruned tick feed small enough to broadcast gets
  // broadcast, exactly like a filtered parquet scan with footer stats).
  // Width = fixed 8-byte numerics + the 2-char symbol, per PROJECTED
  // column — column pruning shrinks the estimate too.
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    private val width = schema.fields.map(_.dataType match {
      case StringType => 10L // "S0".."S7" + array/offset overhead
      case _ => 8L
    }).sum.max(1L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * width)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  // ---- SupportsRuntimeFiltering: dynamic pruning through the V2 scan.
  // At execution time a selective build side hands this scan In/range
  // predicates on tick_id; partitions re-plan to cover ONLY matching
  // ids (In-sets coalesce into contiguous runs — the generator analog
  // of pruning partitions/files). This is a pure partition-level
  // optimization: the join that produced the runtime filter re-applies
  // its own condition row-wise, so covering ranges are sufficient.
  // BATCH-ONLY state: the streaming leg keeps the build-time [lo,hi) —
  // runtime filters never shift checkpointed offsets.
  //
  // The narrowed state is ONE immutable value, replaced atomically by
  // `filter` through a pure fold (round-14 verdict item 6): the
  // previous three independently-mutated vars were safe under Spark's
  // per-query ScanBuilder→Scan lifecycle, but an exchange-reuse or
  // cached-scan change sharing a Scan across plan fragments would have
  // observed a half-applied narrowing. A torn read is now impossible —
  // planInputPartitions snapshots the single reference once.
  private case class RtState(lo: Long, hi: Long,
                             runs: Option[Seq[(Long, Long)]])
  @volatile private var rt = RtState(lo, hi, None)
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("tick_id"))
  override def filter(filters: Array[Filter]): Unit =
    rt = filters.foldLeft(rt)(applyRuntimeFilter)

  private def applyRuntimeFilter(st: RtState, f: Filter): RtState = f match {
    case org.apache.spark.sql.sources.In("tick_id", vs) =>
      // `.distinct` before coalescing: SupportsRuntimeFiltering does
      // not contract a duplicate-free id set (Spark's DPP path happens
      // to supply one), and a duplicated id — [5,5,6] — would break
      // the advance loop below into overlapping runs that silently
      // DUPLICATE rows
      val ids = vs.iterator.collect { case v: Long => v }
        .filter(v => v >= st.lo && v < st.hi).toArray.distinct.sorted
      // coalesce sorted ids into [from, until) runs
      val runs = Seq.newBuilder[(Long, Long)]
      var i = 0
      while (i < ids.length) {
        val from = ids(i)
        var until = from + 1
        while (i + 1 < ids.length && ids(i + 1) == until) {
          until += 1; i += 1
        }
        runs += ((from, until))
        i += 1
      }
      val next = runs.result()
      // intersect with any earlier runtime In-set by clipping to runs
      st.copy(runs = Some(st.runs.fold(next)(prev =>
        next.flatMap { case (f, u) =>
          prev.collect { case (pf, pu) if pu > f && pf < u =>
            (math.max(f, pf), math.min(u, pu))
          }
        })))
    case GreaterThan("tick_id", v: Long) =>
      st.copy(lo = math.max(st.lo, v + 1))
    case GreaterThanOrEqual("tick_id", v: Long) =>
      st.copy(lo = math.max(st.lo, v))
    case LessThan("tick_id", v: Long) => st.copy(hi = math.min(st.hi, v))
    case LessThanOrEqual("tick_id", v: Long) =>
      st.copy(hi = math.min(st.hi, v + 1))
    case EqualTo("tick_id", v: Long) =>
      st.copy(lo = math.max(st.lo, v), hi = math.min(st.hi, v + 1))
    case _ => st // unsupported runtime filter: ignore (join re-applies)
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
  override def initialOffset(): Offset = TicksOffset(lo, lo, hi)
  override def latestOffset(): Offset = TicksOffset(hi, lo, hi)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    TicksOffset(
      math.min(hi, start.asInstanceOf[TicksOffset].pos + ratePerBatch),
      lo, hi)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = TicksOffset(hi, lo, hi)
  // The loud-fail point for predicate drift: every checkpointed offset
  // carries the pushed range it was committed under, and a restart
  // whose (possibly different) WHERE clause narrows the scan to a
  // DIFFERENT range must not reinterpret those offsets as other data.
  override def deserializeOffset(json: String): Offset = {
    val off = TicksOffset.parse(json)
    if (off.lo != lo || off.hi != hi)
      throw new IllegalStateException(
        s"graft-ticks checkpoint was written with pushed tick_id range " +
          s"[${off.lo},${off.hi}) but this restart narrows the scan to " +
          s"[$lo,$hi) — the stream's predicate changed. Keep the " +
          "predicate stable across restarts, or start a new checkpoint.")
    off
  }
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
