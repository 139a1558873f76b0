package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Task-side parquet IO for the graft SQL catalog ([[GraftCatalog]]) —
  * the executor half of the table format's V2 surface, built on the
  * PUBLIC parquet-hadoop example API (no Spark-internal readers).
  *
  * A real columnar writer computes its zone maps WHILE writing (parquet
  * footer stats); this writer does the same — each file's per-column
  * (min, max) and null count accumulate as rows stream through, travel
  * to the driver inside the task's WriterCommitMessage, and land in the
  * manifest's `fileStats`, so the catalog's scan prunes files from
  * DRIVER-side metadata without ever opening a footer. At 100 TB that
  * is the difference between a manifest map-scan and 10⁶ footer reads
  * on every query.
  *
  * Type surface: flat schemas over {BIGINT, INT, DOUBLE, STRING,
  * BOOLEAN, DATE} — the projection types the reference's serving/gold
  * tables use. [[GraftCatalog.validateSchema]] rejects everything else
  * at CREATE TABLE, so files and readers can never disagree.
  *
  * Stats canonicalization (the format's cross-layer contract):
  * integers and dates (epoch days) as decimal strings, doubles via
  * Double.toString, strings raw, booleans "false"/"true". String
  * ordering is UTF8-binary (Spark's) — min/max track
  * [[UTF8String]] comparisons, NOT java.lang.String collation, so a
  * pruning decision made from the manifest agrees with what a Spark
  * filter would keep. Null counts ride along as the pseudo-column
  * `<col>:nulls` and the row count as `__rows` (the manifest's
  * fileStats value is a col → (min, max) map; the pseudo-entries keep
  * the format unchanged).
  */
object GraftParquetIO {

  val ROWS_KEY = "__rows"
  def nullsKey(col: String): String = s"$col:nulls"

  def messageType(schema: StructType, name: String = "graft"): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case LongType => Types.optional(PrimitiveTypeName.INT64)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType())
        case dt => throw new IllegalArgumentException(
          s"graft catalog cannot store column '${f.name}' of $dt")
      }
      b.addField(t.named(f.name))
    }
    b.named(name)
  }

  /** One file's write-time statistics, exactly as they land in the
    * manifest: data columns' (min, max) plus the `__rows` /
    * `<col>:nulls` pseudo-entries. Columns that were all-null have no
    * (min, max) entry — absent bounds must KEEP, the same rule as every
    * other stats layer in ManifestStore. */
  final class FileStats(schema: StructType) extends Serializable {
    private val n = schema.length
    private var rows = 0L
    private val nulls = new Array[Long](n)
    private val mins = new Array[Any](n)
    private val maxs = new Array[Any](n)

    def observe(row: InternalRow): Unit = {
      rows += 1
      var i = 0
      while (i < n) {
        if (row.isNullAt(i)) nulls(i) += 1
        else {
          schema.fields(i).dataType match {
            case LongType => obs(i, row.getLong(i))(_ < _)
            case IntegerType => obs(i, row.getInt(i))(_ < _)
            // total order (java.lang.Double.compare), NOT IEEE `<`:
            // NaN compares false both ways under `<` (a NaN row would
            // either poison or silently escape the bounds) and
            // -0.0 < 0.0 is false — while GraftPrune classifies with
            // Ordering.Double.TotalOrdering and Spark treats NaN as
            // the largest double, so bounds accumulated under IEEE `<`
            // could prune a file that holds matching rows
            case DoubleType =>
              obs(i, row.getDouble(i))(java.lang.Double.compare(_, _) < 0)
            case BooleanType => obs(i, row.getBoolean(i))(_ < _)
            case StringType =>
              // copy: Spark reuses UnsafeRow-backed UTF8String buffers
              obs(i, row.getUTF8String(i).clone())(_.compareTo(_) < 0)
            case DateType => obs(i, row.getInt(i))(_ < _)
            case dt => throw new IllegalStateException(s"unreachable $dt")
          }
        }
        i += 1
      }
    }
    private def obs[T](i: Int, v: T)(lt: (T, T) => Boolean): Unit = {
      if (mins(i) == null || lt(v, mins(i).asInstanceOf[T])) mins(i) = v
      if (maxs(i) == null || lt(maxs(i).asInstanceOf[T], v)) maxs(i) = v
    }

    def result(): Map[String, (String, String)] = {
      val b = Map.newBuilder[String, (String, String)]
      b += ROWS_KEY -> (rows.toString, rows.toString)
      var i = 0
      while (i < n) {
        val c = schema.fields(i).name
        b += nullsKey(c) -> (nulls(i).toString, nulls(i).toString)
        if (mins(i) != null)
          b += c -> (mins(i).toString, maxs(i).toString)
        i += 1
      }
      b.result()
    }
  }

  /** Streaming file writer: InternalRow in, (rows, stats) out at close. */
  final class Writer(path: String, schema: StructType, conf: Configuration) {
    private val mt = messageType(schema)
    private val factory = new SimpleGroupFactory(mt)
    private val stats = new FileStats(schema)
    private val w = {
      // ExampleParquetWriter reads its schema from the conf
      val c = new Configuration(conf)
      org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(mt, c)
      ExampleParquetWriter.builder(new HPath(path))
        .withConf(c)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    }
    def write(row: InternalRow): Unit = {
      stats.observe(row)
      val g = factory.newGroup()
      var i = 0
      while (i < schema.length) {
        if (!row.isNullAt(i)) {
          val name = schema.fields(i).name
          schema.fields(i).dataType match {
            case LongType => g.add(name, row.getLong(i))
            case IntegerType => g.add(name, row.getInt(i))
            case DoubleType => g.add(name, row.getDouble(i))
            case BooleanType => g.add(name, row.getBoolean(i))
            case StringType => g.add(name, row.getUTF8String(i).toString)
            case DateType => g.add(name, row.getInt(i))
            case dt => throw new IllegalStateException(s"unreachable $dt")
          }
        }
        i += 1
      }
      w.write(g)
    }
    def close(): Map[String, (String, String)] = {
      w.close()
      stats.result()
    }
  }

  /** Projected file reader: emits [[InternalRow]]s of `projection`
    * (a subset of the table schema, possibly empty — a COUNT(*) scan
    * reads the narrowest physical column and emits empty rows), plus
    * the file's path as a trailing `_file` column when `filePath` is
    * set (the metadata column the row-level runtime group filter
    * joins on). */
  final class Reader(path: String, fileSchema: StructType,
                     projection: StructType, conf: Configuration,
                     filePath: Option[String]) {
    // empty projection still has to DRIVE the read: request the
    // narrowest column to count rows, emit nothing from it
    private val phys: StructType =
      if (projection.nonEmpty) projection
      else StructType(Seq(fileSchema.fields.minBy(_.dataType match {
        case BooleanType => 0
        case IntegerType | DateType => 1
        case LongType | DoubleType => 2
        case _ => 3
      })))
    private val c = new Configuration(conf)
    c.set(ReadSupport.PARQUET_READ_SCHEMA, messageType(phys).toString)
    private val r: ParquetReader[Group] =
      ParquetReader.builder(new GroupReadSupport(), new HPath(path))
        .withConf(c).build()
    private val fileUtF8 = filePath.map(UTF8String.fromString).orNull
    private val width =
      projection.length + (if (filePath.isDefined) 1 else 0)

    /** Next row or null at EOF. The returned row is FRESH per call
      * (no buffer reuse) — partitions are small by the format's
      * file-size discipline, and correctness beats a row-buffer pool. */
    def next(): InternalRow = {
      val g = r.read()
      if (g == null) return null
      val row = new GenericInternalRow(width)
      var i = 0
      while (i < projection.length) {
        val name = projection.fields(i).name
        // field index in the REQUESTED schema = i (same order)
        if (g.getFieldRepetitionCount(i) == 0) row.update(i, null)
        else projection.fields(i).dataType match {
          case LongType => row.setLong(i, g.getLong(i, 0))
          case IntegerType => row.setInt(i, g.getInteger(i, 0))
          case DoubleType => row.setDouble(i, g.getDouble(i, 0))
          case BooleanType => row.setBoolean(i, g.getBoolean(i, 0))
          case StringType => row.update(i, UTF8String.fromString(g.getString(i, 0)))
          case DateType => row.setInt(i, g.getInteger(i, 0))
          case dt => throw new IllegalStateException(s"unreachable $dt at $name")
        }
        i += 1
      }
      if (fileUtF8 != null) row.update(projection.length, fileUtF8)
      row
    }
    def close(): Unit = r.close()
  }
}
