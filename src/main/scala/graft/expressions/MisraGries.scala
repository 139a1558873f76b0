package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a bounded mergeable aggregate —
  * the frequent-items counterpart of [[BoundedTopK]]: an exact
  * `groupBy(item).count` must SHUFFLE one row per distinct item (at
  * 100 TB of tokens, billions of keys) when all the caller wants is the
  * handful of items above a frequency threshold. The MG summary holds at
  * most k counters per map task, combines map-side, and merges
  * associatively, so the shuffle carries O(partitions × k) entries.
  *
  * Counter semantics (the mergeable-summaries form, Agarwal et al. 2013):
  * add increments or inserts; when the map exceeds k entries, the
  * (k+1)-th largest counter value is subtracted from every counter and
  * non-positive entries drop. Merging concatenates counts then applies
  * the same shrink. For ANY update/merge order the summary guarantees
  *   est ≤ true_count   and   true_count − est ≤ n / (k+1)
  * (n = total items), hence every item with true_count > n/(k+1) is
  * present. The exact counter VALUES do depend on merge order — queries
  * must gate on the order-free guarantees (q113's boolean-gate columns,
  * the q99/q101 device), never hash-compare raw estimates.
  *
  * Returns `array<struct<item string, est bigint>>`, (est desc, item asc).
  */
case class MisraGries(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGries.Buf] {

  require(k > 0 && k <= 100000, "graft_heavy: k must be in (0, 100000]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy expects a string item, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_heavy"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): MisraGries.Buf =
    new MisraGries.Buf(k)

  override def update(buf: MisraGries.Buf, input: InternalRow): MisraGries.Buf = {
    val v = child.eval(input)
    // toString copies out of the row's reused backing buffer
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: MisraGries.Buf, b: MisraGries.Buf): MisraGries.Buf = {
    a.mergeFrom(b)
    a
  }

  override def eval(buf: MisraGries.Buf): Any = {
    if (buf.m.isEmpty) return null
    import scala.jdk.CollectionConverters._
    val entries = buf.m.entrySet().asScala.toArray
      .map(e => (e.getKey, e.getValue.longValue()))
      .sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(entries.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    }.toArray[Any])
  }

  override def serialize(buf: MisraGries.Buf): Array[Byte] = {
    import scala.jdk.CollectionConverters._
    val items = buf.m.entrySet().asScala.toArray
    val payload = items.map(e => e.getKey.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(
      4 + payload.map(_.length + 12).sum)
    bb.putInt(items.length)
    var j = 0
    while (j < items.length) {
      bb.putInt(payload(j).length)
      bb.put(payload(j))
      bb.putLong(items(j).getValue.longValue())
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MisraGries.Buf(k)
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val c = bb.getLong
      buf.m.put(new String(b, StandardCharsets.UTF_8), c)
      j += 1
    }
    buf // a serialized summary is already ≤ k entries; no shrink needed
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0))
}

object MisraGries {
  /** k-bounded counter map with the merge-then-shrink reduction. */
  final class Buf(k: Int) {
    val m = new java.util.HashMap[String, java.lang.Long](k * 2)

    def add(item: String, c: Long): Unit = {
      val cur = m.get(item)
      if (cur != null) m.put(item, cur + c)
      else {
        m.put(item, c)
        if (m.size > k) shrink()
      }
    }

    def mergeFrom(b: Buf): Unit = {
      val it = b.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = m.get(e.getKey)
        m.put(e.getKey, if (cur == null) e.getValue
          else java.lang.Long.valueOf(cur + e.getValue))
      }
      if (m.size > k) shrink()
    }

    /** Subtract the (k+1)-th largest counter from every counter; drop
      * non-positive entries. Leaves ≤ k entries (everything tied with
      * the pivot drops). Each shrink subtracts its pivot from at most
      * all counters while retiring ≥ pivot×(k+1) total count, which is
      * what bounds the cumulative error at n/(k+1). */
    private def shrink(): Unit = {
      val vals = new Array[Long](m.size)
      val it0 = m.values().iterator()
      var j = 0
      while (it0.hasNext) { vals(j) = it0.next().longValue(); j += 1 }
      java.util.Arrays.sort(vals)
      val pivot = vals(vals.length - 1 - k) // (k+1)-th largest
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - pivot
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }
  }
}
