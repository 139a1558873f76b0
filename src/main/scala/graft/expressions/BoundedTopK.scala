package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k largest (ord, id) pairs of a
  * group — ordered by `ord` descending with ascending `id` as the
  * tie-break — in a fixed-size buffer with map-side combine.
  *
  * Why this exists: the row_number-over-window top-k (O2/W2, the
  * reference's idiom at zetadex-transactions-helius-pipeline.py:
  * 1941–1945) must SHUFFLE EVERY ROW to its group before it can rank,
  * then discards all but k. At 100 TB that shuffle is the job. As an
  * aggregate, each map task reduces its slice of a group to ≤ k pairs
  * before the exchange, so the shuffle carries O(partitions × k) rows
  * per group instead of all of them — the same partial-aggregation
  * leverage `TakeOrderedAndProject` gives a GLOBAL top-k, made
  * per-group.
  *
  * Returns `array<struct<ord double, id bigint>>` sorted (ord desc, id
  * asc), length ≤ k. The buffer is a plain insertion-sorted parallel
  * array pair — for serving-sized k (≤ ~100) that beats a heap's
  * constant factor and serializes flat.
  */
case class BoundedTopK(
    ordChild: Expression,
    idChild: Expression,
    k: Int = 10,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopK.Buf] {

  require(k > 0 && k <= 10000, "graft_topk: k must be in (0, 10000]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (ordChild.dataType == DoubleType && idChild.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects (double, bigint), got " +
        s"(${ordChild.dataType.simpleString}, ${idChild.dataType.simpleString})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(ordChild, idChild)

  override def createAggregationBuffer(): BoundedTopK.Buf =
    new BoundedTopK.Buf(k)

  override def update(buf: BoundedTopK.Buf, input: InternalRow): BoundedTopK.Buf = {
    val o = ordChild.eval(input)
    val i = idChild.eval(input)
    if (o != null && i != null)
      buf.offer(o.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: BoundedTopK.Buf, b: BoundedTopK.Buf): BoundedTopK.Buf = {
    var j = 0
    while (j < b.size) { a.offer(b.ords(j), b.ids(j)); j += 1 }
    a
  }

  override def eval(buf: BoundedTopK.Buf): Any =
    if (buf.size == 0) null
    else new GenericArrayData(
      (0 until buf.size).map { j =>
        InternalRow(buf.ords(j), buf.ids(j))
      }.toArray[Any])

  override def serialize(buf: BoundedTopK.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putDouble(buf.ords(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedTopK.Buf(k)
    var j = 0
    while (j < n) { buf.offer(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(ordChild = newChildren(0), idChild = newChildren(1))
}

object BoundedTopK {
  /** Insertion-sorted bounded buffer, kept in (ord desc, id asc) order.
    * Total order: ties on ord resolve to the smaller id, so the result
    * is deterministic under any merge order — including NaN ords
    * (graft_cosine yields NaN for a zero vector), which
    * `Double.compare`'s total order ranks above +∞; raw `>`/`==` would
    * compare false everywhere and tie-break NaNs by arrival order. */
  final class Buf(k: Int) {
    val ords = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** True if (o1, i1) ranks strictly before (o2, i2). */
    @inline private def before(o1: Double, i1: Long, o2: Double, i2: Long)
        : Boolean = {
      val c = java.lang.Double.compare(o1, o2)
      c > 0 || (c == 0 && i1 < i2)
    }

    def offer(o0: Double, i: Long): Unit = {
      val o = if (o0 == 0.0d) 0.0d else o0 // canonicalize -0.0 (compare
      // would order it below +0.0; arithmetic treats them equal)
      if (size == k && !before(o, i, ords(size - 1), ids(size - 1))) return
      // find insertion point (buffer is small; linear from the tail)
      var pos = if (size == k) size - 1 else size
      while (pos > 0 && before(o, i, ords(pos - 1), ids(pos - 1))) pos -= 1
      if (pos >= k) return
      val last = math.min(size, k - 1)
      var j = last
      while (j > pos) { ords(j) = ords(j - 1); ids(j) = ids(j - 1); j -= 1 }
      ords(pos) = o
      ids(pos) = i
      if (size < k) size += 1
    }
  }
}
