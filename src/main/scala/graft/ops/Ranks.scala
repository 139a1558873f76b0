package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed global ranking without a single-partition window.
  *
  * `row_number()/dense_rank()` over an unpartitioned window collapse the
  * whole dataset onto one task — the exact anti-pattern the plan budget
  * bans. This op computes an EQUALITY-PRESERVING, ORDER-PRESERVING global
  * rank the way a 1000-executor job has to:
  *
  *  1. range-repartition + sort within partitions on the key (Spark's
  *     distributed sort — the same machinery as `orderBy`, minus the
  *     final single collect);
  *  2. collect per-partition ROW COUNTS (metadata-scale: one long per
  *     partition) and prefix-sum them into partition offsets;
  *  3. one `mapPartitionsWithIndex` pass assigns each row
  *     rank = global row number of the FIRST row of its equality class.
  *
  * Equal keys land in one partition (RangePartitioner maps a key to a
  * single bucket), so the class-start scan never crosses a partition
  * boundary. The rank is 0-based, ties share a rank, and values are the
  * class-start row numbers — dense enough for prefix-doubling (what
  * matters there is equality preservation, not contiguity).
  */
object Ranks {

  /** Append `out` = global 0-based rank of the row's key class.
    * `keyCols` must exist in `df`; rank order is the ascending
    * lexicographic order of the key columns (nulls first, per Spark's
    * default ordering).
    *
    * `tieAcc`, when supplied, receives one count per row that is NOT the
    * first of its equality class — zero after the pass (which only a
    * completed action guarantees) means every key was unique, the
    * convergence signal iterative callers (prefix doubling) use to stop
    * early. Task retries can only inflate the count, never zero a
    * nonzero one, so the zero test stays safe.
    */
  def globalKeyRank(df: DataFrame, keyCols: Seq[String], out: String,
      tieAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val s = df.sparkSession
    val parts = s.sessionState.conf.numShufflePartitions
    val keys: Seq[Column] = keyCols.map(col)
    // materialize the sorted layout once: the counts pass and the rank
    // pass must see the SAME partitioning
    val sorted = df.repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .localCheckpoint()
    val sortedRdd = sorted.rdd
    // pass 1 — metadata-scale: one count per partition, no shuffle
    val counts = sortedRdd
      .mapPartitionsWithIndex { (pid, rows) =>
        Iterator.single(pid -> rows.size.toLong)
      }.collect().toMap
    val offsets = new Array[Long](parts + 1)
    for (p <- 0 until parts)
      offsets(p + 1) = offsets(p) + counts.getOrElse(p, 0L)
    val bc = s.sparkContext.broadcast(offsets)
    val keyIdx = keyCols.map(sorted.schema.fieldIndex)
    val outSchema = StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField(out, LongType, nullable = false))
    // pass 2 — sequential class-start scan per partition (row-preserving,
    // so the sorted partitioning survives the conversion)
    val ranked = sortedRdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val base = bc.value(pid)
        var i = 0L
        var prevKey: Seq[Any] = null
        var classStart = 0L
        rows.map { r =>
          val k = keyIdx.map(r.get)
          if (prevKey == null || k != prevKey) classStart = base + i
          else tieAcc.foreach(_.add(1L))
          prevKey = k
          i += 1
          Row.fromSeq(r.toSeq :+ classStart)
        }
      }
    s.createDataFrame(ranked, outSchema)
  }
}
