package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming re-expressions of the reference's incremental semantics
  * (SURVEY.md §2.11). The batch transforms in [[graft.ops.Relational]] and
  * [[graft.queries]] are plan-identical in streaming mode — the reference
  * itself flips tables between `dlt.read` and `dlt.read_stream`; these
  * helpers cover the constructs that differ under incremental execution.
  */
object StreamingOps {

  /** Streaming CDC upsert (DLT `apply_changes`, zetaflex-pipeline.py:
    * 138–151): keep the max-(seq, tieBreak) row per key. Declarative
    * `max_by` aggregation → state is one row per key in the state store,
    * updates emitted in update output mode; scales linearly with key
    * cardinality, not stream length. Works identically on a batch frame
    * (where it equals [[graft.ops.Relational.applyChanges]]).
    */
  def applyChangesStream(keys: Seq[String], seq: Column, tieBreak: Seq[Column] = Nil)(
      df: DataFrame): DataFrame = {
    val ord = struct((seq +: tieBreak): _*)
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("__row"))
      .select(col("__row.*"))
  }

  /** Watermarked hourly aggregation (transactions:781–792: 5-min
    * watermark, `date_trunc('hour')` bucket — the reference deliberately
    * uses date_trunc over `F.window`, TX:783). Update-mode streaming agg;
    * batch recompute of the same expression must equal the final
    * streaming state (verified in StreamingSpec).
    */
  def watermarkedHourlyAgg(ts: String, watermark: String, dims: Seq[String],
                           aggs: Seq[Column])(df: DataFrame): DataFrame =
    df.withWatermark(ts, watermark)
      .groupBy((date_trunc("hour", col(ts)).as("hour_ts") +:
        dims.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Streaming dedup bounded by watermark (zetaflex-pipeline.py:86–88;
    * the un-watermarked variant was the reference's "super RAM intensive"
    * cliff, transactions:354 — the watermark bounds state). */
  def streamDedup(ts: String, watermark: String, keys: Seq[String])(
      df: DataFrame): DataFrame =
    df.withWatermark(ts, watermark)
      .dropDuplicatesWithinWatermark(keys)
}
