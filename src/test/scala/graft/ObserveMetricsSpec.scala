package graft

import java.sql.Timestamp
import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Dataset.observe` — the zero-extra-pass data-quality gauge (metrics
  * accumulate ON the task that already computes the query, where a
  * separate DQ aggregation would re-scan the input; at 100 TB the
  * re-scan IS the cost). Batch reads come back through `Observation`;
  * streaming ones ride each `StreamingQueryProgress.observedMetrics`
  * batch — the hook a production pipeline wires its expectation gates
  * to (q149's foreachBatch form is the materialized variant; this is
  * the in-flight one).
  */
class ObserveMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("batch observe: DQ gauges ride the query without a second scan") {
    val sp = spark
    import sp.implicits._
    val obs = Observation("dq")
    val df = Seq(("a", 1.0), ("b", -3.0), ("c", 2.0), ("d", -1.0))
      .toDF("k", "v")
      .observe(obs, count(lit(1)).as("rows"),
        sum(when($"v" < 0, 1L).otherwise(0L)).as("neg_rows"),
        min($"v").as("min_v"))
    // the consuming query is the ONLY job that runs
    assert(df.filter($"v" > 0).count() === 2)
    val m = obs.get
    assert(m("rows") === 4L)
    assert(m("neg_rows") === 2L)
    assert(m("min_v") === -3.0)
  }

  test("streaming observe: per-batch metrics reach the progress feed") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[TsEv]
    val q = mem.toDF()
      .observe("dq", count(lit(1)).as("rows"),
        sum(when($"value" < 0, 1L).otherwise(0L)).as("neg_rows"))
      .writeStream.format("memory").queryName("obs_sink")
      .outputMode("append").start()
    try {
      mem.addData(TsEv(ts("2024-01-01 10:00:00"), "u1", 1.0),
        TsEv(ts("2024-01-01 10:01:00"), "u2", -2.0))
      q.processAllAvailable()
      mem.addData(TsEv(ts("2024-01-01 10:02:00"), "u3", -4.0))
      q.processAllAvailable()
      val got = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("dq")))
        .map(r => (r.getAs[Long]("rows"), r.getAs[Long]("neg_rows")))
      assert(got.map(_._1).sum === 3L)
      assert(got.map(_._2).sum === 2L)
    } finally q.stop()
  }

  test("late rows surface as numRowsDroppedByWatermark, not silence") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[TsEv]
    val q = mem.toDF().withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("late_sink")
      .outputMode("append").start()
    try {
      mem.addData(TsEv(ts("2024-01-01 10:00:00"), "u1", 1.0))
      q.processAllAvailable()
      mem.addData(TsEv(ts("2024-01-01 12:00:00"), "u1", 1.0))
      q.processAllAvailable() // watermark advances to 11:55
      mem.addData(TsEv(ts("2024-01-01 10:30:00"), "u1", 1.0)) // late
      q.processAllAvailable()
      val dropped = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped === 1L)
    } finally q.stop()
  }
}
