package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

case class Ev(k: String, seq: Long, v: String)
case class TsEv(ts: Timestamp, user: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("applyChangesStream: final state equals batch applyChanges under out-of-order arrival") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingOps.applyChangesStream(Seq("k"), col("seq"))(mem.toDF())
    val q = out.writeStream.format("memory").queryName("acs")
      .outputMode("update").start()
    try {
      mem.addData(Ev("a", 2, "v2"), Ev("b", 1, "w1"))
      q.processAllAvailable()
      mem.addData(Ev("a", 1, "v1-late"), Ev("a", 3, "v3"), Ev("b", 4, "w4"))
      q.processAllAvailable()
      // memory sink in update mode appends updates; latest per key wins
      val state = sp.sql("SELECT * FROM acs").as[Ev].collect()
        .groupBy(_.k).map { case (k, rows) => k -> rows.maxBy(_.seq).v }
      assert(state === Map("a" -> "v3", "b" -> "w4"))
      // batch equivalence
      val batch = graft.ops.Relational.applyChanges(Seq("k"), col("seq"))(
        Seq(Ev("a", 2, "v2"), Ev("b", 1, "w1"), Ev("a", 1, "v1-late"),
          Ev("a", 3, "v3"), Ev("b", 4, "w4")).toDF())
        .as[Ev].collect().map(e => e.k -> e.v).toMap
      assert(batch === state)
    } finally q.stop()
  }

  test("watermarkedHourlyAgg: streaming result matches batch recompute") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[TsEv]
    val agg = StreamingOps.watermarkedHourlyAgg(
      "ts", "5 minutes", Seq("user"),
      Seq(count(lit(1)).as("n"), sum($"value").as("s")))(mem.toDF())
    val q = agg.writeStream.format("memory").queryName("whagg")
      .outputMode("update").start()
    try {
      val rows = Seq(
        TsEv(ts("2024-01-01 10:05:00"), "u1", 1.0),
        TsEv(ts("2024-01-01 10:55:00"), "u1", 2.0),
        TsEv(ts("2024-01-01 10:30:00"), "u2", 4.0), // out of order within hour
        TsEv(ts("2024-01-01 11:10:00"), "u1", 8.0))
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      // update mode emits one row per state revision; the final state per
      // key is the one with the highest running count
      val streaming = sp.sql(
        "SELECT hour_ts, user, n, s FROM whagg").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      val batch = rows.toDF()
        .groupBy(date_trunc("hour", $"ts").as("hour_ts"), $"user")
        .agg(count(lit(1)).as("n"), sum($"value").as("s"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(streaming === batch)
    } finally q.stop()
  }

  test("streamDedup drops duplicate keys within the watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[TsEv]
    val out = StreamingOps.streamDedup("ts", "1 hour", Seq("user"))(mem.toDF())
    val q = out.writeStream.format("memory").queryName("sdd")
      .outputMode("append").start()
    try {
      mem.addData(
        TsEv(ts("2024-01-01 10:00:00"), "u1", 1.0),
        TsEv(ts("2024-01-01 10:10:00"), "u1", 2.0), // dup key within watermark
        TsEv(ts("2024-01-01 10:20:00"), "u2", 3.0))
      q.processAllAvailable()
      val n = sp.sql("SELECT count(*) FROM sdd").head().getLong(0)
      assert(n === 2)
    } finally q.stop()
  }
}
