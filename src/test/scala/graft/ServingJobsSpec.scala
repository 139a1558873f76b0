package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Conf
import graft.serving.{ParquetKVSink, ServingJobs}

class ServingJobsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("serveSnapshot: as-of hour filter, ALL rollup, unpivot, KV write") {
    val sp = spark
    import sp.implicits._
    val gold = Seq(
      (ts("2024-01-30 10:00:00"), "SOL", 100.0, 10.0),
      (ts("2024-01-30 10:00:00"), "ETH", 50.0, 5.0),
      (ts("2024-01-30 09:00:00"), "SOL", 999.0, 99.0)) // wrong hour, dropped
      .toDF("timestamp", "asset", "volume", "fees")
    val conf = Conf(Instant.parse("2024-01-30T12:00:00Z"))
    val out = Files.createTempDirectory("servejobs").toString
    val served = ServingJobs.serveSnapshot(gold, "timestamp", "asset",
      Seq("volume", "fees"), conf, new ParquetKVSink(out), "leaderboard")
    val rows = served.collect()
      .map(r => (r.getAs[String]("asset"), r.getAs[String]("metric")) ->
        r.getAs[Double]("value")).toMap
    assert(rows(("SOL", "volume")) === 100.0)
    assert(rows(("ALL", "volume")) === 150.0)
    assert(rows(("ALL", "fees")) === 15.0)
    assert(rows.size === 6) // 3 asset buckets x 2 metrics
    val back = spark.read.parquet(s"$out/leaderboard")
    assert(back.count() === 6)
    assert(back.columns.contains("ttl"))
    // ttl = snapshot + 14 days in unix seconds
    val snapSecs = Instant.parse("2024-01-30T12:00:00Z").getEpochSecond
    assert(back.select("ttl").head().getLong(0) === snapSecs + 14 * 86400)
  }

  test("serveAllTimeStats folds in the historical backfill constants") {
    val sp = spark
    import sp.implicits._
    val hourly = Seq(("SOL", 10.0, 2L), ("ETH", 5.0, 1L))
      .toDF("asset", "volume", "trade_count")
    val out = Files.createTempDirectory("servestats").toString
    val served = ServingJobs.serveAllTimeStats(hourly, "volume",
      "trade_count", baseVolume = 455316870.8536678, baseCount = 200322L,
      new ParquetKVSink(out), "stats")
    val r = served.head()
    assert(r.getAs[Double]("totalVolume") === 455316870.8536678 + 15.0)
    assert(r.getAs[Long]("totalCount") === 200325L)
  }
}
