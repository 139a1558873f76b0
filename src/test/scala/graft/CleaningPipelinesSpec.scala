package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.CleaningPipelines

class CleaningPipelinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("prices: per-minute dedup, positive filter, latest per underlying") {
    val sp = spark
    import sp.implicits._
    val raw = Seq(
      (ts("2024-01-05 10:00:10"), "SOL", 100.0, "a"),
      (ts("2024-01-05 10:00:40"), "SOL", 101.0, "b"), // same minute, dropped
      (ts("2024-01-05 10:01:10"), "SOL", 102.0, "a"),
      (ts("2024-01-05 10:00:00"), "ETH", -1.0, "a")) // non-positive, dropped
      .toDF("timestamp", "underlying", "price", "source")
    val reg = CleaningPipelines.prices(sp, () => raw)
    assert(reg.resolve("cleaned_prices").count() === 2)
    val latest = reg.resolve("latest_prices").collect()
    assert(latest.length === 1)
    assert(latest.head.getAs[Double]("price") === 102.0)
  }

  test("prices: coingecko hourly join derives notional open interest") {
    val sp = spark
    import sp.implicits._
    val raw = Seq(
      (ts("2024-01-05 10:20:00"), "SOL", 100.0, "a", 500.0),
      (ts("2024-01-05 11:20:00"), "SOL", 100.0, "a", 600.0)) // no cg row
      .toDF("timestamp", "underlying", "price", "source", "open_interest")
    val cg = Seq((ts("2024-01-05 10:05:00"), "SOL", 98.5))
      .toDF("timestamp", "underlying", "price_usd")
    val rows = CleaningPipelines.prices(sp, () => raw,
        coingecko = Some(() => cg))
      .resolve("cleaned_prices_oi").orderBy("timestamp").collect()
    assert(rows.length === 2)
    assert(rows.head.getAs[Double]("open_interest_notional") === 500.0 * 98.5)
    assert(rows.head.getAs[Int]("hour_") === 10)
    assert(rows(1).isNullAt(rows(1).fieldIndex("open_interest_notional")),
      "left join: missing USD price leaves notional null")
  }

  test("monitoring: formatted liquidity labels") {
    val sp = spark
    import sp.implicits._
    val raw = Seq((ts("2024-01-05 10:00:00"), "dex1", "SOL", 1000.0, 500.25))
      .toDF("timestamp", "venue", "asset", "bid_liquidity", "ask_liquidity")
    val out = CleaningPipelines.monitoring(sp, () => raw)
      .resolve("cleaned_exchange_liquidity").head()
    assert(out.getAs[String]("liquidity_label") === "dex1/SOL: 1500.25")
  }

  test("competitor: string cleanup + union with own stats") {
    val sp = spark
    import sp.implicits._
    val comp = Seq(("dexA", "$1,234.50"), ("dexB", "999")).toDF("exchange", "volume_str")
    val own = Seq(("zeta", 5000.0)).toDF("exchange", "volume")
    val out = CleaningPipelines.competitor(sp, () => comp, () => own)
      .resolve("cleaned_competitor_data").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out === Map("dexA" -> 1234.5, "dexB" -> 999.0, "zeta" -> 5000.0))
  }

  test("K3: append saveAsTable accumulates batches") {
    val sp = spark
    import sp.implicits._
    sp.sql("DROP TABLE IF EXISTS t_append")
    try {
      Seq((1, "a")).toDF("id", "v").write.saveAsTable("t_append")
      Seq((2, "b")).toDF("id", "v").write.mode("append").saveAsTable("t_append")
      assert(sp.table("t_append").count() === 2)
    } finally sp.sql("DROP TABLE IF EXISTS t_append")
  }
}
