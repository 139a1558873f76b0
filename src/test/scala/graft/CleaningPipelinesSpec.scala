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

  // PR:252–285: the vaults bronze/silver pair — bronze carries the landed
  // hive partition strings, silver drops exactly them and nothing else.
  test("prices: vault_balances bronze passes through, silver drops hive cols") {
    val sp = spark
    import sp.implicits._
    val landed = Seq(
      (ts("2024-01-05 10:00:00"), "SOL", 1000.0, 50.0, 1050.0, 123L,
        "2024", "01", "05", "10"),
      (ts("2024-01-05 11:00:00"), "SOL", 1100.0, 55.0, 1155.0, 456L,
        "2024", "01", "05", "11"))
      .toDF("timestamp", "underlying", "vault_balance",
        "insurance_vault_balance", "tvl", "slot",
        "year", "month", "day", "hour")
    val reg = CleaningPipelines.prices(sp,
      () => Seq((ts("2024-01-05 10:00:00"), "SOL", 1.0, "a"))
        .toDF("timestamp", "underlying", "price", "source"),
      vaults = Some(() => landed))
    val raw = reg.resolve("raw_vault_balances")
    assert(raw.count() === 2)
    assert(raw.columns.contains("year"), "bronze keeps the landed layout")
    val cleaned = reg.resolve("cleaned_vault_balances")
    assert(cleaned.columns.toSeq ===
      Seq("timestamp", "underlying", "vault_balance",
        "insurance_vault_balance", "tvl", "slot"))
    assert(cleaned.orderBy("timestamp").collect()
      .map(_.getAs[Double]("tvl")).toSeq === Seq(1050.0, 1155.0))
  }

  test("prices: vaults default source is an empty frame with the landing DDL") {
    val sp = spark
    import sp.implicits._
    val reg = CleaningPipelines.prices(sp,
      () => Seq((ts("2024-01-05 10:00:00"), "SOL", 1.0, "a"))
        .toDF("timestamp", "underlying", "price", "source"))
    val cleaned = reg.resolve("cleaned_vault_balances")
    assert(cleaned.count() === 0)
    assert(cleaned.schema.fieldNames.contains("tvl"))
  }

  // PM:37–85: the two monitoring bronze ingests — declared DDL, no
  // transform; row fidelity and schema are the contract.
  test("monitoring: raw orders/stats ingests keep declared schema and rows") {
    val sp = spark
    import sp.implicits._
    val liquidity = Seq((ts("2024-01-05 10:00:00"), "dex1", "SOL", 1.0, 2.0))
      .toDF("timestamp", "venue", "asset", "bid_liquidity", "ask_liquidity")
    val orders = Seq(
      ("SOL", ts("2024-01-05 10:00:00"), 5000L, null.asInstanceOf[String]),
      ("ETH", ts("2024-01-05 10:00:30"), 7000L, "blockhash expired"))
      .toDF("underlying", "timestamp", "priority_fee", "error_message")
    val stats = Seq(("SOL", ts("2024-01-05 10:00:00"), 3, 5, 101.25))
      .toDF("underlying", "timestamp", "update_age_local",
        "update_age_exchange", "mark_price")
    val reg = CleaningPipelines.monitoring(sp, () => liquidity,
      orders = Some(() => orders), stats = Some(() => stats))
    val o = reg.resolve("raw_monitoring_orders")
    assert(o.columns.toSeq ===
      Seq("underlying", "timestamp", "priority_fee", "error_message"))
    assert(o.filter(o("error_message").isNotNull).count() === 1)
    val st = reg.resolve("raw_monitoring_stats")
    assert(st.count() === 1)
    assert(st.head().getAs[Double]("mark_price") === 101.25)
    // both raws default to empty-but-typed when no feed is wired
    val bare = CleaningPipelines.monitoring(sp, () => liquidity)
    assert(bare.resolve("raw_monitoring_orders").count() === 0)
    assert(bare.resolve("raw_monitoring_stats").schema.fieldNames
      .contains("update_age_exchange"))
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
