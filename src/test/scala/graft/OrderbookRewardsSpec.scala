package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.{OrderbookPipeline, RewardsPipeline}

case class ObLevel(price: Double, size: Double, open_order_address: String,
                   authority: String)
case class ObSnap(asset: String, local_timestamp: Timestamp,
                  exchange_timestamp: Timestamp, midpoint: Double,
                  mark_price: Double, bids: Seq[ObLevel], asks: Seq[ObLevel])
case class Trade(block_time: Timestamp, authority: String, asset: String,
                 volume: Double, is_taker: Boolean)

class OrderbookRewardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  private def snaps = Seq(
    // mm1 quotes tight two-sided (qualifies), mm2 only bids wide
    ObSnap("SOL", ts("2024-01-05 09:00:00"), ts("2024-01-05 09:00:00"),
      100.0, 100.0,
      bids = Seq(
        ObLevel(99.9, 100.0, "a1", "mm1"), // 10 bps, $9990 -> tight
        ObLevel(99.7, 20.0, "a2", "mm2")), // 30 bps, $1994 -> wide
      asks = Seq(
        ObLevel(100.1, 100.0, "a3", "mm1"))), // 10 bps -> tight
    ObSnap("SOL", ts("2024-01-05 09:01:00"), ts("2024-01-05 09:01:00"),
      100.0, 100.0,
      bids = Seq(ObLevel(99.9, 100.0, "a1", "mm1")),
      asks = Seq(ObLevel(102.0, 100.0, "a4", "mm1")))) // 200 bps -> outside

  test("orderbook MM pipeline: spread groups, two-sided uptime, score") {
    val sp = spark
    import sp.implicits._
    val reg = OrderbookPipeline.build(sp, () => snaps.toDF())
    val all = reg.resolve("cleaned_orderbook_all").collect()
    assert(all.length === 5)
    assert(all.count(_.getAs[String]("spread_group") === "tight") === 3)
    assert(all.count(_.getAs[String]("spread_group") === "wide") === 1)
    assert(all.count(_.getAs[String]("spread_group") === "outside") === 1)

    val scores = reg.resolve("agg_mm_scores").collect()
      .map(r => r.getAs[String]("authority") -> r).toMap
    // mm1: two-sided in snap1 only -> uptime 1/2
    assert(scores("mm1").getAs[Double]("uptime") === 0.5)
    // mm2: never two-sided
    assert(scores("mm2").getAs[Double]("uptime") === 0.0)
    val mm1 = scores("mm1")
    assert(mm1.getAs[Double]("score") ===
      math.pow(mm1.getAs[Double]("avg_depth_usd"), 0.15) * math.pow(0.5, 5.0))
  }

  test("orderbook full program: params assert, maker volume, Q formula") {
    val sp = spark
    import sp.implicits._
    val trades = Seq(
      ("mm1", ts("2024-01-05 09:10:00"), false, 2000.0), // maker fill
      ("mm1", ts("2024-01-05 09:20:00"), true, 500.0),   // taker -> excluded
      ("rando", ts("2024-01-05 09:30:00"), false, 9999.0)) // not whitelisted
      .toDF("authority", "block_time", "is_taker", "volume")
    val labels = Seq(("mm1", "MM One"), ("mm2", "MM Two"))
      .toDF("pub_key", "label")
    val reg = OrderbookPipeline.build(sp, () => snaps.toDF(),
      trades = Some(() => trades), pubkeyLabel = Some(() => labels),
      marketParams = Seq(("SOL", 0.6), ("ETH", 0.4)))
    val vol = reg.resolve("agg_mm_maker_volume_1h").collect()
    assert(vol.length === 1, "whitelist + maker filter")
    assert(vol.head.getAs[Double]("maker_volume") === 2000.0)
    val book = reg.resolve("agg_orderbook_all").collect()
    assert(book.length === 1 && book.head.getAs[Long]("n_snapshots") === 2L)
    val q = reg.resolve("agg_mm_scores_1h").collect()
      .map(r => r.getAs[String]("authority") -> r).toMap
    val mm1 = q("mm1")
    assert(mm1.getAs[Double]("q") ===
      math.pow(mm1.getAs[Double]("avg_depth_usd"), 0.15)
        * math.pow(0.5, 5.0) * math.pow(2000.0, 0.85))
    assert(mm1.getAs[Double]("weighted_q") === mm1.getAs[Double]("q") * 0.6)
    // mm2 has no maker volume -> q_volume 0 -> q 0
    assert(q("mm2").getAs[Double]("q") === 0.0)
    // weight-sum invariant rejects a bad params table eagerly
    assertThrows[IllegalArgumentException] {
      OrderbookPipeline.build(sp, () => snaps.toDF(),
        marketParams = Seq(("SOL", 0.9)))
    }
  }

  test("rewards pipeline: pro-rata shares per epoch cohort + cumulative") {
    val sp = spark
    import sp.implicits._
    val trades = Seq(
      Trade(ts("2024-01-05 09:00:00"), "u1", "SOL", 300.0, true),
      Trade(ts("2024-01-05 10:00:00"), "u2", "SOL", 100.0, true),
      // next epoch (after Friday 08:00 the following week)
      Trade(ts("2024-01-12 09:00:00"), "u1", "SOL", 50.0, true))
    val reg = RewardsPipeline.build(sp, () => trades.toDF(),
      epochRewardPool = 1000.0)
    val perAsset = reg.resolve("agg_rewards_epoch_user_asset").collect()
      .map(r => (r.getAs[String]("authority"),
        r.getAs[Timestamp]("epoch").toString) -> r).toMap
    val e1 = "2024-01-05 08:00:00.0"
    val e2 = "2024-01-12 08:00:00.0"
    assert(perAsset(("u1", e1)).getAs[Double]("share") === 0.75)
    assert(perAsset(("u1", e1)).getAs[Double]("reward") === 750.0)
    assert(perAsset(("u2", e1)).getAs[Int]("volume_rank") === 2)
    assert(perAsset(("u1", e2)).getAs[Double]("share") === 1.0)

    val perUser = reg.resolve("agg_rewards_epoch_user").collect()
      .map(r => (r.getAs[String]("authority"),
        r.getAs[Timestamp]("epoch").toString) ->
        r.getAs[Double]("cumulative_reward")).toMap
    assert(perUser(("u1", e1)) === 750.0)
    assert(perUser(("u1", e2)) === 1750.0)
  }

  test("referral chain: as-of join, tier gates, tiered rebates, cumsums " +
    "(rewards-v2:270–439)") {
    val sp = spark
    import sp.implicits._
    // u1 referred by r9 on Jan 3; the Jan 1 trade predates the referral
    // and must not count (rewards-v2:275–288). u2 referred by r9 too,
    // u3 by r8.
    val trades = Seq(
      Trade(ts("2024-01-01 09:00:00"), "u1", "SOL", 9999.0, true), // pre-referral
      Trade(ts("2024-01-05 09:00:00"), "u1", "SOL", 3000.0, true),
      Trade(ts("2024-01-05 10:00:00"), "u2", "SOL", 2000.0, true),
      Trade(ts("2024-01-05 11:00:00"), "u3", "ETH", 100.0, true),
      // next epoch: only u1 trades
      Trade(ts("2024-01-12 09:00:00"), "u1", "SOL", 1000.0, true))
    val referrals = Seq(
      ("r9", "apex", "u1", ts("2024-01-03 00:00:00")),
      ("r9", "apex", "u2", ts("2024-01-03 00:00:00")),
      ("r8", "beta", "u3", ts("2024-01-03 00:00:00")))
      .toDF("referrer", "alias", "referral", "timestamp")
    val reg = RewardsPipeline.build(sp, () => trades.toDF(),
      referrals = Some(() => referrals),
      tier3 = (10000.0, 3), tier2 = (4000.0, 2))
    val e1 = "2024-01-05 08:00:00.0"
    val e2 = "2024-01-12 08:00:00.0"

    val view = reg.resolve("agg_trades_rewards_epoch_referee_referrer")
      .collect()
      .map(r => (r.getAs[String]("referee"),
        r.getAs[Timestamp]("epoch").toString) -> r).toMap
    // pre-referral trade excluded: u1 epoch-1 volume is 3000, not 12999
    assert(view(("u1", e1)).getAs[java.math.BigDecimal]("volume")
      .doubleValue === 3000.0)

    val rr = reg.resolve("agg_referrer_rewards_epoch_user").collect()
      .map(r => (r.getAs[String]("referrer"),
        r.getAs[Timestamp]("epoch").toString) -> r).toMap
    // r9 epoch 1: vol30d = 5000 ≥ 4000 and 2 referees as-of → tier 2;
    // fee = 5000×2e-4 = 1.0; rebate = 1.0×0.075
    val r9e1 = rr(("r9", e1))
    assert(r9e1.getAs[Long]("referral_count") === 2L)
    assert(r9e1.getAs[Int]("referrer_tier") === 2)
    assert(r9e1.getAs[java.math.BigDecimal]("referrer_fee_rebate")
      .doubleValue === 0.075)
    // r8: vol30d 100 → tier 1; rebate = 0.02×0.05 = 0.001
    val r8e1 = rr(("r8", e1))
    assert(r8e1.getAs[Int]("referrer_tier") === 1)
    assert(r8e1.getAs[java.math.BigDecimal]("referrer_fee_rebate")
      .doubleValue === 0.001)
    // r9 epoch 2: only u1 has an epoch-2 row; its 30d window still sees
    // the epoch-1 volume (3000+1000) — u2 contributes nothing at e2
    val r9e2 = rr(("r9", e2))
    assert(r9e2.getAs[java.math.BigDecimal]("referral_volume_30d")
      .doubleValue === 4000.0)
    // tier 2 again (4000 ≥ 4000, count 2): cumsum = 1.0×0.075 + 0.2×0.075
    assert(r9e2.getAs[java.math.BigDecimal]("referrer_fee_rebate_cumsum")
      .doubleValue === 0.09)

    val re = reg.resolve("agg_referee_rewards_epoch_user").collect()
      .map(r => (r.getAs[String]("referee"),
        r.getAs[Timestamp]("epoch").toString) -> r).toMap
    // u1: rebate = own fee × 0.01 = 0.6×0.01; cumsum adds epoch 2
    assert(re(("u1", e1)).getAs[Double]("referee_fee_rebate") === 0.006)
    assert(re(("u1", e2)).getAs[Double]("referee_fee_rebate_cumsum")
      === 0.006 + 1000.0 * 2e-4 * 0.01)
    assert(re(("u3", e1)).getAs[String]("referrer_alias") === "beta")
  }
}
