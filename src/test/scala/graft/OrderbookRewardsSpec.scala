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
}
