package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipelines.MadwarsFlexReferralsPipelines

/** Fixture-verified specs for the Madwars / Flex / Referrals pipelines
  * (madwars-pipeline.py:54–291, zetaflex-pipeline.py:75–409,
  * zetadex-referrals-pipeline.py:117–152). */
class MadwarsFlexReferralsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- Madwars ----------------------------------------------------------
  // Conf.ForTests as-of = 2024-01-30 12:00 → the snapshot filter keeps the
  // 12:00 row per authority.
  private def pnlFixture = {
    val sp = spark; import sp.implicits._
    Seq(
      // authority, timestamp, equity, cumulative_pnl, deposit_amount
      ("a1", ts("2024-01-30 11:00:00"), 100.0, 10.0, 50.0),
      ("a1", ts("2024-01-30 12:00:00"), 130.0, 40.0, 0.0),
      ("a2", ts("2024-01-30 11:00:00"), 200.0, -5.0, 0.0),
      ("a2", ts("2024-01-30 12:00:00"), 190.0, -15.0, 0.0))
      .toDF("authority", "timestamp", "equity", "cumulative_pnl",
        "deposit_amount")
  }
  private def tradesFixture = {
    val sp = spark; import sp.implicits._
    Seq(
      ("a1", ts("2024-01-30 11:30:00"), 500.0),
      ("a2", ts("2024-01-30 11:45:00"), 900.0),
      ("a2", ts("2023-12-01 00:00:00"), 99999.0)) // before competition start
      .toDF("authority", "block_time", "volume")
  }
  private def madwarsReg = MadwarsFlexReferralsPipelines.madwars(
    spark, () => pnlFixture, () => tradesFixture)

  test("madwars teams are deterministic hash buckets, not rand()") {
    val reg = madwarsReg
    val t1 = reg.resolve("teams").orderBy("authority").collect()
    val t2 = madwarsReg.resolve("teams").orderBy("authority").collect()
    assert(t1.map(_.getAs[String]("team")).toSeq ===
      t2.map(_.getAs[String]("team")).toSeq, "same team on every run")
    assert(t1.map(_.getAs[String]("backpack_username")).toSeq ===
      Seq("user-1", "user-2"))
    assert(t1.forall(r => r.getAs[Double]("multiplier") >= 1.0 &&
      r.getAs[Double]("multiplier") < 2.0))
  }

  test("madwars pnl_individual: competition pnl/roi/ranks at the as-of hour") {
    val rows = madwarsReg.resolve("pnl_individual")
      .orderBy("authority").collect()
    assert(rows.length === 2, "snapshot filter keeps only the as-of hour")
    val a1 = rows(0); val a2 = rows(1)
    // pnl = cumulative_pnl − first(cumulative_pnl) since competition start
    assert(a1.getAs[Double]("pnl") === 30.0)
    assert(a2.getAs[Double]("pnl") === -10.0)
    // volume excludes pre-competition trades
    assert(a2.getAs[Double]("volume") === 900.0)
    // a1 (pnl 30) beats a2 (pnl −10)
    assert(a1.getAs[Int]("pnl_rank_global") === 1)
    assert(a2.getAs[Int]("pnl_rank_global") === 2)
    assert(a2.getAs[Int]("volume_rank_global") === 1)
    // Dietz: a1's 11:00 deposit 50 weighted by (12:00−11:00)/(12:00−start)
    val w = 3600.0 / ((ts("2024-01-30 12:00:00").getTime
      - ts("2024-01-01 00:00:00").getTime) / 1000.0)
    val expectedRoi = 30.0 / (100.0 + 100.0 + 50.0 * w)
    assert(math.abs(a1.getAs[Double]("roi") - expectedRoi) < 1e-12)
  }

  test("madwars pnl_team aggregates teams and excludes No Team") {
    val ind = madwarsReg.resolve("pnl_individual")
    val teams = ind.select("team").distinct().collect().map(_.getString(0))
    val rows = madwarsReg.resolve("pnl_team").collect()
    // every emitted team row aggregates positive volume, ranked densely
    assert(rows.forall(_.getAs[Double]("volume") > 0))
    assert(rows.forall(_.getAs[String]("team") !== "No Team"))
    if (rows.nonEmpty)
      assert(rows.map(_.getAs[Int]("pnl_rank")).min === 1)
    assert(teams.nonEmpty)
  }

  // ---- Flex -------------------------------------------------------------
  test("flex CDC targets keep the latest row per key; tvl dedupes per day") {
    val sp = spark; import sp.implicits._
    val auctions = Seq(
      ("auc1", ts("2024-01-01 10:00:00"), "open"),
      ("auc1", ts("2024-01-01 11:00:00"), "settled"),
      ("auc2", ts("2024-01-01 10:30:00"), "open"))
      .toDF("auction_address", "indexed_timestamp", "status")
    val tvl = Seq(
      (ts("2024-01-01 05:00:00"), 100.0, "2024", "01", "01"),
      (ts("2024-01-01 09:00:00"), 120.0, "2024", "01", "01"),
      (ts("2024-01-02 05:00:00"), 130.0, "2024", "01", "02"))
      .toDF("timestamp", "tvl", "year", "month", "day")
    val reg = MadwarsFlexReferralsPipelines.flex(spark, Map(
      "raw_tvl" -> (() => tvl),
      "raw_auction" -> (() => auctions)))
    val cleaned = reg.resolve("cleaned_auction").orderBy("auction_address")
      .collect()
    assert(cleaned.length === 2)
    assert(cleaned.head.getAs[String]("status") === "settled")
    val ctvl = reg.resolve("cleaned_tvl").orderBy("timestamp").collect()
    // one row per (year,month,day), earliest timestamp survives
    assert(ctvl.length === 2)
    assert(ctvl.head.getAs[Double]("tvl") === 100.0)
  }

  // ---- Referrals --------------------------------------------------------
  test("referrals join on the indexed hour, CDC keeps latest per pair") {
    val sp = spark; import sp.implicits._
    val referrers = Seq(
      ("ref1", "alice", ts("2024-01-01 10:05:00")),
      ("ref1", "alice2", ts("2024-01-01 11:20:00")))
      .toDF("referrer", "alias", "indexed_timestamp")
    val referrals = Seq(
      ("ref1", "userX", ts("2024-01-01 10:40:00"), ts("2024-01-01 10:39:00")),
      ("ref1", "userX", ts("2024-01-01 11:10:00"), ts("2024-01-01 11:09:00")),
      ("ref2", "userY", ts("2024-01-01 10:00:00"), ts("2024-01-01 09:59:00")))
      .toDF("referrer", "referral", "indexed_timestamp", "timestamp")
    val reg = MadwarsFlexReferralsPipelines.referrals(
      spark, () => referrers, () => referrals)
    val v = reg.resolve("raw_referrals_v").collect()
    // ref1 joins in hours 10 and 11 (alias alice then alice2); ref2 has no
    // referrer row → inner join drops it
    assert(v.length === 2)
    val cleaned = reg.resolve("cleaned_referrals").collect()
    assert(cleaned.length === 1)
    assert(cleaned.head.getAs[String]("alias") === "alice2",
      "latest indexed hour wins")
    assert(cleaned.head.getAs[Int]("hour_") === 11)
  }
}
