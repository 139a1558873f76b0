package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Conf
import graft.graph.{Mode, Registry, TableDef}
import graft.ops.Relational

/** The three remaining reference notebook families, as thin compositions
  * of ops already in the engine: the Madwars trading-competition
  * leaderboards (madwars-pipeline.py:54–291), the Flex CDC silver set
  * (zetaflex-pipeline.py:75–409), and referrals
  * (zetadex-referrals-pipeline.py:117–152).
  */
object MadwarsFlexReferralsPipelines {

  /** Madwars competition (MW:54–291). Inputs: pnl snapshots
    * (authority, timestamp, equity, cumulative_pnl, deposit_amount),
    * trades (authority, block_time, volume). The reference's
    * `rand(42)` team draw (MW:60) — unstable under retry/AQE — becomes
    * a deterministic authority-hash bucket; `current_timestamp` in the
    * Dietz weight and snapshot filter becomes the injectable
    * [[graft.core.Conf.asOf]] clock.
    */
  def madwars(spark: SparkSession, pnl: () => DataFrame,
              trades: () => DataFrame,
              competitionStart: String = "2024-01-01 00:00:00",
              conf: Conf = Conf.ForTests): Registry = {
    val reg = new Registry(spark)
    reg.source("cleaned_pnl", pnl)
    reg.source("cleaned_ix_trade", trades)

    val teamNames = Seq(
      "Mad Swords", "Mad Swords", "Mad Androids", "Mad Ballers",
      "Mad Skulls", "Mad Lassies", "Mad Peacemakers", "Mad Busters",
      "The Scouts", "Mad Naked", "SOL Samurais", "AI Lads",
      "Mad Galaxies", "Mad Alberts", "Mad Kings", "Mad Classic",
      "Nights Watch", "Mad Generals", "Mad Vitaliks", "No Team")

    // teams view (MW:54–92): 5%-wide buckets over a deterministic
    // uniform draw r ∈ [0, 1) derived from the authority hash
    reg.register(TableDef("teams", Seq("cleaned_pnl"), { case Seq(p) =>
      val r = (pmod(xxhash64(col("authority")), lit(10000L)) / 10000.0).as("r")
      val bucketed = p.select("authority").distinct().withColumn("r", r)
      val team = teamNames.zipWithIndex.foldRight(lit("No Team"): Column) {
        case ((name, i), other) =>
          when(col("r") < (i + 1) * 0.05, name).otherwise(other)
      }
      bucketed
        .withColumn("team", team)
        .withColumn("backpack_username", concat_ws("-", lit("user"),
          row_number().over(Window.orderBy("authority"))))
        .withColumn("multiplier", col("r") + 1)
        .drop("r")
    }, mode = Mode.Full))

    // volume view (MW:99–107)
    reg.register(TableDef("volume", Seq("cleaned_ix_trade"), { case Seq(tr) =>
      tr.filter(col("block_time") >= lit(competitionStart))
        .groupBy("authority")
        .agg(sum(col("volume")).as("volume"))
    }, mode = Mode.Full))

    // pnl_individual (MW:111–220): per-authority cumulative anchors,
    // competition-fraction Dietz weight, pnl/roi, 6 tie-broken ranks
    // (3 global + 3 per-team), snapshot filter at the as-of hour.
    reg.register(TableDef("pnl_individual",
      Seq("teams", "cleaned_pnl", "volume"), {
      case Seq(teams, pnlDf, volume) =>
        val wCum = Window.partitionBy("authority")
          .orderBy(unix_timestamp(col("timestamp")))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // MW:130–136 writes unboundedPreceding+1 here; PySpark clamps it
        // back to unbounded (see Relational.cumulativeExclusiveOfFirst),
        // so reference-parity is the plain cumulative frame.
        def rankBy(keys: Seq[String], order: Column*) =
          rank().over(Window.partitionBy(keys.map(col): _*).orderBy(order: _*))
        val nowH = unix_timestamp(date_trunc("hour", conf.asOfTs))
        val startTs = unix_timestamp(to_timestamp(lit(competitionStart)))
        teams
          .join(pnlDf, Seq("authority"), "left")
          .filter(col("timestamp") >= lit(competitionStart))
          .withColumn("equity", coalesce(col("equity"), lit(0.0)))
          .withColumn("cumulative_pnl", coalesce(col("cumulative_pnl"), lit(0.0)))
          .withColumn("deposit_amount", coalesce(col("deposit_amount"), lit(0.0)))
          .join(volume, Seq("authority"), "left")
          .withColumn("volume", coalesce(col("volume"), lit(0.0)))
          .withColumn("cumulative_pnl_lag", first(col("cumulative_pnl")).over(wCum))
          .withColumn("equity_lag", first(col("equity")).over(wCum))
          .withColumn("w",
            (nowH - unix_timestamp(col("timestamp"))) / (nowH - startTs))
          .withColumn("deposit_amount_weighted",
            sum(col("deposit_amount") * col("w")).over(wCum))
          .drop("w")
          .withColumn("pnl", col("cumulative_pnl") - col("cumulative_pnl_lag"))
          .withColumn("roi", when(col("pnl") === 0, lit(0.0)).otherwise(
            col("pnl") / (lit(100.0) + col("equity_lag")
              + col("deposit_amount_weighted"))))
          .withColumn("pnl_rank_global", rankBy(Seq("timestamp"),
            col("pnl").desc, col("roi").desc, col("authority")))
          .withColumn("roi_rank_global", rankBy(Seq("timestamp"),
            col("roi").desc, col("pnl").desc, col("authority")))
          .withColumn("volume_rank_global", rankBy(Seq("timestamp"),
            col("volume").desc, col("authority")))
          .withColumn("pnl_rank_team", rankBy(Seq("timestamp", "team"),
            col("pnl").desc, col("roi").desc, col("authority")))
          .withColumn("roi_rank_team", rankBy(Seq("timestamp", "team"),
            col("roi").desc, col("pnl").desc, col("authority")))
          .withColumn("volume_rank_team", rankBy(Seq("timestamp", "team"),
            col("volume").desc, col("authority")))
          .filter(col("timestamp") === date_trunc("hour", conf.asOfTs))
    }, mode = Mode.Full))

    // pnl_team (MW:226–291): team rollup of the individual frame +
    // 3 ranks. The reference ranks volume over the ROI window spec
    // (MW:289 — an evident copy-paste slip); the volume rank here uses
    // the volume ordering the surrounding code intends.
    reg.register(TableDef("pnl_team", Seq("pnl_individual"), {
      case Seq(ind) =>
        def rankT(order: Column*) =
          rank().over(Window.partitionBy("timestamp").orderBy(order: _*))
        ind.filter(col("team") =!= "No Team")
          .groupBy("timestamp", "team")
          .agg(
            sum(col("cumulative_pnl")).as("cumulative_pnl"),
            sum(col("equity")).as("equity"),
            sum(col("equity_lag")).as("equity_lag"),
            sum(col("pnl")).as("pnl"),
            sum(col("deposit_amount_weighted")).as("deposit_amount_weighted"),
            sum(col("volume")).as("volume"))
          .filter(col("volume") > 0)
          .withColumn("roi", when(col("pnl") === 0, lit(0.0)).otherwise(
            col("pnl") / (lit(100.0) + col("equity_lag")
              + col("deposit_amount_weighted"))))
          .withColumn("pnl_rank", rankT(col("pnl").desc, col("roi").desc,
            col("team")))
          .withColumn("roi_rank", rankT(col("roi").desc, col("pnl").desc,
            col("team")))
          .withColumn("volume_rank", rankT(col("volume").desc, col("team")))
    }, mode = Mode.Full))
    reg
  }

  /** Flex silver set (zetaflex-pipeline.py): watermark-deduped TVL
    * (FL:75–89) plus the five CDC upsert targets (FL:138–409), each a
    * latest-row-per-key [[Relational.applyChanges]] keyed and sequenced
    * exactly as the reference's `dlt.apply_changes` calls.
    */
  def flex(spark: SparkSession,
           sources: Map[String, () => DataFrame]): Registry = {
    val reg = new Registry(spark)
    sources.foreach { case (n, f) => reg.source(n, f) }

    reg.register(TableDef("cleaned_tvl", Seq("raw_tvl"), { case Seq(r) =>
      Relational.dedupeExact(Seq("year", "month", "day"), col("timestamp"))(r)
        .withColumn("date_", to_date(col("timestamp")))
    }, mode = Mode.Incremental, partitionCols = Seq("date_")))

    val cdcTargets = Seq(
      // target, source, keys, sequence col (FL:138–151 … FL:396–409)
      ("cleaned_auction", "raw_auction", Seq("auction_address")),
      ("cleaned_combo_option", "raw_combo_option", Seq("combo_option_account")),
      ("cleaned_option", "raw_option", Seq("option_account")),
      ("cleaned_settlement_account", "raw_settlement_account",
        Seq("settlement_account")),
      ("cleaned_underlying", "raw_underlying", Seq("underlying_mint")))
    cdcTargets.foreach { case (target, source, keys) =>
      if (sources.contains(source))
        reg.register(TableDef(target, Seq(source), { case Seq(r) =>
          Relational.applyChanges(keys, col("indexed_timestamp"))(r)
        }, mode = Mode.Incremental))
    }
    reg
  }

  /** Referrals (zetadex-referrals-pipeline.py:117–152): hour-truncated
    * referrer×referral join view, then CDC upsert keyed on
    * (referrer, referral) sequenced by the indexed hour.
    */
  def referrals(spark: SparkSession, rawReferrers: () => DataFrame,
                rawReferrals: () => DataFrame): Registry = {
    val reg = new Registry(spark)
    reg.source("raw_referrers", rawReferrers)
    reg.source("raw_referrals", rawReferrals)

    reg.register(TableDef("raw_referrals_v",
      Seq("raw_referrers", "raw_referrals"), { case Seq(rr, rl) =>
        val referrers = rr.withColumn("indexed_timestamp",
          date_trunc("hour", col("indexed_timestamp")))
        val referralsDf = rl.withColumn("indexed_timestamp",
          date_trunc("hour", col("indexed_timestamp")))
        referrers.join(referralsDf, Seq("indexed_timestamp", "referrer"))
          .select(col("referrer"), col("alias"), col("referral"),
            col("timestamp"), col("indexed_timestamp"))
          .withColumn("date_", to_date(col("indexed_timestamp")))
          .withColumn("hour_",
            date_format(col("indexed_timestamp"), "HH").cast("int"))
    }, mode = Mode.Incremental))

    reg.register(TableDef("cleaned_referrals", Seq("raw_referrals_v"), {
      case Seq(v) =>
        Relational.applyChanges(Seq("referrer", "referral"),
          col("indexed_timestamp"), Seq(col("timestamp")))(v)
    }, mode = Mode.Incremental))
    reg
  }
}
