package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.graph.{Mode, Registry, TableDef}
import graft.ops.Relational

/** Epochal maker/taker rewards (zetadex-rewards-v2-pipeline.py,
  * SURVEY.md Appendix A): per-epoch volume shares → pro-rata reward
  * allocation → per-user rollup with cumulative totals.
  *
  * Input: a trades frame with (block_time, authority, asset, volume,
  * is_taker) — the shape produced by
  * [[TransactionsPipeline]]'s `cleaned_ix_trade`.
  */
object RewardsPipeline {

  /** @param referrals cleaned_referrals shape (referrer, alias, referral,
    *   timestamp) — the CDC-deduped output of the referrals pipeline
    *   (zetadex-referrals-pipeline.py:139–151)
    * @param tier3 / tier2 (30d referral volume, referral count) gates for
    *   referrer tiers (rewards-v2:352–366; defaults are the reference's
    *   production constants)
    */
  def build(spark: SparkSession, trades: () => DataFrame,
            epochRewardPool: Double = 10000.0,
            referrals: Option[() => DataFrame] = None,
            tier3: (Double, Int) = (2500000.0, 15),
            tier2: (Double, Int) = (1000000.0, 10)): Registry = {
    val sp = spark
    import sp.implicits._
    val reg = new Registry(spark)
    reg.source("cleaned_trades", trades)
    reg.source("cleaned_referrals", referrals.getOrElse(
      () => Seq.empty[(String, String, String, java.sql.Timestamp)]
        .toDF("referrer", "alias", "referral", "timestamp")))

    // per (epoch, user, asset) volume (rewards:64–73)
    reg.register(TableDef("agg_trades_epoch_user_asset", Seq("cleaned_trades"), {
      case Seq(tr) =>
        tr.withColumn("epoch", Relational.epochOf(col("block_time")))
          .groupBy("epoch", "authority", "asset", "is_taker")
          .agg(sum(col("volume").cast(graft.queries.QH.DEC)).cast("double")
            .as("volume"))
    }, mode = Mode.Incremental))

    // share-of-total within (epoch, asset) cohort → pro-rata reward
    // (rewards:104–176: two window sums divided, W10)
    reg.register(TableDef("agg_rewards_epoch_user_asset",
      Seq("agg_trades_epoch_user_asset"), { case Seq(v) =>
        val wCohort = Window.partitionBy("epoch", "asset", "is_taker")
        v.withColumn("cohort_volume",
            sum(col("volume").cast(graft.queries.QH.DEC)).over(wCohort)
              .cast("double"))
          .withColumn("share", col("volume") / col("cohort_volume"))
          .withColumn("reward", col("share") * epochRewardPool)
          .withColumn("volume_rank", rank().over(
            Window.partitionBy("epoch", "asset", "is_taker")
              .orderBy(col("volume").desc, col("authority"))))
      }, mode = Mode.Full))

    // per-user epoch rollup + cumulative rewards across epochs
    // (rewards:191–226 two-level re-agg A13, :318–322 cumulative W6)
    reg.register(TableDef("agg_rewards_epoch_user",
      Seq("agg_rewards_epoch_user_asset"), { case Seq(r) =>
        val perEpoch = r.groupBy("epoch", "authority", "is_taker")
          .agg(sum(col("reward").cast(graft.queries.QH.DEC)).cast("double")
            .as("reward"),
            sum(col("volume").cast(graft.queries.QH.DEC)).cast("double")
              .as("volume"))
        val wCum = Window.partitionBy("authority", "is_taker")
          .orderBy(col("epoch"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        perEpoch.withColumn("cumulative_reward",
          sum(col("reward").cast(graft.queries.QH.DEC)).over(wCum)
            .cast("double"))
      }, mode = Mode.Full))

    // ——— Referral rewards (rewards-v2:270–439) ———
    //
    // Exact-money discipline for the whole chain: every aggregate stays
    // DECIMAL across table boundaries, and tier-rate multiplications are
    // decimal×decimal (scale 6 × scale 3 → scale 9, exact) — a computed
    // double re-cast to decimal between levels double-rounds its last
    // ulp differently across engines (the q71 bug class). Doubles appear
    // only in the final user-facing projection.
    val D18 = "decimal(18,6)" // every money sum fits at any tested scale
    val D23 = "decimal(23,9)" // rate-multiplied rebates and their sums
    def dsum(c: org.apache.spark.sql.Column) = sum(c).cast(D18)

    // trades + trading_fee: pass through an upstream fee column when the
    // source carries one, else the new-fee-regime default of 2 bps of
    // volume (rewards-v2:368 "50% of 2bps", the /2-adjusted regime).
    reg.register(TableDef("cleaned_trades_rewards", Seq("cleaned_trades"), {
      case Seq(tr) =>
        val withFee =
          if (tr.columns.contains("trading_fee")) tr
          else tr.withColumn("trading_fee", col("volume") * lit(2e-4))
        withFee.withColumn("epoch", Relational.epochOf(col("block_time")))
    }, mode = Mode.Incremental))

    // As-of inequality join (J6, rewards-v2:275–288): a referee's trades
    // count toward the referral only from the referral timestamp on.
    // Spark plans the equi key (authority = referee) as a hash/sort-merge
    // join with the time bound as a residual predicate — linear, no
    // cartesian, and the build side is the referrals dim.
    reg.register(TableDef("agg_trades_rewards_epoch_referee_referrer",
      Seq("cleaned_trades_rewards", "cleaned_referrals"), {
      case Seq(tr, refs) =>
        val r1 = refs
          .withColumnRenamed("timestamp", "referral_timestamp")
          .withColumnRenamed("referral", "referee")
        tr.join(r1,
            tr("authority") === r1("referee") &&
              tr("block_time") >= col("referral_timestamp"))
          .groupBy("epoch", "referee", "referrer", "alias")
          .agg(dsum(col("volume").cast(D18)).as("volume"),
            dsum(col("trading_fee").cast(D18)).as("trading_fee"))
    }, mode = Mode.Full))

    // Referrer side (rewards-v2:305–390): 30d trailing referral volume →
    // per-(epoch, referrer) rollup → referral count as-of the epoch →
    // volume+count tier gates → tiered fee rebate → cumulative payouts.
    reg.register(TableDef("agg_referrer_rewards_epoch_user",
      Seq("agg_trades_rewards_epoch_referee_referrer", "cleaned_referrals"), {
      case Seq(v, refs) =>
        val w30 = Window.partitionBy("referee", "referrer")
          .orderBy(unix_timestamp(col("epoch")))
          .rangeBetween(-30L * 86400L, 0)
        val wCum = Window.partitionBy("referrer").orderBy(col("epoch"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        v.withColumn("referral_volume_30d",
            sum(col("volume")).over(w30).cast(D18))
          .groupBy("epoch", "referrer", "alias")
          .agg(dsum(col("volume")).as("referral_volume"),
            dsum(col("referral_volume_30d")).as("referral_volume_30d"),
            dsum(col("trading_fee")).as("referral_fee"))
          .join(refs.select(col("referrer"),
            col("timestamp").as("r2_timestamp")), Seq("referrer"), "left")
          .groupBy("epoch", "referrer", "alias", "referral_volume",
            "referral_volume_30d", "referral_fee")
          .agg(sum((col("epoch") >=
            date_trunc("week", col("r2_timestamp"))).cast("int"))
            .as("referral_count"))
          .withColumn("referrer_tier",
            when(col("referral_volume_30d") >= tier3._1 &&
              col("referral_count") >= tier3._2, 3)
              .when(col("referral_volume_30d") >= tier2._1 &&
                col("referral_count") >= tier2._2, 2)
              .otherwise(1))
          .withColumn("referrer_fee_rebate", // 0.2/2, 0.15/2, 0.1/2
            when(col("referrer_tier") === 3,
              col("referral_fee") * expr("CAST(0.100 AS DECIMAL(4,3))"))
              .when(col("referrer_tier") === 2,
                col("referral_fee") * expr("CAST(0.075 AS DECIMAL(4,3))"))
              .otherwise(
                col("referral_fee") * expr("CAST(0.050 AS DECIMAL(4,3))")))
          .withColumn("referrer_fee_rebate_cumsum",
            sum(col("referrer_fee_rebate")).over(wCum).cast(D23))
          .withColumn("referral_fee_cumsum",
            sum(col("referral_fee")).over(wCum).cast(D18))
          .withColumn("referral_volume_cumsum",
            sum(col("referral_volume")).over(wCum).cast(D18))
    }, mode = Mode.Full))

    // Referee side (rewards-v2:392–439): all tiers rebate the referee
    // 0.02/2 of their own fee; cumulative per referee. The referrer join
    // only needs the tier — column-pruned before the join.
    //
    // INTENTIONAL deviation from rewards-v2: the reference's cumulative
    // window orders by epoch alone, so a referee with two referrers in
    // one epoch gets engine-order-dependent intra-epoch cumsums. We add
    // `referrer` as a tie-break — same totals at every epoch boundary,
    // but the intermediate rows are deterministic (replayable, oracle-
    // comparable) instead of inheriting shuffle order.
    reg.register(TableDef("agg_referee_rewards_epoch_user",
      Seq("agg_trades_rewards_epoch_referee_referrer",
        "agg_referrer_rewards_epoch_user"), {
      case Seq(v, rr) =>
        val wCum = Window.partitionBy("referee")
          .orderBy(col("epoch"), col("referrer"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        v.withColumnRenamed("alias", "referrer_alias")
          .join(rr.select("epoch", "referrer", "referrer_tier"),
            Seq("epoch", "referrer"), "left")
          .withColumn("referee_fee_rebate",
            when(col("referrer_tier").isin(1, 2, 3),
              col("trading_fee") * expr("CAST(0.010 AS DECIMAL(4,3))"))
              .otherwise(expr("CAST(0 AS DECIMAL(23,9))")))
          .select(col("epoch"), col("referee"), col("referrer"),
            col("referrer_alias"),
            col("volume").cast("double").as("volume"),
            col("trading_fee").cast("double").as("trading_fee"),
            col("referee_fee_rebate").cast("double").as("referee_fee_rebate"),
            sum(col("referee_fee_rebate")).over(wCum).cast(D23)
              .cast("double").as("referee_fee_rebate_cumsum"),
            sum(col("trading_fee")).over(wCum).cast(D18)
              .cast("double").as("trading_fee_cumsum"),
            sum(col("volume")).over(wCum).cast(D18)
              .cast("double").as("volume_cumsum"))
    }, mode = Mode.Full))

    reg
  }
}
