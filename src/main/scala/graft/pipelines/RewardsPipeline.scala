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

  def build(spark: SparkSession, trades: () => DataFrame,
            epochRewardPool: Double = 10000.0): Registry = {
    val reg = new Registry(spark)
    reg.source("cleaned_trades", trades)

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

    reg
  }
}
