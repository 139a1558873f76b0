package graft.queries

import org.apache.spark.sql.functions._
import QH._

/** The referral-rewards chain (zetadex-rewards-v2-pipeline.py:270–439)
  * under the hard oracle gate: referee↔referrer as-of inequality join
  * (J6, rewards-v2:275–288) → 30d-trailing referral volume and as-of
  * referral counts gating referrer tiers → tiered fee rebates → referee
  * rebates with cumulative payouts (rewards-v2:305–439).
  *
  * The query resolves the REAL pipeline tables
  * ([[graft.pipelines.RewardsPipeline]]), not a re-implementation: trades
  * and referrals are derived deterministically from the events table
  * (clicks trade, signups refer, referrer = user_id mod 7) so DuckDB can
  * reproduce the exact inputs. Tier gates are scaled to the corpus
  * (production gates of 1M/2.5M 30d volume would leave every referrer
  * tier 1 on test data and the tier branches untested).
  */
object ReferralQueries {

  val qs: Seq[Q] = Seq(
    Q("q75_referral_rewards",
      (s, d) => {
        val trades = () =>
          t(s, d, "events").filter(col("event_type") === "click")
            .select(col("ts").as("block_time"),
              col("user_id").as("authority"),
              col("value").as("volume"))
        val referrals = () =>
          t(s, d, "events").filter(col("event_type") === "signup")
            .groupBy(col("user_id"))
            .agg(min(col("ts")).as("timestamp"))
            .select((col("user_id") % 7).as("referrer"),
              concat(lit("a"), (col("user_id") % 7)).as("alias"),
              col("user_id").as("referral"),
              col("timestamp"))
        graft.pipelines.RewardsPipeline
          .build(s, trades, referrals = Some(referrals),
            tier3 = (8000.0, 12), tier2 = (3000.0, 8))
          .resolve("agg_referee_rewards_epoch_user")
          .orderBy("epoch", "referee", "referrer")
      },
      Some("""
        WITH trades AS (
          SELECT CAST(ts AS TIMESTAMP) AS block_time, user_id AS authority,
            value AS volume, value * CAST(0.0002 AS DOUBLE) AS trading_fee,
            CAST(DATE_TRUNC('week', CAST(ts AS TIMESTAMP) - INTERVAL 104 HOUR)
              AS TIMESTAMP) + INTERVAL 104 HOUR AS epoch
          FROM events WHERE event_type = 'click'),
        refs AS (
          SELECT user_id % 7 AS referrer,
            'a' || CAST(user_id % 7 AS VARCHAR) AS alias,
            user_id AS referee,
            MIN(CAST(ts AS TIMESTAMP)) AS referral_timestamp
          FROM events WHERE event_type = 'signup' GROUP BY 1, 2, 3),
        v AS (
          SELECT epoch, referee, referrer, alias,
            CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DECIMAL(18,6))
              AS volume,
            CAST(SUM(CAST(trading_fee AS DECIMAL(18,6))) AS DECIMAL(18,6))
              AS trading_fee
          FROM trades t JOIN refs r
            ON t.authority = r.referee AND t.block_time >= r.referral_timestamp
          GROUP BY 1, 2, 3, 4),
        v30 AS (
          SELECT *, CAST(SUM(volume) OVER (
              PARTITION BY referee, referrer
              ORDER BY CAST(FLOOR(EPOCH(epoch)) AS BIGINT)
              RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
            AS DECIMAL(18,6)) AS referral_volume_30d
          FROM v),
        per_referrer AS (
          SELECT epoch, referrer, alias,
            CAST(SUM(volume) AS DECIMAL(18,6)) AS referral_volume,
            CAST(SUM(referral_volume_30d) AS DECIMAL(18,6))
              AS referral_volume_30d,
            CAST(SUM(trading_fee) AS DECIMAL(18,6)) AS referral_fee
          FROM v30 GROUP BY 1, 2, 3),
        counted AS (
          SELECT epoch, referrer, per_referrer.alias AS alias, referral_volume,
            referral_volume_30d, referral_fee,
            CAST(SUM(CAST(epoch >= CAST(DATE_TRUNC('week',
              r2.referral_timestamp) AS TIMESTAMP) AS INT)) AS BIGINT)
              AS referral_count
          FROM per_referrer LEFT JOIN refs r2 USING (referrer)
          GROUP BY 1, 2, 3, 4, 5, 6),
        tiered AS (
          SELECT *,
            CASE WHEN referral_volume_30d >= 8000.0 AND referral_count >= 12
                THEN 3
              WHEN referral_volume_30d >= 3000.0 AND referral_count >= 8
                THEN 2
              ELSE 1 END AS referrer_tier
          FROM counted),
        rr AS (
          SELECT epoch, referrer, referrer_tier FROM tiered),
        referee_side AS (
          SELECT v.epoch, v.referee, v.referrer, v.alias AS referrer_alias,
            v.volume, v.trading_fee,
            CASE WHEN rr.referrer_tier IN (1, 2, 3)
              THEN v.trading_fee * CAST(0.010 AS DECIMAL(4,3))
              ELSE CAST(0 AS DECIMAL(22,9)) END AS referee_fee_rebate
          FROM v LEFT JOIN rr ON v.epoch = rr.epoch AND v.referrer = rr.referrer)
        SELECT epoch, referee, referrer, referrer_alias,
          CAST(CAST(volume AS VARCHAR) AS DOUBLE) AS volume,
          CAST(CAST(trading_fee AS VARCHAR) AS DOUBLE) AS trading_fee,
          CAST(CAST(referee_fee_rebate AS VARCHAR) AS DOUBLE)
            AS referee_fee_rebate,
          CAST(CAST(CAST(SUM(referee_fee_rebate) OVER w AS DECIMAL(23,9))
            AS VARCHAR) AS DOUBLE) AS referee_fee_rebate_cumsum,
          CAST(CAST(CAST(SUM(trading_fee) OVER w AS DECIMAL(18,6))
            AS VARCHAR) AS DOUBLE) AS trading_fee_cumsum,
          CAST(CAST(CAST(SUM(volume) OVER w AS DECIMAL(18,6))
            AS VARCHAR) AS DOUBLE) AS volume_cumsum
        FROM referee_side
        WINDOW w AS (PARTITION BY referee ORDER BY epoch, referrer
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY epoch, referee, referrer"""))
  )
}
