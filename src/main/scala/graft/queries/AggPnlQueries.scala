package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import QH._

/** The reference's heaviest gold table at full width: `agg_pnl`
  * (zetadex-transactions-helius-pipeline.py:1486–1878), re-expressed
  * over the events corpus. Structure mirrors the reference stage for
  * stage:
  *
  *   hourly snapshots → cumulative equity / flow cumsums (W6) →
  *   24h/7d/30d/alltime first()-anchors (W4/W8) → Modified-Dietz
  *   weighted flows over exclusive-start windows (W5, TX:1508–1523) →
  *   period PnL + ROI with the $100 fudge (TX:1619–1655) → 7 tie-broken
  *   leaderboard ranks (W1, TX:1656–1663) → rank-change vs trailing
  *   window (W9, TX:1664–1694) → offset-hour trades join (J5,
  *   TX:1736–1742) + nft-multiplier / campaign left joins (J11,
  *   TX:1743–1744) → z-score formula (TX:1750–1763) → windowed
  *   volume / multiplier / z-score sums + 4 z-score ranks and changes
  *   (TX:1764–1816) → 53-column projection (TX:1817–1877).
  *
  * Shuffle economy: every trailing/cumulative window shares one
  * partitioning (user_id, ordered by epoch-seconds), every leaderboard
  * rank shares one partitioning (timestamp), and the three dimension
  * joins broadcast — the whole composite is 6 shuffle exchanges
  * (asserted in PlanSpec), independent of how many of the ~30 window
  * columns are computed.
  *
  * Determinism: the reference's `current_timestamp()` Dietz weights
  * (TX:1581–1601) become the injectable [[graft.core.Conf.asOf]] clock;
  * the weighted-flow sum Σ v·(T₀−t)/period is decomposed into two
  * decimal-exact window sums (Σ v·t and Σ v, the q63 pattern) so it is
  * accumulation-order-insensitive and hash-matches the oracle.
  */
object AggPnlQueries {

  private val T0 = 1704067200L // rebase epoch (2024-01-01), q63 pattern
  // unix seconds of date_trunc('hour', Conf.ForTests.asOf) − T0
  private val N0 = 1706616000L - T0

  val qs: Seq[Q] = Seq(
    Q("q68_agg_pnl",
      (s, d) => {
        val ev = t(s, d, "events")

        // Hourly snapshot frame (cleaned_pnl analog): one conditional
        // aggregate per flow kind (purchase=deposit flow, click=taker
        // volume, view=maker volume).
        val base = ev
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("timestamp"))
          .agg(
            decSum(col("value")).as("value_delta"),
            decSum(when(col("event_type") === "purchase", col("value"))
              .otherwise(0.0)).as("deposit_amount"),
            decSum(when(col("event_type") === "click", col("value"))
              .otherwise(0.0)).as("taker_volume_raw"),
            decSum(when(col("event_type") === "view", col("value"))
              .otherwise(0.0)).as("maker_volume_raw"))
          .withColumn("t", unix_timestamp(col("timestamp")) - lit(T0))

        // Shared window specs — one (user_id, t) partitioning serves all
        // trailing/cumulative/exclusive frames; the planner emits a
        // single exchange + sort for the whole family.
        def trail(sec: Long): WindowSpec = Window.partitionBy("user_id")
          .orderBy(col("t")).rangeBetween(-sec, 0)
        def excl(sec: Long): WindowSpec = Window.partitionBy("user_id")
          .orderBy(col("t")).rangeBetween(-sec + 3600L, 0)
        val w24 = trail(86400L); val w7d = trail(604800L)
        val w30 = trail(2592000L)
        val wAll = Window.partitionBy("user_id").orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val w24x = excl(86400L); val w7dx = excl(604800L)
        val w30x = excl(2592000L)
        def rankW(order: Column*): WindowSpec =
          Window.partitionBy("timestamp").orderBy(order: _*)
        def wsum(c: Column, w: WindowSpec): Column =
          sum(c.cast(DEC)).over(w).cast("string").cast("double")

        // Stage 1: cumulative series + anchors + Dietz decomposition.
        val f1 = base
          .withColumn("equity", wsum(col("value_delta"), wAll))
          .withColumn("deposit_cumsum", wsum(col("deposit_amount"), wAll))
          .withColumn("cumulative_pnl", col("equity") - col("deposit_cumsum"))
          .withColumn("cum_lag_24h", first(col("cumulative_pnl")).over(w24))
          .withColumn("cum_lag_7d", first(col("cumulative_pnl")).over(w7d))
          .withColumn("cum_lag_30d", first(col("cumulative_pnl")).over(w30))
          .withColumn("cum_lag_alltime", first(col("cumulative_pnl")).over(wAll))
          .withColumn("equity_lag_24h", first(col("equity")).over(w24))
          .withColumn("equity_lag_7d", first(col("equity")).over(w7d))
          .withColumn("equity_lag_30d", first(col("equity")).over(w30))
          .withColumn("s0_24", wsum(col("deposit_amount"), w24x))
          .withColumn("s1_24", wsum(col("deposit_amount") * col("t"), w24x))
          .withColumn("s0_7", wsum(col("deposit_amount"), w7dx))
          .withColumn("s1_7", wsum(col("deposit_amount") * col("t"), w7dx))
          .withColumn("s0_30", wsum(col("deposit_amount"), w30x))
          .withColumn("s1_30", wsum(col("deposit_amount") * col("t"), w30x))
          .withColumn("dw_24h", (lit(N0) * col("s0_24") - col("s1_24")) / 86400.0)
          .withColumn("dw_7d", (lit(N0) * col("s0_7") - col("s1_7")) / 604800.0)
          .withColumn("dw_30d", (lit(N0) * col("s0_30") - col("s1_30")) / 2592000.0)
          .withColumn("pnl_24h", col("cumulative_pnl") - col("cum_lag_24h"))
          .withColumn("pnl_7d", col("cumulative_pnl") - col("cum_lag_7d"))
          .withColumn("pnl_30d", col("cumulative_pnl") - col("cum_lag_30d"))
          .withColumn("pnl_alltime", col("cumulative_pnl") - col("cum_lag_alltime"))
          .withColumn("roi_24h", when(col("pnl_24h") === 0.0, lit(0.0)).otherwise(
            col("pnl_24h") / (lit(100.0) + col("equity_lag_24h") + col("dw_24h"))))
          .withColumn("roi_7d", when(col("pnl_7d") === 0.0, lit(0.0)).otherwise(
            col("pnl_7d") / (lit(100.0) + col("equity_lag_7d") + col("dw_7d"))))
          .withColumn("roi_30d", when(col("pnl_30d") === 0.0, lit(0.0)).otherwise(
            col("pnl_30d") / (lit(100.0) + col("equity_lag_30d") + col("dw_30d"))))

        // Stage 2: 7 tie-broken leaderboard ranks (one timestamp
        // exchange) + rank-change vs the trailing user windows.
        val f2 = f1
          .withColumn("pnl_24h_rank", rank().over(
            rankW(col("pnl_24h").desc, col("roi_24h").desc, col("user_id"))))
          .withColumn("pnl_7d_rank", rank().over(
            rankW(col("pnl_7d").desc, col("roi_7d").desc, col("user_id"))))
          .withColumn("pnl_30d_rank", rank().over(
            rankW(col("pnl_30d").desc, col("roi_30d").desc, col("user_id"))))
          .withColumn("pnl_alltime_rank", rank().over(
            rankW(col("pnl_alltime").desc, col("user_id"))))
          .withColumn("roi_24h_rank", rank().over(
            rankW(col("roi_24h").desc, col("pnl_24h").desc, col("user_id"))))
          .withColumn("roi_7d_rank", rank().over(
            rankW(col("roi_7d").desc, col("pnl_7d").desc, col("user_id"))))
          .withColumn("roi_30d_rank", rank().over(
            rankW(col("roi_30d").desc, col("pnl_30d").desc, col("user_id"))))
          .withColumn("pnl_24h_rank_change",
            -(col("pnl_24h_rank") - first(col("pnl_24h_rank")).over(w24)))
          .withColumn("pnl_7d_rank_change",
            -(col("pnl_7d_rank") - first(col("pnl_7d_rank")).over(w7d)))
          .withColumn("pnl_30d_rank_change",
            -(col("pnl_30d_rank") - first(col("pnl_30d_rank")).over(w30)))
          .withColumn("pnl_alltime_rank_change",
            -(col("pnl_alltime_rank") - first(col("pnl_alltime_rank")).over(wAll)))
          .withColumn("roi_24h_rank_change",
            -(col("roi_24h_rank") - first(col("roi_24h_rank")).over(w24)))
          .withColumn("roi_7d_rank_change",
            -(col("roi_7d_rank") - first(col("roi_7d_rank")).over(w7d)))
          .withColumn("roi_30d_rank_change",
            -(col("roi_30d_rank") - first(col("roi_30d_rank")).over(w30)))

        // Stage 3: prior-hour trades (offset equi join, J5), nft
        // multiplier and campaign score joins. All three frames derive
        // from the events FACT (per user-hour granularity), so they are
        // deliberately NOT broadcast-hinted: at 100× the driver would
        // have to collect and ship the whole per-user-hour frame (OOM).
        // AQE picks broadcast when the built side is actually small and
        // a shuffle join when it is not; the shuffle case lands on the
        // same (user_id, timestamp) keys the window stages already
        // partitioned by.
        val trades = base.select(col("user_id").as("b_user"),
          col("timestamp").as("b_ts"),
          col("taker_volume_raw").as("tv_prev"),
          col("maker_volume_raw").as("mv_prev"))
        val nft = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("timestamp"))
          .agg(count(lit(1)).as("nft_burns"))
          .select(col("user_id"), col("timestamp"),
            (lit(1.0) + least(col("nft_burns"), lit(5L)).cast("double") * lit(0.1))
              .as("nft_multiplier"))
        val campaign = ev.filter(col("event_type") === "error")
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("timestamp"))
          .agg(decSum(col("value")).as("campaign_z_raw"))

        val f3 = f2
          .join(trades,
            col("user_id") === col("b_user") &&
              col("timestamp") === col("b_ts") + expr("interval 1 hour"),
            "left")
          .drop("b_user", "b_ts")
          .join(nft, Seq("timestamp", "user_id"), "left")
          .join(campaign, Seq("timestamp", "user_id"), "left")
          .withColumn("taker_volume", coalesce(col("tv_prev"), lit(0.0)))
          .withColumn("maker_volume", coalesce(col("mv_prev"), lit(0.0)))
          .withColumn("z_multiplier_nft", coalesce(col("nft_multiplier"), lit(1.0)))
          .withColumn("campaign_z_score", coalesce(col("campaign_z_raw"), lit(0.0)))
          .withColumn("z_multiplier", when(col("pnl_24h_rank") <= 100,
            lit(2.0) - (col("pnl_24h_rank") - 1) * lit(0.01)).otherwise(lit(1.0)))
          .withColumn("z_score",
            (col("z_multiplier") * col("z_multiplier_nft")) *
              (lit(1.0) * col("taker_volume") + lit(0.2) * col("maker_volume")) +
              col("campaign_z_score"))

        // Stage 4: windowed volumes / multipliers / z-scores (back on
        // the shared user partitioning) then the 4 z-score ranks +
        // changes.
        val f4 = f3
          .withColumn("maker_volume_24h", wsum(col("maker_volume"), w24))
          .withColumn("maker_volume_7d", wsum(col("maker_volume"), w7d))
          .withColumn("maker_volume_30d", wsum(col("maker_volume"), w30))
          .withColumn("maker_volume_alltime", wsum(col("maker_volume"), wAll))
          .withColumn("taker_volume_24h", wsum(col("taker_volume"), w24))
          .withColumn("taker_volume_7d", wsum(col("taker_volume"), w7d))
          .withColumn("taker_volume_30d", wsum(col("taker_volume"), w30))
          .withColumn("taker_volume_alltime", wsum(col("taker_volume"), wAll))
          .withColumn("z_multiplier_24h", col("z_multiplier"))
          .withColumn("z_multiplier_7d",
            wsum(col("z_multiplier"), w7d) / count(lit(1)).over(w7d))
          .withColumn("z_multiplier_30d",
            wsum(col("z_multiplier"), w30) / count(lit(1)).over(w30))
          .withColumn("z_multiplier_alltime",
            wsum(col("z_multiplier"), wAll) / count(lit(1)).over(wAll))
          .withColumn("z_score_24h", wsum(col("z_score"), w24))
          .withColumn("z_score_7d", wsum(col("z_score"), w7d))
          .withColumn("z_score_30d", wsum(col("z_score"), w30))
          .withColumn("z_score_alltime", wsum(col("z_score"), wAll))

        val f5 = f4
          .withColumn("z_score_24h_rank", rank().over(
            rankW(col("z_score_24h").desc, col("pnl_24h").desc, col("user_id"))))
          .withColumn("z_score_7d_rank", rank().over(
            rankW(col("z_score_7d").desc, col("pnl_7d").desc, col("user_id"))))
          .withColumn("z_score_30d_rank", rank().over(
            rankW(col("z_score_30d").desc, col("pnl_30d").desc, col("user_id"))))
          .withColumn("z_score_alltime_rank", rank().over(
            rankW(col("z_score_alltime").desc, col("pnl_alltime").desc,
              col("user_id"))))
          .withColumn("z_score_24h_rank_change",
            -(col("z_score_24h_rank") - first(col("z_score_24h_rank")).over(w24)))
          .withColumn("z_score_7d_rank_change",
            -(col("z_score_7d_rank") - first(col("z_score_7d_rank")).over(w7d)))
          .withColumn("z_score_30d_rank_change",
            -(col("z_score_30d_rank") - first(col("z_score_30d_rank")).over(w30)))
          .withColumn("z_score_alltime_rank_change",
            -(col("z_score_alltime_rank")
              - first(col("z_score_alltime_rank")).over(wAll)))
          .withColumn("fee_tier",
            when(col("taker_volume_30d") >= 1200.0, 0)
              .when(col("taker_volume_30d") >= 900.0, 1)
              .when(col("taker_volume_30d") >= 600.0, 2)
              .when(col("taker_volume_30d") >= 300.0, 3)
              .otherwise(4))
          .withColumn("date_", date_trunc("day", col("timestamp")))

        f5.select(
          col("timestamp"), col("user_id"),
          col("equity"), col("cumulative_pnl"), col("deposit_cumsum"),
          col("pnl_24h"), col("pnl_7d"), col("pnl_30d"), col("pnl_alltime"),
          col("roi_24h"), col("roi_7d"), col("roi_30d"),
          col("pnl_24h_rank"), col("pnl_7d_rank"), col("pnl_30d_rank"),
          col("pnl_alltime_rank"),
          col("roi_24h_rank"), col("roi_7d_rank"), col("roi_30d_rank"),
          col("pnl_24h_rank_change"), col("pnl_7d_rank_change"),
          col("pnl_30d_rank_change"), col("pnl_alltime_rank_change"),
          col("roi_24h_rank_change"), col("roi_7d_rank_change"),
          col("roi_30d_rank_change"),
          col("maker_volume_24h"), col("maker_volume_7d"),
          col("maker_volume_30d"), col("maker_volume_alltime"),
          col("taker_volume_24h"), col("taker_volume_7d"),
          col("taker_volume_30d"), col("taker_volume_alltime"),
          col("z_multiplier_24h"), col("z_multiplier_7d"),
          col("z_multiplier_30d"), col("z_multiplier_alltime"),
          col("z_multiplier_nft"), col("z_score"),
          col("z_score_24h"), col("z_score_7d"), col("z_score_30d"),
          col("z_score_alltime"),
          col("z_score_24h_rank"), col("z_score_7d_rank"),
          col("z_score_30d_rank"), col("z_score_alltime_rank"),
          col("z_score_24h_rank_change"), col("z_score_7d_rank_change"),
          col("z_score_30d_rank_change"), col("z_score_alltime_rank_change"),
          col("fee_tier"), col("date_"))
          .orderBy("timestamp", "user_id")
      },
      Some("""
        WITH base AS (
          SELECT user_id,
            CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS timestamp,
            CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS value_delta,
            CAST(CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS deposit_amount,
            CAST(CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value ELSE 0.0 END AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS taker_volume_raw,
            CAST(CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS maker_volume_raw
          FROM events GROUP BY 1, 2),
        base2 AS (
          SELECT *, CAST(FLOOR(EPOCH(timestamp)) AS BIGINT) - 1704067200 AS t
          FROM base),
        c1 AS (
          SELECT *,
            CAST(CAST(SUM(CAST(value_delta AS DECIMAL(28,6))) OVER wall AS VARCHAR) AS DOUBLE) AS equity,
            CAST(CAST(SUM(CAST(deposit_amount AS DECIMAL(28,6))) OVER wall AS VARCHAR) AS DOUBLE) AS deposit_cumsum
          FROM base2
          WINDOW wall AS (PARTITION BY user_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        c2 AS (SELECT *, equity - deposit_cumsum AS cumulative_pnl FROM c1),
        c3 AS (
          SELECT *,
            FIRST_VALUE(cumulative_pnl) OVER w24 AS cum_lag_24h,
            FIRST_VALUE(cumulative_pnl) OVER w7d AS cum_lag_7d,
            FIRST_VALUE(cumulative_pnl) OVER w30 AS cum_lag_30d,
            FIRST_VALUE(cumulative_pnl) OVER wall AS cum_lag_alltime,
            FIRST_VALUE(equity) OVER w24 AS equity_lag_24h,
            FIRST_VALUE(equity) OVER w7d AS equity_lag_7d,
            FIRST_VALUE(equity) OVER w30 AS equity_lag_30d,
            CAST(CAST(SUM(CAST(deposit_amount AS DECIMAL(28,6))) OVER w24x AS VARCHAR) AS DOUBLE) AS s0_24,
            CAST(CAST(SUM(CAST(deposit_amount * t AS DECIMAL(28,6))) OVER w24x AS VARCHAR) AS DOUBLE) AS s1_24,
            CAST(CAST(SUM(CAST(deposit_amount AS DECIMAL(28,6))) OVER w7dx AS VARCHAR) AS DOUBLE) AS s0_7,
            CAST(CAST(SUM(CAST(deposit_amount * t AS DECIMAL(28,6))) OVER w7dx AS VARCHAR) AS DOUBLE) AS s1_7,
            CAST(CAST(SUM(CAST(deposit_amount AS DECIMAL(28,6))) OVER w30x AS VARCHAR) AS DOUBLE) AS s0_30,
            CAST(CAST(SUM(CAST(deposit_amount * t AS DECIMAL(28,6))) OVER w30x AS VARCHAR) AS DOUBLE) AS s1_30
          FROM c2
          WINDOW
            w24 AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW),
            w7d AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW),
            w30 AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW),
            wall AS (PARTITION BY user_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            w24x AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW),
            w7dx AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 601200 PRECEDING AND CURRENT ROW),
            w30x AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 2588400 PRECEDING AND CURRENT ROW)),
        c4 AS (
          SELECT *,
            cumulative_pnl - cum_lag_24h AS pnl_24h,
            cumulative_pnl - cum_lag_7d AS pnl_7d,
            cumulative_pnl - cum_lag_30d AS pnl_30d,
            cumulative_pnl - cum_lag_alltime AS pnl_alltime,
            (2548800 * s0_24 - s1_24) / 86400.0 AS dw_24h,
            (2548800 * s0_7 - s1_7) / 604800.0 AS dw_7d,
            (2548800 * s0_30 - s1_30) / 2592000.0 AS dw_30d
          FROM c3),
        c5 AS (
          SELECT *,
            CASE WHEN pnl_24h = 0.0 THEN 0.0 ELSE pnl_24h / (100.0 + equity_lag_24h + dw_24h) END AS roi_24h,
            CASE WHEN pnl_7d = 0.0 THEN 0.0 ELSE pnl_7d / (100.0 + equity_lag_7d + dw_7d) END AS roi_7d,
            CASE WHEN pnl_30d = 0.0 THEN 0.0 ELSE pnl_30d / (100.0 + equity_lag_30d + dw_30d) END AS roi_30d
          FROM c4),
        c6 AS (
          SELECT *,
            CAST(RANK() OVER (PARTITION BY timestamp ORDER BY pnl_24h DESC, roi_24h DESC, user_id) AS INTEGER) AS pnl_24h_rank,
            CAST(RANK() OVER (PARTITION BY timestamp ORDER BY pnl_7d DESC, roi_7d DESC, user_id) AS INTEGER) AS pnl_7d_rank,
            CAST(RANK() OVER (PARTITION BY timestamp ORDER BY pnl_30d DESC, roi_30d DESC, user_id) AS INTEGER) AS pnl_30d_rank,
            CAST(RANK() OVER (PARTITION BY timestamp ORDER BY pnl_alltime DESC, user_id) AS INTEGER) AS pnl_alltime_rank,
            CAST(RANK() OVER (PARTITION BY timestamp ORDER BY roi_24h DESC, pnl_24h DESC, user_id) AS INTEGER) AS roi_24h_rank,
            CAST(RANK() OVER (PARTITION BY timestamp ORDER BY roi_7d DESC, pnl_7d DESC, user_id) AS INTEGER) AS roi_7d_rank,
            CAST(RANK() OVER (PARTITION BY timestamp ORDER BY roi_30d DESC, pnl_30d DESC, user_id) AS INTEGER) AS roi_30d_rank
          FROM c5),
        c7 AS (
          SELECT *,
            CAST(-(pnl_24h_rank - FIRST_VALUE(pnl_24h_rank) OVER w24) AS INTEGER) AS pnl_24h_rank_change,
            CAST(-(pnl_7d_rank - FIRST_VALUE(pnl_7d_rank) OVER w7d) AS INTEGER) AS pnl_7d_rank_change,
            CAST(-(pnl_30d_rank - FIRST_VALUE(pnl_30d_rank) OVER w30) AS INTEGER) AS pnl_30d_rank_change,
            CAST(-(pnl_alltime_rank - FIRST_VALUE(pnl_alltime_rank) OVER wall) AS INTEGER) AS pnl_alltime_rank_change,
            CAST(-(roi_24h_rank - FIRST_VALUE(roi_24h_rank) OVER w24) AS INTEGER) AS roi_24h_rank_change,
            CAST(-(roi_7d_rank - FIRST_VALUE(roi_7d_rank) OVER w7d) AS INTEGER) AS roi_7d_rank_change,
            CAST(-(roi_30d_rank - FIRST_VALUE(roi_30d_rank) OVER w30) AS INTEGER) AS roi_30d_rank_change
          FROM c6
          WINDOW
            w24 AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW),
            w7d AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW),
            w30 AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW),
            wall AS (PARTITION BY user_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        tr AS (
          SELECT user_id AS b_user, timestamp AS b_ts,
            taker_volume_raw AS tv_prev, maker_volume_raw AS mv_prev
          FROM base),
        nft AS (
          SELECT user_id,
            CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS timestamp,
            -- ::DOUBLE literals: DuckDB numeric literals are DECIMAL and
            -- would compute this chain exactly, diverging from Spark's
            -- binary64 arithmetic in the last ulp
            1.0::DOUBLE + LEAST(COUNT(*), 5) * 0.1::DOUBLE AS nft_multiplier
          FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
        cmp AS (
          SELECT user_id,
            CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS timestamp,
            CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS campaign_z_raw
          FROM events WHERE event_type = 'error' GROUP BY 1, 2),
        c8 AS (
          SELECT c7.*,
            COALESCE(tr.tv_prev, 0.0) AS taker_volume,
            COALESCE(tr.mv_prev, 0.0) AS maker_volume,
            COALESCE(nft.nft_multiplier, 1.0) AS z_multiplier_nft,
            COALESCE(cmp.campaign_z_raw, 0.0) AS campaign_z_score
          FROM c7
          LEFT JOIN tr ON c7.user_id = tr.b_user AND c7.timestamp = tr.b_ts + INTERVAL 1 HOUR
          LEFT JOIN nft ON c7.timestamp = nft.timestamp AND c7.user_id = nft.user_id
          LEFT JOIN cmp ON c7.timestamp = cmp.timestamp AND c7.user_id = cmp.user_id),
        c9 AS (
          SELECT *,
            CASE WHEN pnl_24h_rank <= 100
              THEN 2.0::DOUBLE - (pnl_24h_rank - 1) * 0.01::DOUBLE
              ELSE 1.0::DOUBLE END AS z_multiplier
          FROM c8),
        c10 AS (
          SELECT *,
            (z_multiplier * z_multiplier_nft)
              * (1.0::DOUBLE * taker_volume + 0.2::DOUBLE * maker_volume)
              + campaign_z_score AS z_score
          FROM c9),
        c11 AS (
          SELECT *,
            CAST(CAST(SUM(CAST(maker_volume AS DECIMAL(28,6))) OVER w24 AS VARCHAR) AS DOUBLE) AS maker_volume_24h,
            CAST(CAST(SUM(CAST(maker_volume AS DECIMAL(28,6))) OVER w7d AS VARCHAR) AS DOUBLE) AS maker_volume_7d,
            CAST(CAST(SUM(CAST(maker_volume AS DECIMAL(28,6))) OVER w30 AS VARCHAR) AS DOUBLE) AS maker_volume_30d,
            CAST(CAST(SUM(CAST(maker_volume AS DECIMAL(28,6))) OVER wall AS VARCHAR) AS DOUBLE) AS maker_volume_alltime,
            CAST(CAST(SUM(CAST(taker_volume AS DECIMAL(28,6))) OVER w24 AS VARCHAR) AS DOUBLE) AS taker_volume_24h,
            CAST(CAST(SUM(CAST(taker_volume AS DECIMAL(28,6))) OVER w7d AS VARCHAR) AS DOUBLE) AS taker_volume_7d,
            CAST(CAST(SUM(CAST(taker_volume AS DECIMAL(28,6))) OVER w30 AS VARCHAR) AS DOUBLE) AS taker_volume_30d,
            CAST(CAST(SUM(CAST(taker_volume AS DECIMAL(28,6))) OVER wall AS VARCHAR) AS DOUBLE) AS taker_volume_alltime,
            z_multiplier AS z_multiplier_24h,
            CAST(CAST(SUM(CAST(z_multiplier AS DECIMAL(28,6))) OVER w7d AS VARCHAR) AS DOUBLE) / (COUNT(*) OVER w7d) AS z_multiplier_7d,
            CAST(CAST(SUM(CAST(z_multiplier AS DECIMAL(28,6))) OVER w30 AS VARCHAR) AS DOUBLE) / (COUNT(*) OVER w30) AS z_multiplier_30d,
            CAST(CAST(SUM(CAST(z_multiplier AS DECIMAL(28,6))) OVER wall AS VARCHAR) AS DOUBLE) / (COUNT(*) OVER wall) AS z_multiplier_alltime,
            CAST(CAST(SUM(CAST(z_score AS DECIMAL(28,6))) OVER w24 AS VARCHAR) AS DOUBLE) AS z_score_24h,
            CAST(CAST(SUM(CAST(z_score AS DECIMAL(28,6))) OVER w7d AS VARCHAR) AS DOUBLE) AS z_score_7d,
            CAST(CAST(SUM(CAST(z_score AS DECIMAL(28,6))) OVER w30 AS VARCHAR) AS DOUBLE) AS z_score_30d,
            CAST(CAST(SUM(CAST(z_score AS DECIMAL(28,6))) OVER wall AS VARCHAR) AS DOUBLE) AS z_score_alltime
          FROM c10
          WINDOW
            w24 AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW),
            w7d AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW),
            w30 AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW),
            wall AS (PARTITION BY user_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        c12 AS (
          SELECT *,
            CAST(RANK() OVER (PARTITION BY timestamp ORDER BY z_score_24h DESC, pnl_24h DESC, user_id) AS INTEGER) AS z_score_24h_rank,
            CAST(RANK() OVER (PARTITION BY timestamp ORDER BY z_score_7d DESC, pnl_7d DESC, user_id) AS INTEGER) AS z_score_7d_rank,
            CAST(RANK() OVER (PARTITION BY timestamp ORDER BY z_score_30d DESC, pnl_30d DESC, user_id) AS INTEGER) AS z_score_30d_rank,
            CAST(RANK() OVER (PARTITION BY timestamp ORDER BY z_score_alltime DESC, pnl_alltime DESC, user_id) AS INTEGER) AS z_score_alltime_rank
          FROM c11),
        c13 AS (
          SELECT *,
            CAST(-(z_score_24h_rank - FIRST_VALUE(z_score_24h_rank) OVER w24) AS INTEGER) AS z_score_24h_rank_change,
            CAST(-(z_score_7d_rank - FIRST_VALUE(z_score_7d_rank) OVER w7d) AS INTEGER) AS z_score_7d_rank_change,
            CAST(-(z_score_30d_rank - FIRST_VALUE(z_score_30d_rank) OVER w30) AS INTEGER) AS z_score_30d_rank_change,
            CAST(-(z_score_alltime_rank - FIRST_VALUE(z_score_alltime_rank) OVER wall) AS INTEGER) AS z_score_alltime_rank_change,
            CASE WHEN taker_volume_30d >= 1200.0 THEN 0
                 WHEN taker_volume_30d >= 900.0 THEN 1
                 WHEN taker_volume_30d >= 600.0 THEN 2
                 WHEN taker_volume_30d >= 300.0 THEN 3
                 ELSE 4 END AS fee_tier,
            CAST(DATE_TRUNC('day', timestamp) AS TIMESTAMP) AS date_
          FROM c12
          WINDOW
            w24 AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW),
            w7d AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW),
            w30 AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW),
            wall AS (PARTITION BY user_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT timestamp, user_id,
          equity, cumulative_pnl, deposit_cumsum,
          pnl_24h, pnl_7d, pnl_30d, pnl_alltime,
          roi_24h, roi_7d, roi_30d,
          pnl_24h_rank, pnl_7d_rank, pnl_30d_rank, pnl_alltime_rank,
          roi_24h_rank, roi_7d_rank, roi_30d_rank,
          pnl_24h_rank_change, pnl_7d_rank_change, pnl_30d_rank_change,
          pnl_alltime_rank_change,
          roi_24h_rank_change, roi_7d_rank_change, roi_30d_rank_change,
          maker_volume_24h, maker_volume_7d, maker_volume_30d, maker_volume_alltime,
          taker_volume_24h, taker_volume_7d, taker_volume_30d, taker_volume_alltime,
          z_multiplier_24h, z_multiplier_7d, z_multiplier_30d, z_multiplier_alltime,
          z_multiplier_nft, z_score,
          z_score_24h, z_score_7d, z_score_30d, z_score_alltime,
          z_score_24h_rank, z_score_7d_rank, z_score_30d_rank, z_score_alltime_rank,
          z_score_24h_rank_change, z_score_7d_rank_change, z_score_30d_rank_change,
          z_score_alltime_rank_change,
          fee_tier, date_
        FROM c13 ORDER BY timestamp, user_id"""))
  )
}
