package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines._

/** Machine check of the README "reference table parity crosswalk": every
  * reference `@dlt.table`/`@dlt.view`/apply-changes target/SQL view maps
  * to a concrete name (TableDef or source) that actually exists in the
  * built pipeline registries — or to a named intentional skip. The
  * mapping data here mirrors the README appendix row-for-row; a table
  * renamed or dropped in a refactor fails this spec, not a reader's
  * spot-check.
  */
class CrosswalkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Registration only — transforms are never resolved, so every source
    * can be an empty frame: TableDef names are what is under test. */
  private def e: () => DataFrame = () => spark.emptyDataFrame

  private lazy val registries = Seq(
    TransactionsPipeline.build(spark, e),
    CleaningPipelines.prices(spark, e),
    CleaningPipelines.monitoring(spark, e),
    CleaningPipelines.competitor(spark, e, e),
    AmplitudePipeline.build(spark, e),
    OrderbookPipeline.build(spark, e),
    RewardsPipeline.build(spark, e),
    MadwarsFlexReferralsPipelines.madwars(spark, e, e),
    MadwarsFlexReferralsPipelines.flex(spark, Map(
      "raw_tvl" -> e, "raw_auction" -> e, "raw_combo_option" -> e,
      "raw_option" -> e, "raw_settlement_account" -> e,
      "raw_underlying" -> e)),
    MadwarsFlexReferralsPipelines.referrals(spark, e, e),
    MMUptimePipeline.build(spark, e))

  private lazy val tableNames: Set[String] =
    registries.flatMap(_.tableNames).toSet
  private lazy val sourceNames: Set[String] =
    registries.flatMap(_.sourceNames).toSet

  /** reference name → (disposition, repo name). Dispositions:
    * T = TableDef, S = Registry source, M = merged into TableDef,
    * MS = merged into source. The v2 [DEPRECATED] six are the skip set. */
  private val mapped: Seq[(String, String, String)] = Seq(
    // transactions-helius
    ("raw_markets", "S", "markets"),
    ("raw_compressed_nft_burn_events", "S", "raw_compressed_nft_burn_events"),
    ("dim_zpass_nfts", "S", "dim_zpass_nfts"),
    ("cleaned_compressed_nft_burn_events", "T", "cleaned_compressed_nft_burn_events"),
    ("agg_compressed_nft_burn_events_hourly", "T", "agg_compressed_nft_burn_events_hourly"),
    ("raw_transactions", "S", "raw_transactions"),
    ("zetagroup_mapping_v", "S", "zetagroup_mapping"),
    ("cleaned_transactions", "T", "cleaned_transactions"),
    ("cleaned_ix_deposit", "T", "cleaned_ix_deposit"),
    ("cleaned_ix_withdraw", "T", "cleaned_ix_withdraw"),
    ("cleaned_ix_place_order", "T", "cleaned_ix_place_order"),
    ("cleaned_ix_order_complete", "T", "cleaned_ix_order_complete"),
    ("cleaned_ix_liquidate", "T", "cleaned_ix_liquidate"),
    ("cleaned_ix_trade", "T", "cleaned_ix_trade"),
    ("cleaned_ix_funding", "T", "cleaned_ix_funding"),
    ("agg_ix_trade_asset_1h", "T", "agg_ix_trade_asset_1h"),
    ("agg_ix_trade_1h", "T", "agg_ix_trade_1h"),
    ("agg_ix_trade_asset_24h_rolling", "T", "agg_ix_trade_asset_24h_rolling"),
    ("agg_ix_deposit_user_1h", "T", "agg_ix_deposit_user_1h"),
    ("agg_ix_withdraw_user_1h", "T", "agg_ix_withdraw_user_1h"),
    ("agg_funding_rate_user_asset_1h", "T", "agg_funding_rate_user_asset_1h"),
    ("raw_pnl", "S", "raw_pnl"),
    ("cleaned_pnl", "T", "cleaned_pnl"),
    ("agg_pnl", "T", "agg_pnl"),
    ("fee_tiers", "T", "fee_tiers"),
    // competitor stats
    ("raw_competitor_data", "S", "raw_competitor_data"),
    ("cleaned_competitor_data", "T", "cleaned_competitor_data"),
    // madwars
    ("teams", "T", "teams"),
    ("volume", "T", "volume"),
    ("pnl_individual", "T", "pnl_individual"),
    ("pnl_team", "T", "pnl_team"),
    // rewards v2
    ("cleaned_trades_rewards", "T", "cleaned_trades_rewards"),
    ("agg_trades_rewards_epoch_user_asset_v", "T", "agg_trades_epoch_user_asset"),
    ("agg_maker_rewards_epoch_user_asset", "M", "agg_rewards_epoch_user_asset"),
    ("agg_taker_rewards_epoch_user_asset", "M", "agg_rewards_epoch_user_asset"),
    ("agg_maker_rewards_epoch_user", "M", "agg_rewards_epoch_user"),
    ("agg_taker_rewards_epoch_user", "M", "agg_rewards_epoch_user"),
    ("agg_trades_rewards_epoch_referee_referrer_v", "T", "agg_trades_rewards_epoch_referee_referrer"),
    ("agg_referrer_rewards_epoch_user", "T", "agg_referrer_rewards_epoch_user"),
    ("agg_referee_rewards_epoch_user", "T", "agg_referee_rewards_epoch_user"),
    // amplitude
    ("raw_amplitude_events", "S", "raw_amplitude_events"),
    ("cleaned_amplitude_wallet_connects", "T", "cleaned_wallet_connects"),
    ("cleaned_amplitude_events", "T", "cleaned_amplitude_events"),
    // platform monitoring
    ("raw_monitoring_orders", "T", "raw_monitoring_orders"),
    ("raw_monitoring_stats", "T", "raw_monitoring_stats"),
    ("raw_exchange_liquidity", "S", "raw_exchange_liquidity"),
    ("cleaned_exchange_liquidity", "T", "cleaned_exchange_liquidity"),
    // prices
    ("raw_coingecko_prices", "MS", "cleaned_coingecko_prices"),
    ("cleaned_coingecko_prices", "S", "cleaned_coingecko_prices"),
    ("raw_prices", "S", "raw_prices"),
    ("cleaned_prices", "T", "cleaned_prices"),
    ("raw_vault_balances", "T", "raw_vault_balances"),
    ("cleaned_vault_balances", "T", "cleaned_vault_balances"),
    // orderbook
    ("raw_orderbook_snapshot", "S", "raw_orderbook_snapshot"),
    ("cleaned_orderbook_bids", "M", "cleaned_orderbook_all"),
    ("cleaned_orderbook_asks", "M", "cleaned_orderbook_all"),
    ("cleaned_orderbook_all", "T", "cleaned_orderbook_all"),
    ("agg_orderbook_all", "T", "agg_orderbook_all"),
    ("mm_market_params", "T", "mm_market_params"),
    ("cleaned_mm_orderbook", "T", "cleaned_mm_quotes"),
    ("cleaned_mm_scores", "T", "agg_mm_scores"),
    ("agg_mm_maker_volume_1h", "T", "agg_mm_maker_volume_1h"),
    ("agg_mm_scores_1h", "T", "agg_mm_scores_1h"),
    // referrals
    ("raw_referrers", "S", "raw_referrers"),
    ("raw_referrals", "S", "raw_referrals"),
    ("raw_referrals_v", "T", "raw_referrals_v"),
    ("cleaned_referrals", "T", "cleaned_referrals"),
    // zetaflex
    ("raw_tvl", "S", "raw_tvl"),
    ("raw_auction", "S", "raw_auction"),
    ("raw_combo_option", "S", "raw_combo_option"),
    ("raw_option", "S", "raw_option"),
    ("raw_settlement_account", "S", "raw_settlement_account"),
    ("raw_underlying", "S", "raw_underlying"),
    ("cleaned_tvl", "T", "cleaned_tvl"),
    ("cleaned_auction", "T", "cleaned_auction"),
    ("cleaned_combo_option", "T", "cleaned_combo_option"),
    ("cleaned_option", "T", "cleaned_option"),
    ("cleaned_settlement_account", "T", "cleaned_settlement_account"),
    ("cleaned_underlying", "T", "cleaned_underlying"),
    // mm-uptime v3 SQL views
    ("v3.orders", "M", "quote_state"),
    ("v3.agg_orders", "M", "quote_state"),
    ("v3.quotes", "M", "quote_intervals"),
    ("v3.uptime", "T", "uptime_hourly"))

  /** The ONLY intentional skips: the notebook the reference itself marks
    * [DEPRECATED]; its semantics are covered by the v3 rebuild + q182. */
  private val skipped = Seq("v2.orders", "v2.quotes", "v2.intervals",
    "v2.intervals_2", "v2.uptime", "v2.uptime_agg")

  test("every non-skipped reference table maps to an existing registry name") {
    val missing = mapped.filter { case (_, kind, repo) =>
      kind match {
        case "T" | "M" => !tableNames.contains(repo)
        case "S" | "MS" => !sourceNames.contains(repo)
      }
    }
    assert(missing.isEmpty,
      s"crosswalk rows whose repo name is gone: $missing")
  }

  test("the crosswalk accounts for the full reference inventory") {
    // 83 non-deprecated decorations + 6 deprecated = 89 (see README
    // appendix). The mapped list collapses the maker/taker and bid/ask
    // merges onto shared targets but keeps one ROW per reference table.
    assert(mapped.size + skipped.size === 89)
    assert(skipped.size === 6, "only the [DEPRECATED] v2 notebook is skipped")
  }
}
