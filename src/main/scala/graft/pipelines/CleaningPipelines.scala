package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.graph.{Mode, Registry, TableDef}
import graft.ops.Relational

/** The remaining light "clean-and-publish" notebook families, which are
  * recombinations of ops already in the engine:
  * prices (zetadex-prices-pipeline.py), platform monitoring
  * (zetadex-platform-monitoring-pipeline.py), competitor stats
  * (zetadex-competitor-stats-pipeline.py).
  */
object CleaningPipelines {

  /** Landing-zone schema of the vaults feed (zetadex-prices-pipeline.py:
    * 239–249 `vaults_schema`): balances + TVL per underlying, hive
    * year/month/day/hour partition strings from the landed layout. */
  val vaultsDdl: String =
    "timestamp timestamp, underlying string, vault_balance double, " +
      "insurance_vault_balance double, tvl double, slot long, " +
      "year string, month string, day string, hour string"

  private def emptyOf(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType.fromDDL(ddl))

  /** Prices: dedup per (underlying, minute), derive partition cols,
    * latest vault balances (PR:62–78, PR:275–285), the vaults
    * bronze/silver pair (PR:252–285), and — when a coingecko feed is
    * provided — the mark-price/OI join with notional derivation
    * (PR:142–184). Inputs: raw (timestamp, underlying, price, source
    * [, open_interest]); coingecko (timestamp, underlying, price_usd);
    * vaults (the [[vaultsDdl]] landing shape, e.g. via
    * [[graft.sources.JsonSource]]). */
  def prices(spark: SparkSession, raw: () => DataFrame,
             coingecko: Option[() => DataFrame] = None,
             vaults: Option[() => DataFrame] = None): Registry = {
    val sp = spark
    import sp.implicits._
    val reg = new Registry(spark)
    reg.source("raw_prices", raw)
    reg.source("cleaned_coingecko_prices", coingecko.getOrElse(
      () => Seq.empty[(java.sql.Timestamp, String, Double)]
        .toDF("timestamp", "underlying", "price_usd")))
    reg.register(TableDef("cleaned_prices", Seq("raw_prices"), { case Seq(r) =>
      Relational.dedupeExact(
          Seq("underlying", "minute_"), col("timestamp"))(
          r.filter(col("price").isNotNull && col("price") > 0)
            .withColumn("minute_", date_trunc("minute", col("timestamp"))))
        .withColumn("date_", to_date(col("timestamp")))
    }, mode = Mode.Incremental, partitionCols = Seq("date_")))
    // mark prices × USD reference prices on the hour, notional OI
    // (PR:142–184: left join on (underlying, hour), OI × price_usd)
    reg.register(TableDef("cleaned_prices_oi",
      Seq("raw_prices", "cleaned_coingecko_prices"), { case Seq(r, cg) =>
        val p = r.withColumn("timestamp", date_trunc("hour", col("timestamp")))
        val cgH = cg
          .withColumn("timestamp", date_trunc("hour", col("timestamp")))
          .select(col("underlying").as("cg_underlying"),
            col("timestamp").as("cg_ts"), col("price_usd"))
        // no broadcast hint: the hourly reference-price frame grows with
        // TIME (hours × assets — years of history is 100s of MB), so the
        // optimizer must be free to shuffle it; at small sizes its stats
        // pick broadcast on their own
        p.join(cgH,
            col("underlying") === col("cg_underlying") &&
              col("timestamp") === col("cg_ts"), "left")
          .withColumn("open_interest_notional",
            col("open_interest") * col("price_usd"))
          .select(col("timestamp"), col("underlying").as("asset"),
            col("open_interest"), col("price_usd"),
            col("open_interest_notional"))
          .withColumn("date_", to_date(col("timestamp")))
          .withColumn("hour_", date_format(col("timestamp"), "HH").cast("int"))
      }, mode = Mode.Incremental, partitionCols = Seq("date_")))
    reg.register(TableDef("latest_prices", Seq("cleaned_prices"), {
      case Seq(cp) =>
        Relational.applyChanges(Seq("underlying"), col("timestamp"))(cp)
          .select("underlying", "timestamp", "price")
    }, mode = Mode.Full))
    // Vaults bronze/silver (PR:252–285): the bronze table IS the schema'd
    // landing-zone ingest (cloudFiles JSON with the declared vaults_schema
    // and year/month/day/hour partition columns — our JsonSource seam);
    // silver drops the hive partition strings, keeping event time as the
    // ordering column (the reference z-orders on `timestamp`).
    reg.source("landed_vault_balances",
      vaults.getOrElse(() => emptyOf(spark, vaultsDdl)))
    reg.register(TableDef("raw_vault_balances", Seq("landed_vault_balances"),
      { case Seq(v) => v }, mode = Mode.Incremental))
    reg.register(TableDef("cleaned_vault_balances", Seq("raw_vault_balances"),
      { case Seq(v) => v.drop("year", "month", "day", "hour") },
      mode = Mode.Incremental))
    reg
  }

  /** Landing-zone schema of the order-placement monitor feed
    * (zetadex-platform-monitoring-pipeline.py:30–35
    * `monitoring_orders_schema`): success/failure of periodic
    * placeOrders probes. */
  val monitoringOrdersDdl: String =
    "underlying string, timestamp timestamp, priority_fee bigint, " +
      "error_message string"

  /** Landing-zone schema of the backend exchange-stats feed
    * (PM:60–66 `monitoring_stats_schema`). */
  val monitoringStatsDdl: String =
    "underlying string, timestamp timestamp, update_age_local int, " +
      "update_age_exchange int, mark_price double"

  /** Platform monitoring: the two bronze probe ingests (PM:37–58
    * `raw_monitoring_orders`, PM:60–85 `raw_monitoring_stats` — schema'd
    * landing-zone reads, no transform beyond the declared DDL) plus the
    * formatted liquidity metrics per (venue, asset) (PM:126–142:
    * format_string projections, partition by venue/asset). Inputs:
    * liquidity (timestamp, venue, asset, bid_liquidity, ask_liquidity);
    * orders/stats in their landing DDL shapes. */
  def monitoring(spark: SparkSession, raw: () => DataFrame,
                 orders: Option[() => DataFrame] = None,
                 stats: Option[() => DataFrame] = None): Registry = {
    val reg = new Registry(spark)
    reg.source("raw_exchange_liquidity", raw)
    reg.source("landed_monitoring_orders",
      orders.getOrElse(() => emptyOf(spark, monitoringOrdersDdl)))
    reg.source("landed_monitoring_stats",
      stats.getOrElse(() => emptyOf(spark, monitoringStatsDdl)))
    reg.register(TableDef("raw_monitoring_orders",
      Seq("landed_monitoring_orders"), { case Seq(o) => o },
      mode = Mode.Incremental))
    reg.register(TableDef("raw_monitoring_stats",
      Seq("landed_monitoring_stats"), { case Seq(st) => st },
      mode = Mode.Incremental))
    reg.register(TableDef("cleaned_exchange_liquidity",
      Seq("raw_exchange_liquidity"), { case Seq(r) =>
        r.withColumn("total_liquidity",
            col("bid_liquidity") + col("ask_liquidity"))
          .withColumn("liquidity_label",
            format_string("%s/%s: %.2f", col("venue"), col("asset"),
              col("total_liquidity")))
      }, mode = Mode.Incremental, partitionCols = Seq("venue", "asset")))
    reg
  }

  /** Competitor stats: SQL-extract + string cleanup + union with own
    * stats (CS:60–95: replace, union). Inputs: competitor rows
    * (exchange, volume_str) with noisy formatting; own (exchange,
    * volume). */
  def competitor(spark: SparkSession, rawCompetitor: () => DataFrame,
                 own: () => DataFrame): Registry = {
    val reg = new Registry(spark)
    reg.source("raw_competitor_data", rawCompetitor)
    reg.source("own_stats", own)
    reg.register(TableDef("cleaned_competitor_data",
      Seq("raw_competitor_data", "own_stats"), { case Seq(comp, ownDf) =>
        comp.select(col("exchange"),
            regexp_replace(col("volume_str"), "[$,]", "")
              .cast("double").as("volume"))
          .unionByName(ownDf.select(col("exchange"),
            col("volume").cast("double")))
      }, mode = Mode.Full))
    reg
  }
}
