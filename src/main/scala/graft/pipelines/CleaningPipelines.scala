package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{Mode, Registry, TableDef}
import graft.ops.Relational

/** The remaining light "clean-and-publish" notebook families, which are
  * recombinations of ops already in the engine:
  * prices (zetadex-prices-pipeline.py), platform monitoring
  * (zetadex-platform-monitoring-pipeline.py), competitor stats
  * (zetadex-competitor-stats-pipeline.py).
  */
object CleaningPipelines {

  /** Prices: dedup per (underlying, minute), derive partition cols,
    * latest vault balances (PR:62–78, PR:275–285), and — when a
    * coingecko feed is provided — the mark-price/OI join with notional
    * derivation (PR:142–184). Inputs: raw (timestamp, underlying,
    * price, source [, open_interest]); coingecko (timestamp, underlying,
    * price_usd). */
  def prices(spark: SparkSession, raw: () => DataFrame,
             coingecko: Option[() => DataFrame] = None): Registry = {
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
    reg
  }

  /** Platform monitoring: formatted liquidity metrics per (venue, asset)
    * (PM:126–142: format_string projections, partition by venue/asset).
    * Input: (timestamp, venue, asset, bid_liquidity, ask_liquidity). */
  def monitoring(spark: SparkSession, raw: () => DataFrame): Registry = {
    val reg = new Registry(spark)
    reg.source("raw_exchange_liquidity", raw)
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
