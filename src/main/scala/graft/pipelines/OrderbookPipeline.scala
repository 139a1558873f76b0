package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{Mode, Registry, TableDef}

/** Orderbook snapshot → market-maker scoring pipeline
  * (zetadex-orderbook-snapshot-pipeline.py, SURVEY.md Appendix A).
  *
  * Input (bronze, orderbook:39–61):
  * {{{
  * asset string, local_timestamp timestamp, exchange_timestamp timestamp,
  * midpoint double, mark_price double,
  * bids array<struct<price double, size double,
  *                   open_order_address string, authority string>>,
  * asks array<struct<...same...>>
  * }}}
  *
  * MM program constants (orderbook:271–287): quotes within 20 bps of the
  * midpoint with ≥ $5,000 depth (or 40 bps / $1,000 for the wide tier)
  * count toward uptime; final score = depth^0.15 × uptime^5
  * (orderbook:626–629).
  */
object OrderbookPipeline {

  val TightSpreadBps = 20.0
  val TightDepthUsd = 5000.0
  val WideSpreadBps = 40.0
  val WideDepthUsd = 1000.0

  /** Per-market MM program weights (orderbook:290–419, mm_market_params):
    * (asset, weight); the reference asserts the weights sum to 1.0 at
    * view construction (OB:411) — mirrored here at registration. */
  val DefaultMarketParams: Seq[(String, Double)] =
    Seq(("SOL", 0.25), ("BTC", 0.25), ("ETH", 0.25), ("JTO", 0.25))

  def build(spark: SparkSession, rawSnapshots: () => DataFrame,
            trades: Option[() => DataFrame] = None,
            pubkeyLabel: Option[() => DataFrame] = None,
            marketParams: Seq[(String, Double)] = DefaultMarketParams)
      : Registry = {
    val sp = spark
    import sp.implicits._
    val reg = new Registry(spark)
    reg.source("raw_orderbook_snapshot", rawSnapshots)
    reg.source("cleaned_ix_trade", trades.getOrElse(
      () => Seq.empty[(String, java.sql.Timestamp, Boolean, Double)]
        .toDF("authority", "block_time", "is_taker", "volume")))
    reg.source("pubkey_label", pubkeyLabel.getOrElse(
      () => Seq.empty[(String, String)].toDF("pub_key", "label")))

    // inline literal params table (S3): the one programmatic schema in
    // the reference, weight-sum invariant checked eagerly like OB:411
    require(math.abs(marketParams.map(_._2).sum - 1.0) < 1e-9,
      "mm_market_params weights must sum to 1.0 (orderbook:411)")
    reg.register(TableDef("mm_market_params", Seq.empty, { case Seq() =>
      marketParams.toDF("asset", "weight")
    }, mode = Mode.Full))

    // per-(hour, asset) book aggregates (orderbook:227–249)
    reg.register(TableDef("agg_orderbook_all",
      Seq("raw_orderbook_snapshot"), { case Seq(raw) =>
        raw.groupBy(date_trunc("hour", col("exchange_timestamp"))
            .as("timestamp"), col("asset"))
          .agg(avg(col("midpoint")).as("avg_midpoint"),
            avg(col("mark_price")).as("avg_mark_price"),
            count(lit(1)).as("n_snapshots"))
      }, mode = Mode.Incremental))

    // whitelisted-maker hourly volume (orderbook:534–550): inner join to
    // the pubkey whitelist (J2), maker fills only
    reg.register(TableDef("agg_mm_maker_volume_1h",
      Seq("cleaned_ix_trade", "pubkey_label"), { case Seq(tr, labels) =>
        tr.join(broadcast(labels),
            tr("authority") === labels("pub_key"), "inner")
          .filter(!col("is_taker"))
          .groupBy(date_trunc("hour", col("block_time")).as("timestamp"),
            col("authority"))
          .agg(sum(col("volume")).as("maker_volume"))
      }, mode = Mode.Incremental))

    // per-level explosion with spread/depth metrics + spread-group
    // bucketing (orderbook:89–144, both sides in one pass instead of the
    // reference's two mirrored views)
    reg.register(TableDef("cleaned_orderbook_all",
      Seq("raw_orderbook_snapshot"), { case Seq(raw) =>
        def side(arr: String, name: String) = raw
          .select(col("asset"), col("exchange_timestamp").as("timestamp"),
            col("midpoint"), explode(col(arr)).as("lvl"))
          .select(col("asset"), col("timestamp"), col("midpoint"),
            lit(name).as("side"),
            col("lvl.price").as("price"), col("lvl.size").as("size"),
            col("lvl.authority").as("authority"))
        side("bids", "bid").unionByName(side("asks", "ask"))
          .withColumn("depth_usd", col("price") * col("size"))
          .withColumn("spread_bps",
            abs(col("price") - col("midpoint")) / col("midpoint") * 10000.0)
          .withColumn("spread_group",
            when(col("spread_bps") <= TightSpreadBps, "tight")
              .when(col("spread_bps") <= WideSpreadBps, "wide")
              .otherwise("outside"))
      }, mode = Mode.Incremental))

    // per-sample per-maker quote quality: does this maker have a
    // qualifying two-sided quote in this snapshot? (orderbook:460–530)
    reg.register(TableDef("cleaned_mm_quotes", Seq("cleaned_orderbook_all"), {
      case Seq(all) =>
        all
          .withColumn("qualifies",
            (col("spread_bps") <= TightSpreadBps &&
              col("depth_usd") >= TightDepthUsd) ||
              (col("spread_bps") <= WideSpreadBps &&
                col("depth_usd") >= WideDepthUsd))
          .groupBy("timestamp", "asset", "authority")
          .agg(
            max(when(col("side") === "bid" && col("qualifies"), 1)
              .otherwise(0)).as("has_bid"),
            max(when(col("side") === "ask" && col("qualifies"), 1)
              .otherwise(0)).as("has_ask"),
            // size-weighted quote price (VWAP, orderbook:493–502)
            (sum(col("price") * col("size")) / sum(col("size"))).as("vwap"),
            sum(when(col("qualifies"), col("depth_usd")).otherwise(0.0))
              .as("qual_depth_usd"))
          .withColumn("two_sided",
            (col("has_bid") === 1 && col("has_ask") === 1).cast("int"))
    }, mode = Mode.Incremental))

    // per-maker uptime + score over the sample window (orderbook:554–632):
    // uptime = qualifying samples / total samples per asset; score uses the
    // program exponents. Window-function gold → batch mode, like the
    // reference (orderbook:571–574).
    reg.register(TableDef("agg_mm_scores", Seq("cleaned_mm_quotes"), {
      case Seq(q) =>
        val samples = q.select("timestamp", "asset").distinct()
          .groupBy("asset").agg(count(lit(1)).as("n_samples"))
        q.groupBy("asset", "authority")
          .agg(sum(col("two_sided")).as("up_samples"),
            avg(col("qual_depth_usd")).as("avg_depth_usd"))
          .join(samples, "asset")
          .withColumn("uptime", col("up_samples") / col("n_samples"))
          .withColumn("score",
            pow(col("avg_depth_usd"), 0.15) * pow(col("uptime"), 5.0))
    }, mode = Mode.Full))

    // full MM program score (orderbook:554–632): per-(asset, authority)
    // quality Q = depth^0.15 × uptime^5 × maker_volume^0.85, weighted by
    // the market's program weight. Maker volume comes from the hourly
    // whitelist view summed per maker; makers without volume score 0
    // (the reference's inner join drops them — kept as left+coalesce so
    // the uptime component stays visible).
    reg.register(TableDef("agg_mm_scores_1h",
      Seq("agg_mm_scores", "agg_mm_maker_volume_1h", "mm_market_params"), {
      case Seq(scores, vol, params) =>
        val volByMaker = vol.groupBy("authority")
          .agg(sum(col("maker_volume")).as("maker_volume"))
        scores
          .join(volByMaker, Seq("authority"), "left")
          .withColumn("maker_volume", coalesce(col("maker_volume"), lit(0.0)))
          .join(broadcast(params), Seq("asset"), "left")
          .withColumn("weight", coalesce(col("weight"), lit(0.0)))
          .withColumn("q_depth", pow(col("avg_depth_usd"), 0.15))
          .withColumn("q_uptime", pow(col("uptime"), 5.0))
          .withColumn("q_volume", pow(col("maker_volume"), 0.85))
          .withColumn("q",
            col("q_depth") * col("q_uptime") * col("q_volume"))
          .withColumn("weighted_q", col("q") * col("weight"))
    }, mode = Mode.Full))

    reg
  }
}
