package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.graph.{Mode, Registry, TableDef, WriteMode}
import graft.ops.Relational

/** Market-maker uptime (zetadex-mm-uptime-pipeline-v3.sql): quote
  * snapshots → validity intervals (lead) → per-hour overlap seconds →
  * uptime percentage, median across makers.
  *
  * Input: a quotes frame (timestamp, authority, asset, side, price,
  * size). A maker is "up" while its latest snapshot shows a two-sided
  * quote (U3:36–41 best bid/ask via conditional window min/max).
  */
object MMUptimePipeline {

  def build(spark: SparkSession, quotes: () => DataFrame): Registry = {
    val reg = new Registry(spark)
    reg.source("raw_quotes", quotes)

    // per-snapshot quote state: best bid/ask per (maker, asset, ts)
    // (U3:2–51), two_sided flag
    reg.register(TableDef("quote_state", Seq("raw_quotes"), { case Seq(q) =>
      q.groupBy("timestamp", "authority", "asset")
        .agg(
          max(when(col("side") === "bid", col("price"))).as("best_bid"),
          min(when(col("side") === "ask", col("price"))).as("best_ask"))
        .withColumn("two_sided",
          col("best_bid").isNotNull && col("best_ask").isNotNull &&
            col("best_bid") < col("best_ask"))
    }, mode = Mode.Incremental))

    // validity intervals: a state holds until the next snapshot
    // (U2:77–104 lead-based interval construction, W3)
    reg.register(TableDef("quote_intervals", Seq("quote_state"), {
      case Seq(qs) =>
        val w = Window.partitionBy("authority", "asset").orderBy("timestamp")
        qs.withColumn("valid_to",
            coalesce(lead(col("timestamp"), 1).over(w),
              col("timestamp") + expr("interval 1 hour")))
          .filter(col("two_sided"))
    }, mode = Mode.Full))

    // per-hour uptime: overlap of up-intervals with each hour of the
    // spine (U3:98–146), as a binned range join — no quadratic fallback
    reg.register(TableDef("uptime_hourly", Seq("quote_intervals"), {
      case Seq(iv) =>
        val spine = iv
          .agg(date_trunc("hour", min(col("timestamp"))).as("mn"),
            date_trunc("hour", max(col("valid_to"))).as("mx"))
          .select(explode(expr("sequence(mn, mx, interval 1 hour)"))
            .as("hour_start"))
          .withColumn("hour_end", col("hour_start") + expr("interval 1 hour"))
        val makers = iv.select("authority", "asset").distinct()
        val grid = spine.crossJoin(broadcast(makers))
        val joined = Relational.rangeJoinBinned(
          grid, iv.select(col("authority"), col("asset"),
            col("timestamp"), col("valid_to")),
          col("hour_start"), col("hour_end"),
          col("timestamp"), col("valid_to"),
          Seq("authority", "asset"), binSeconds = 3600L)
        joined
          .withColumn("overlap_secs",
            unix_timestamp(least(col("hour_end"), col("valid_to")))
              - unix_timestamp(greatest(col("hour_start"), col("timestamp"))))
          .groupBy("hour_start", "authority", "asset")
          .agg((sum(col("overlap_secs")) / 3600.0).as("uptime_pct"))
    }, mode = Mode.Full))

    // asset-level median maker uptime (U3:121–123, A9)
    reg.register(TableDef("uptime_asset_median", Seq("uptime_hourly"), {
      case Seq(u) =>
        u.groupBy("hour_start", "asset")
          .agg(median(col("uptime_pct")).as("median_uptime"),
            count(lit(1)).as("n_makers"))
    }, mode = Mode.Full))

    // K3 (U3:151–157): the published `cleaned_mm_uptime` — the reference
    // appends each hourly notebook run with a raw `mode("append")
    // .saveAsTable`, which doubles rows on a cluster re-run.
    // WriteMode.Append materializes the same cadence as dynamic
    // partition overwrite on the hour, so Runner.runBatch re-runs are
    // idempotent per partition.
    reg.register(TableDef("cleaned_mm_uptime", Seq("uptime_hourly"), {
      case Seq(u) =>
        u.withColumn("hour_", date_format(col("hour_start"), "yyyy-MM-dd-HH"))
    }, mode = Mode.Full, partitionCols = Seq("hour_"),
      writeMode = WriteMode.Append))

    reg
  }
}
