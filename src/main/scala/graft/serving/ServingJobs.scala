package graft.serving

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Conf
import graft.ops.Relational

/** The serving notebooks re-expressed (zetadex-serving-v2.py, SURVEY.md
  * §3.3): snapshot a gold table at the as-of hour, reshape for KV access
  * (rollup totals, wide→long unpivot, camelCase, composite sort key,
  * TTL), and push through a [[KVSink]].
  */
object ServingJobs {

  /** Leaderboard-style serving (S2:416–568): snapshot the hour at
    * `conf.asOf − lag`, add an ALL sentinel rollup over `dim`, unpivot
    * the metric columns, camelCase, and write keyed by (metric,
    * sortKey). Returns the served frame. */
  def serveSnapshot(gold: DataFrame, tsCol: String, dim: String,
                    metrics: Seq[String], conf: Conf, sink: KVSink,
                    table: String, lagHours: Int = 2): DataFrame = {
    val snapshot = gold.filter(col(tsCol) ===
      date_trunc("hour", conf.asOfTs - expr(s"interval $lagHours hours")))
    val withAll = Relational.rollupWithAll(dim, "ALL",
      metrics.map(m => sum(col(m).cast(graft.queries.QH.DEC))
        .cast("string").cast("double").as(m)))(
      snapshot.select((dim +: metrics).map(col): _*))
    val long = Relational.unpivotMetrics(Seq(dim), metrics)(withAll)
      .withColumn("sort_key",
        Relational.kvSortKey(col("metric"), col(dim)))
    val served = Relational.camelCaseAll(
      long.withColumn("snapshot_ts", conf.asOfTs))
    sink.write(sink.servingProjection(served, ttlFrom = Some("snapshotTs")),
      table, hashKey = "metric", rangeKey = Some("sortKey"))
    served
  }

  /** All-time stats with historical backfill constants folded in
    * (S2:628–649: V1_VOLUME / v1_TRADE_COUNT added to the totals). */
  def serveAllTimeStats(hourly: DataFrame, volumeCol: String,
                        countCol: String, baseVolume: Double,
                        baseCount: Long, sink: KVSink,
                        table: String): DataFrame = {
    val totals = hourly.agg(
        (sum(col(volumeCol).cast(graft.queries.QH.DEC))
          .cast("string").cast("double") + baseVolume).as("total_volume"),
        (sum(col(countCol)) + baseCount).as("total_count"))
    val served = Relational.camelCaseAll(totals.withColumn("id", lit("ALL")))
    sink.write(served, table, hashKey = "id")
    served
  }
}
