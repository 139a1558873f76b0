package graft.serving

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-value serving sink abstraction (SURVEY.md §2.2 K4): the reference
  * bulk-writes reshaped gold tables into DynamoDB with a hash key, an
  * optional range key, unix-seconds timestamps and a TTL column
  * (zetadex-serving.py:25–234, zetadex-serving-v2.py:212–232).
  *
  * The engine keeps the sink behind a trait: the production impl would be
  * a DynamoDB/connector writer (driver-side control plane + executor data
  * plane); tests and local runs use [[ParquetKVSink]]. The reshape logic
  * — key formatting, timestamp conversion, TTL — is pure DataFrame code
  * shared by every impl, so it is exercised by the correctness gate
  * (q49_serving_reshape).
  */
trait KVSink {

  /** Write `df` as KV items. `hashKey` (and `rangeKey` if present) must
    * exist as columns; implementations may batch/parallelize per
    * partition. */
  def write(df: DataFrame, table: String, hashKey: String,
            rangeKey: Option[String] = None): Unit

  /** Serving projection applied before any write (zetadex-serving.py:
    * 212–221): timestamps → unix seconds, optional TTL. */
  final def servingProjection(df: DataFrame, ttlFrom: Option[String] = None,
                              ttl: String = "14 days"): DataFrame = {
    val tsConverted = df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == org.apache.spark.sql.types.TimestampType)
        acc.withColumn(f.name, unix_timestamp(col(f.name)))
      else acc
    }
    ttlFrom.fold(tsConverted) { c =>
      tsConverted.withColumn("ttl",
        unix_timestamp(col(c).cast("timestamp") + expr(s"interval $ttl")))
    }
  }
}

/** Test/local implementation: one parquet dataset per KV table, written
  * sorted within partitions by the keys (mirrors the DynamoDB writer's
  * partition batching; keeps output deterministic for comparison). */
final class ParquetKVSink(baseDir: String) extends KVSink {
  override def write(df: DataFrame, table: String, hashKey: String,
                     rangeKey: Option[String] = None): Unit = {
    val keys = (hashKey +: rangeKey.toSeq).map(col)
    df.repartition(col(hashKey))
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite")
      .parquet(s"$baseDir/$table")
  }

  /** Spec-driven write — the data plane of [[KVTableSpec]]: validates
    * the spec against the frame, writes the main table, then
    * materializes every index as its physical analog. An LSI shares the
    * table hash key, so it is the SAME partitioning re-sorted by its
    * range key (DynamoDB's item-collection locality — no data moves
    * between partitions to maintain it); a GSI has its own hash key, so
    * it is a full re-partition of the projection-pruned columns (a GSI
    * is a second table the base writes fan out to — which is why GSIs
    * carry their own throughput). Index datasets land at
    * `<table>__lsi_<name>` / `<table>__gsi_<name>`. Returns the
    * rendered create-table params for the control-plane client. */
  def writeWithSpec(df: DataFrame, spec: KVTableSpec): String = {
    val params = spec.createTableParams(df.schema) // validates too
    write(df, spec.table, spec.hashKey, spec.rangeKey)
    val all = df.columns.toSeq
    spec.lsis.foreach { l =>
      val cols = spec.projectedColumns(Seq(l.rangeKey), l.projection, all)
      df.select(cols.map(col): _*)
        .repartition(col(spec.hashKey))
        .sortWithinPartitions(col(spec.hashKey), col(l.rangeKey))
        .write.mode("overwrite")
        .parquet(s"$baseDir/${spec.table}__lsi_${l.indexName}")
    }
    spec.gsis.foreach { g =>
      val cols = spec.projectedColumns(Seq(g.hashKey) ++ g.rangeKey,
        g.projection, all)
      val keys = (g.hashKey +: g.rangeKey.toSeq).map(col)
      df.select(cols.map(col): _*)
        .repartition(col(g.hashKey))
        .sortWithinPartitions(keys: _*)
        .write.mode("overwrite")
        .parquet(s"$baseDir/${spec.table}__gsi_${g.indexName}")
    }
    params
  }
}
