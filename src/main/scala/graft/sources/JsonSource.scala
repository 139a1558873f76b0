package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental JSON landing-zone ingest (SURVEY.md §2.1 S1): the Spark-
  * native stand-in for Databricks Auto Loader — a fixed DDL schema over a
  * (possibly hive-partitioned `year/month/day/hour`) JSON directory, read
  * either batch or as a file stream (zetadex-transactions-helius-pipeline
  * .py:70–80, :292–302).
  *
  * Design notes for scale: the schema is declared, never inferred (no
  * sampling pass over 100 TB); partition columns come from the directory
  * layout so partition pruning reaches the file listing; `maxFilesPerTrigger`
  * bounds micro-batch size in streaming mode (Auto Loader's
  * `cloudFiles.maxFilesPerTrigger` equivalent).
  */
object JsonSource {

  /** Batch read with fixed schema. `partitionCols` are derived from the
    * hive directory layout when present and dropped by callers that do
    * not want them (the reference drops year/month/day/hour post-ingest,
    * transactions:355). */
  def batch(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).json(path)

  /** Streaming read: each micro-batch picks up newly arrived files.
    * Combine with [[graft.streaming.StreamingOps]] watermark helpers. */
  def stream(spark: SparkSession, path: String, ddl: String,
             maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(ddl)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(path)

  /** Derive `date_` / `hour_` partition columns from an event-time column
    * (the reference's silver-layer partitioning convention,
    * transactions:356–357). */
  def withDatePartitions(df: DataFrame, ts: String): DataFrame =
    df.withColumn("date_", to_date(col(ts)))
      .withColumn("hour_", date_format(col(ts), "HH"))

  /** Batch read that QUARANTINES malformed records instead of nulling
    * them silently (PERMISSIVE default) or dying on the first bad byte
    * (FAILFAST): returns (clean rows, corrupt raw lines). At a 100 TB
    * landing zone malformed producer output is a certainty, and the
    * reference's Auto Loader ingests with no rescue path — dropped rows
    * would be invisible. The corrupt frame carries the raw line for
    * replay after a producer fix.
    *
    * Implementation reads the landing zone as TEXT and parses with
    * `from_json` (a malformed line parses to a null struct): Spark
    * forbids projecting the internal `_corrupt_record` column on its
    * own from a raw JSON read, and the text route expresses the same
    * split declaratively — each returned frame plans its own
    * scan+parse+filter, pruned and pushed down independently. */
  def batchWithQuarantine(spark: SparkSession, path: String, ddl: String)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{StringType, StructType}
    // from_json flags malformed input via a corrupt-record slot declared
    // INSIDE its schema (a bare malformed line otherwise parses to an
    // all-null struct, indistinguishable from legitimate nulls)
    val schema = StructType.fromDDL(ddl).add("_cr", StringType)
    val parsed = spark.read.text(path)
      .select(col("value").as("raw_line"),
        from_json(col("value"), schema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_cr")).as("r"))
    // a NULL struct (blank line, literal `null` JSON) carries no _cr
    // flag yet is not a data row — it must quarantine too, or it lands
    // in the clean frame as an all-null row (the silent-null path this
    // function exists to prevent)
    val clean = parsed.filter(col("r").isNotNull && col("r._cr").isNull)
      .select(col("r.*")).drop("_cr")
    val corrupt = parsed
      .filter(col("r").isNull || col("r._cr").isNotNull)
      .select(col("raw_line"))
    (clean, corrupt)
  }

  /** Additive schema evolution for the landing zone (the reference reads
    * its evolving bronze table with `mergeSchema`, transactions:983): the
    * declared DDL stays authoritative — old readers see exactly their
    * declared columns — while data that cannot land in them is captured
    * into a `map<string,string>` rescue column instead of being silently
    * dropped (Auto Loader's `rescuedDataColumn` semantics). Three rescue
    * classes:
    *
    *  - an UNDECLARED top-level field a producer starts emitting;
    *  - a DECLARED field whose value fails its declared type (PERMISSIVE
    *    parsing nulls the field — the raw text is kept under the field's
    *    name, so the value is never lost);
    *  - a line that is not parseable JSON at all, kept whole under the
    *    reserved `_raw` key (compose with [[batchWithQuarantine]] when
    *    malformed lines should be split out for replay instead).
    *
    * Promoting a rescued field is then a DDL change, not a backfill: the
    * next read with the widened DDL parses it natively and it disappears
    * from the rescue map.
    *
    * Reads the zone as text (like [[batchWithQuarantine]]); hive
    * partition discovery does not apply on this path. Nested-object
    * values are rescued as their JSON text. */
  def batchWithRescue(spark: SparkSession, path: String, ddl: String,
                      rescuedCol: String = "_rescued"): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val declared = StructType.fromDDL(ddl).fieldNames.toSeq
    val emptyMap = map().cast("map<string,string>")
    val parsed = spark.read.text(path).select(
      col("value"),
      from_json(col("value"), StructType.fromDDL(ddl)).as("r"),
      // a second parse of the same line into map<string,string> sees every
      // top-level key as raw text, independent of the declared types
      from_json(col("value"), org.apache.spark.sql.types.DataType
        .fromDDL("map<string,string>")).as("m"))
    val m = coalesce(col("m"), emptyMap)
    val undeclared = map_filter(m, (k, _) => !k.isin(declared.map(lit): _*))
    // declared fields whose parse came back null while the raw key holds a
    // value: the type-mismatch case PERMISSIVE mode would silently null
    val failedDeclared = declared.map { f =>
      when(col("r").getField(f).isNull && m.getItem(f).isNotNull,
        map(lit(f), m.getItem(f))).otherwise(emptyMap)
    }
    val rescued = (undeclared +: failedDeclared).reduce(map_concat(_, _))
    parsed.select(col("r.*"),
      when(col("r").isNull || col("m").isNull,
          map(lit("_raw"), col("value")))
        .when(size(map_keys(rescued)) > 0, rescued)
        .as(rescuedCol))
  }
}
