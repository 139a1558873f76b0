package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{Mode, Registry, Runner, TableDef, WriteMode}
import graft.pipelines.EventsPipeline

/** Streaming-vs-batch equivalence of the whole medallion DAG: the same
  * transforms produce identical gold tables whether the bronze source is
  * a batch scan or a micro-batched file stream. */
class RunnerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("streaming run (AvailableNow) equals batch run for the events DAG") {
    val reg = EventsPipeline.build(spark, d)
    val batchDir = Files.createTempDirectory("runner_batch").toString
    val streamDir = Files.createTempDirectory("runner_stream").toString

    val batchOut = Runner.runBatch(reg, batchDir)

    // stream the same parquet through a file-stream source;
    // the source needs a directory, so glob down to the one table
    val streamOut = Runner.runStreamingThenFull(spark, reg,
      Map("raw_events" -> (() =>
        graft.tables.Tables.normalize("events",
          spark.readStream.schema(
            spark.read.parquet(s"$d/events.parquet").schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(d)))),
      streamDir)

    for (tbl <- Seq("agg_events_24h_rolling", "serving_events")) {
      val b = spark.read.parquet(batchOut(tbl))
      val s = spark.read.parquet(streamOut(tbl))
      assert(b.count() === s.count(), tbl)
      assert(b.exceptAll(s).count() === 0, s"$tbl batch minus stream")
      assert(s.exceptAll(b).count() === 0, s"$tbl stream minus batch")
    }
  }

  // K3 (zetadex-mm-uptime-pipeline-v3.sql:151–157): the hourly
  // `mode("append").saveAsTable` cadence, as idempotent dynamic partition
  // overwrite — a retried run must NOT double rows.
  test("WriteMode.Append: re-running the same batch does not double rows") {
    val sp = spark
    import sp.implicits._
    val out = Files.createTempDirectory("runner_append").toString
    def reg(hours: Seq[(String, Long)]): Registry = {
      val r = new Registry(sp)
      r.source("uptime_feed", () => hours.toDF("hour_", "seconds_up"))
      r.register(TableDef("cleaned_mm_uptime", Seq("uptime_feed"),
        { case Seq(u) => u }, mode = Mode.Full,
        partitionCols = Seq("hour_"), writeMode = WriteMode.Append))
      r
    }
    Runner.runBatch(reg(Seq("h00" -> 10L, "h01" -> 20L)), out)
    // the retried hourly batch: h01 recomputed (new value) + new hour h02
    Runner.runBatch(reg(Seq("h01" -> 25L, "h02" -> 30L)), out)
    // and an exact re-run of that same batch (the idempotence claim)
    Runner.runBatch(reg(Seq("h01" -> 25L, "h02" -> 30L)), out)
    val got = sp.read.parquet(s"$out/cleaned_mm_uptime")
      .select("hour_", "seconds_up").as[(String, Long)].collect().toSet
    assert(got === Set("h00" -> 10L, "h01" -> 25L, "h02" -> 30L),
      "untouched partitions survive, recomputed ones replace, no doubles")
  }

  test("WriteMode.Upsert: batch runs merge into the existing table by key") {
    val sp = spark
    import sp.implicits._
    val out = Files.createTempDirectory("runner_upsert").toString
    def reg(rows: Seq[(Long, Long, String)]): Registry = {
      val r = new Registry(sp)
      r.source("cdc_feed", () => rows.toDF("k", "seq", "v"))
      r.register(TableDef("latest", Seq("cdc_feed"),
        { case Seq(c) => c }, mode = Mode.Full,
        writeMode = WriteMode.Upsert(Seq("k"), "seq")))
      r
    }
    Runner.runBatch(reg(Seq((1L, 1L, "a"), (2L, 1L, "b"))), out)
    // newer seq wins, older loses, new key inserts; replay is idempotent
    Runner.runBatch(reg(Seq((1L, 5L, "A"), (2L, 0L, "stale"), (3L, 1L, "c"))), out)
    Runner.runBatch(reg(Seq((1L, 5L, "A"), (2L, 0L, "stale"), (3L, 1L, "c"))), out)
    val got = sp.read.parquet(s"$out/latest")
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(got === Set(1L -> "A", 2L -> "b", 3L -> "c"))
  }

  // The 100 TB shape: a partitioned upsert must not rewrite partitions
  // the batch doesn't touch — pinned PHYSICALLY (same parquet files, not
  // just same rows).
  test("WriteMode.Upsert with partitionCols leaves untouched partitions' files intact") {
    val sp = spark
    import sp.implicits._
    val out = Files.createTempDirectory("runner_upsert_pruned").toString
    // bucket is a stable function of the key — the precondition for
    // partition-pruned merging
    def reg(rows: Seq[(Long, Long, String)]): Registry = {
      val r = new Registry(sp)
      r.source("cdc_feed", () => rows.toDF("k", "seq", "v")
        .withColumn("bucket", pmod(col("k"), lit(2)).cast("int")))
      r.register(TableDef("latest", Seq("cdc_feed"), { case Seq(c) => c },
        mode = Mode.Full, partitionCols = Seq("bucket"),
        writeMode = WriteMode.Upsert(Seq("k"), "seq")))
      r
    }
    def filesOf(bucket: Int): Set[String] = {
      val dir = java.nio.file.Path.of(s"$out/latest/bucket=$bucket")
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
      finally s.close()
    }
    Runner.runBatch(reg(Seq((1L, 1L, "a"), (2L, 1L, "b"), (4L, 1L, "d"))), out)
    val evenFilesBefore = filesOf(0)
    // second batch touches only odd keys → only bucket=1 rewrites
    Runner.runBatch(reg(Seq((1L, 5L, "A"), (3L, 1L, "c"))), out)
    assert(filesOf(0) === evenFilesBefore,
      "bucket=0 was not in the batch — its files must be untouched")
    val got = sp.read.parquet(s"$out/latest")
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(got === Set(1L -> "A", 2L -> "b", 3L -> "c", 4L -> "d"))
  }
}
