package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Runner
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
}
