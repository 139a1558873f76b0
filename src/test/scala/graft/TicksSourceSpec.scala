package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract pins for the custom DataSourceV2 connector
  * (graft.sources.TicksProvider): pushdown REALLY narrows generation,
  * column pruning REALLY narrows the read schema, declined predicates
  * are REALLY re-applied by Spark, and partition planning covers the
  * range exactly once.
  */
class TicksSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ticks(rows: Long = 1000L, parts: Int = 4) =
    spark.read.format("graft.sources.TicksProvider")
      .option("rows", rows).option("parts", parts).load()

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("full scan: every row matches the generator formula, exactly once") {
    val rows = ticks(1000L).collect()
    assert(rows.length === 1000)
    assert(rows.map(_.getLong(0)).toSet === (0L until 1000L).toSet)
    val r = rows.find(_.getLong(0) === 123L).get
    assert(r.getString(1) === "S3")
    assert(r.getLong(2) === 1700000123L)
    assert(r.getLong(3) === 10000L + (123L * 37) % 2000 - 1000)
    assert(r.getLong(4) === 1L + (123L * 7) % 100)
  }

  test("tick_id range pushdown narrows generation and shows in the plan") {
    val df = ticks(100000L, 8)
      .filter(col("tick_id") >= 60000L && col("tick_id") < 60500L)
    val plan = executedPlan(df)
    assert(plan.contains("range=[60000,60500)"),
      s"pushdown did not reach the connector:\n$plan")
    assert(df.count() === 500L)
  }

  test("declined predicates are re-applied by Spark, not lost") {
    val df = ticks(1000L).filter(col("symbol") === "S5")
    val plan = executedPlan(df)
    // connector declines symbol predicates -> full range, Spark filters
    assert(plan.contains("range=[0,1000)"))
    assert(df.count() === 125L) // 1000 / 8 symbols
    assert(df.collect().forall(_.getString(1) == "S5"))
  }

  test("column pruning reaches the reader schema") {
    val df = ticks(1000L).select("symbol")
    val plan = executedPlan(df)
    assert(plan.contains("cols=symbol"),
      s"pruned schema did not reach the connector:\n$plan")
  }

  test("partition planning covers a narrowed range exactly once") {
    val df = ticks(100000L, 7)
      .filter(col("tick_id") >= 12345L && col("tick_id") <= 23456L)
    assert(df.count() === 23456L - 12345L + 1)
    assert(df.agg(countDistinct("tick_id")).head.getLong(0)
      === 23456L - 12345L + 1)
  }

  test("empty range after contradictory pushdown yields zero rows") {
    val df = ticks(1000L)
      .filter(col("tick_id") === 2000L) // beyond rows
    assert(df.count() === 0L)
  }

  test("micro-batch stream drains the cap under admission control, " +
      "exactly once") {
    val sp = spark
    val q = sp.readStream.format("graft-ticks")
      .option("rows", 5000L).option("parts", 4)
      .option("ratePerBatch", 1200L)
      .load()
      .writeStream.format("memory").queryName("ticks_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = sp.sql("SELECT tick_id FROM ticks_sink").collect()
        .map(_.getLong(0))
      assert(got.length === 5000)
      assert(got.toSet === (0L until 5000L).toSet)
      // admission control: no batch exceeded the rate
      val sizes = q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
      assert(sizes.forall(_ <= 1200L), s"batch sizes: $sizes")
      assert(sizes.length >= 5) // ceil(5000/1200)
    } finally q.stop()
  }

  test("checkpoint restart resumes from the committed offset, no dup/loss") {
    val sp = spark
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ticks_ckpt_").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_ticks_out_").toString
    def run(): Unit = {
      val q = sp.readStream.format("graft-ticks")
        .option("rows", 3000L).option("ratePerBatch", 700L)
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // drains fully
    run() // restart against the same checkpoint: nothing new to emit
    val rows = sp.read.parquet(out).select("tick_id").collect()
      .map(_.getLong(0))
    assert(rows.length === 3000)
    assert(rows.toSet === (0L until 3000L).toSet)
  }
}
