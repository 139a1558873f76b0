package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipelines.QualityPipeline

/** Hand-computed expectations over a small event set with one violation
  * of each kind: the clean/quarantine split must PARTITION the input,
  * reasons must follow check priority, and the audit tables must
  * reconcile with the split exactly. */
class QualityPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    val sp = spark
    import sp.implicits._
    Seq(
      // (event_id, secs, user_id, event_type, value, props)
      (1L, 100L, Some(7L), "view", 10.0, Some("{}")),    // clean
      (2L, 200L, None: Option[Long], "view", 10.0, Some("{}")), // null_user
      (3L, 300L, Some(8L), "click", 10.0, None: Option[String]), // null_props
      (4L, 400L, Some(9L), "buy", 900.0, Some("{}")),    // out_of_range
      (5L, 500L, None: Option[Long], "buy", -5.0, None: Option[String]),
      // ^ violates all three → reason must be the FIRST check: null_user
      (6L, 4000L, Some(10L), "view", 399.9, Some("{}"))  // clean, hour 2
    ).toDF("event_id", "secs", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("secs"))).drop("secs")
  }

  test("clean ∪ quarantine partitions the input; reasons follow priority") {
    val reg = QualityPipeline.build(spark, () => fixture)
    val clean = reg.resolve("events_clean").select("event_id")
      .collect().map(_.getLong(0)).toSet
    val quar = reg.resolve("events_quarantine")
      .select("event_id", "reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean === Set(1L, 6L))
    assert(quar === Map(
      2L -> "null_user",
      3L -> "null_props",
      4L -> "out_of_range",
      5L -> "null_user")) // multi-violation row names the FIRST check
    assert(clean.intersect(quar.keySet).isEmpty)
    assert(clean.size + quar.size === 6)
  }

  test("audit tables reconcile with the split; gate applies the budget") {
    val reg = QualityPipeline.build(spark, () => fixture,
      maxViolationRate = 0.7)
    val hourly = reg.resolve("quality_metrics_hourly")
      .orderBy("hour_ts").collect()
    // hour 0 carries events 1–5, hour 1 carries event 6
    assert(hourly.length === 2)
    assert(hourly(0).getAs[Long]("n") === 5)
    assert(hourly(0).getAs[Long]("n_null_user") === 2)
    assert(hourly(0).getAs[Long]("n_null_props") === 2)
    assert(hourly(0).getAs[Long]("n_out_of_range") === 2)
    assert(hourly(1).getAs[Long]("n") === 1)
    assert(hourly(1).getAs[Long]("n_null_user") === 0)

    val gate = reg.resolve("quality_gate").collect()(0)
    assert(gate.getAs[Long]("n_rows") === 6)
    assert(gate.getAs[Long]("n_violations") === 4)
    assert(gate.getAs[Boolean]("passed")) // 4/6 ≈ 0.667 ≤ 0.7
  }

  test("gate fails when the violation rate exceeds the budget") {
    val reg = QualityPipeline.build(spark, () => fixture,
      maxViolationRate = 0.05)
    val gate = reg.resolve("quality_gate").collect()(0)
    assert(gate.getAs[Long]("n_violations") === 4)
    assert(!gate.getAs[Boolean]("passed"))
  }
}
