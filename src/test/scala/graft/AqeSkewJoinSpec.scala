package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join engagement pin — the runtime half of the skew story.
  * q110/q175 are the MANUAL salting path (deterministic, oracle-gated);
  * production's first line of defense is AQE splitting the skewed
  * partition at runtime, and this spec proves the session's
  * configuration actually lets it engage: a 64k-row hot key joined
  * sort-merge (broadcast disabled) under toy-sized skew thresholds must
  * come back with `skew=true` stamped on the join node, and the result
  * must be row-identical to the unsplit join.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits the hot partition (skew=true) without changing results") {
    val sp = spark
    import sp.implicits._
    val conf = sp.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "32KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // one hot key carrying ~98% of the left side
      val left = sp.range(0, 65536).select(
        when($"id" % 50 === 0, $"id" % 37).otherwise(lit(0L)).as("k"),
        $"id".as("v"))
      val right = sp.range(0, 37).select($"id".as("k"), ($"id" * 10).as("w"))
      val joined = left.join(right, "k")
      // drive THIS df's execution (count() would build a different plan)
      val n = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"AQE skew split did not engage:\n$plan")
      assert(n === 65536L)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
