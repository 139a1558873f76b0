package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Catalog

/** Plan pin: Spark 4's InferWindowGroupLimit must rewrite the
  * rank-filter pattern (row_number over partition, filter rk <= k) into
  * a [[org.apache.spark.sql.execution.window.WindowGroupLimitExec]] —
  * a per-partition top-k pushed BELOW the shuffle, so each map task
  * forwards at most k rows per key instead of its whole slice. q12
  * (latest-per-user) is written in exactly that pattern ON PURPOSE:
  * if a refactor obscures the shape (e.g. rank computed in one select
  * and filtered three operators later through a projection the rule
  * cannot see through), top-1-per-key silently becomes a full-window
  * sort — correct, and quadratically more shuffle at 100 TB. This pin
  * makes that regression loud.
  */
class WindowGroupLimitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q12's rank filter lowers to WindowGroupLimit below the exchange") {
    val df = Catalog.byName("q12_latest_per_user")
      .run(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    val hits = "WindowGroupLimit".r.findAllIn(plan).size
    // partial (map-side, before the exchange) + final — both present
    assert(hits >= 2, s"WindowGroupLimit did not engage:\n$plan")
  }
}
