package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANALYZE TABLE + cost-based optimizer, pinned end to end: the planner
  * decision a 100 TB deployment actually relies on. A dim table whose
  * RAW size sits above the broadcast threshold joins after a selective
  * filter; only COLUMN STATISTICS let the optimizer see that the
  * filtered side is tiny and broadcast it. Same query, same data,
  * stats vs no stats — broadcast vs sort-merge.
  */
class CboStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The STATIC physical plan (pre-AQE). AQE will happily re-plan a
    * no-stats SMJ into a broadcast at runtime once the filtered side's
    * shuffle turns out tiny — but by then the BIG side has already been
    * shuffled. Statistics move the decision to PLANNING time, where the
    * fact-side exchange never happens; that static decision is what
    * this spec pins. */
  private def staticPlanOf(sql: String): String =
    spark.sql(sql).queryExecution.sparkPlan.toString

  test("column stats flip a filtered dim join to broadcast; no stats, SMJ") {
    val sp = spark
    import sp.implicits._
    val conf = sp.conf
    val savedCbo = conf.get("spark.sql.cbo.enabled")
    val savedThr = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.cbo.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "65536") // 64 KB
      sp.sql("DROP TABLE IF EXISTS cbo_dim")
      sp.sql("DROP TABLE IF EXISTS cbo_fact")
      // dim: ~200k rows, raw size well above 64 KB; `grp` = 0 for only
      // 1/1000 of rows, so the filtered side is truly tiny
      sp.range(0, 200000)
        .select($"id", ($"id" % 1000).as("grp"),
          concat(lit("padpadpadpadpadpad-"), $"id").as("pad"))
        .write.mode("overwrite").saveAsTable("cbo_dim")
      sp.range(0, 300000).select(($"id" % 200000).as("id"),
        ($"id" * 3).as("v"))
        .write.mode("overwrite").saveAsTable("cbo_fact")
      val q = """SELECT COUNT(*) AS n FROM cbo_fact f
                 JOIN cbo_dim d ON f.id = d.id WHERE d.grp = 0"""
      // without statistics the filter's output size is unknown ->
      // estimated at the table's raw size -> static plan is sort-merge
      val before = staticPlanOf(q)
      assert(before.contains("SortMergeJoin") &&
        !before.contains("BroadcastHashJoin"),
        s"expected static SMJ before ANALYZE:\n$before")
      sp.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR COLUMNS grp, id")
      sp.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")
      val after = staticPlanOf(q)
      assert(after.contains("BroadcastHashJoin"),
        s"column stats did not flip the static join to broadcast:\n$after")
      // and the answer is the same either way: 200 dim keys with grp=0;
      // fact ids < 100000 appear twice, the rest once -> 100*2 + 100*1
      assert(sp.sql(q).head.getLong(0) === 300L)
    } finally {
      conf.set("spark.sql.cbo.enabled", savedCbo)
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedThr)
      spark.sql("DROP TABLE IF EXISTS cbo_dim")
      spark.sql("DROP TABLE IF EXISTS cbo_fact")
    }
  }
}
