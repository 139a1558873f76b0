package graft.tools
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    val p = graft.queries.Catalog.byName("q12_latest_per_user")
      .run(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    println("HAS_WGL=" + p.contains("WindowGroupLimit"))
    val p2 = graft.queries.Catalog.byName("q52_global_topk")
      .run(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    println("HAS_WGL_GLOBAL=" + p2.contains("WindowGroupLimit"))
    spark.stop()
  }
}
