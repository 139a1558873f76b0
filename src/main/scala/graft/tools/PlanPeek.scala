package graft.tools

/** Dev utility: print the executed plan of the query names given as args. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      val df = graft.queries.Catalog.byName(name).run(spark, d)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      println(s"==== $name\n$plan")
    }
    spark.stop()
  }
}
