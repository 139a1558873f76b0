package graft.tools

/** Ad-hoc local probe main; not part of the engine API. Edit freely to
  * time or inspect a single query, e.g.:
  * `sbt "runMain graft.tools.Scratch q28_minhash_lsh /root/testdata/sf0.1"`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")

    // q274 round-1 shape: what does one peel round's plan look like?
    val pairs = t("lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(t("orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("s"), col("l_suppkey")).as("sp"))
      .distinct()
    var edges = pairs.select(col("c").as("src"), col("sp").as("dst"))
      .unionByName(pairs.select(col("sp").as("src"), col("c").as("dst")))
      .localCheckpoint()
    println(s"edges=${edges.count()} nodes=${edges.select("src").distinct().count()}")
    val kf = edges
      .agg((count(lit(1)) / (countDistinct(col("src")) * 2))
        .cast("long").as("k"))
      .localCheckpoint()
    val keep = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .crossJoin(broadcast(kf))
      .filter(col("deg") >= col("k"))
      .select(col("src").as("node")).localCheckpoint(false)
    val e2 = edges
      .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
    e2.collect()
    val plan = e2.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    println(plan)
    spark.stop()
  }
}
