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
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$tag%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val li = t("lineitem")
    time("percentile agg alone") {
      li.agg(expr("percentile(l_extendedprice, " +
        "array(0.125D, 0.25D, 0.375D, 0.5D, 0.625D, 0.75D, 0.875D))")).count()
    }
    time("bucket+agg alone (fake bnds)") {
      val bnds = spark.sql("SELECT array(2000D,3000D,4000D,5000D,6000D,7000D,8000D) AS bnds")
      li.select(col("l_extendedprice").as("v"), col("l_partkey"))
        .crossJoin(broadcast(bnds))
        .select(col("v"), col("l_partkey"),
          size(expr("filter(bnds, b -> b < v)")).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)), countDistinct(col("l_partkey")),
          round(min(col("v")), 2), round(max(col("v")), 2)).count()
    }
    spark.stop()
  }
}
