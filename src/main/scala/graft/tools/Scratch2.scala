package graft.tools
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(16)
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(d + "/lineitem.parquet").count()
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.queries.Catalog.byName("q29_simhash").run(spark, d).count()
      println(f"iter$i q29 ${(System.nanoTime()-t0)/1e9}%6.2f s rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
