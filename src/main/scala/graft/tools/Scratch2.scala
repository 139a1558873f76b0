package graft.tools
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(16)
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(d + "/lineitem.parquet").count()
    for (i <- 1 to 3) {
      for (q <- Seq("q30_knn_bruteforce", "q31_knn_lsh")) {
        val t0 = System.nanoTime()
        val n = graft.queries.Catalog.byName(q).run(spark, d).count()
        println(f"iter$i $q%-18s ${(System.nanoTime()-t0)/1e9}%6.2f s rows=$n")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
