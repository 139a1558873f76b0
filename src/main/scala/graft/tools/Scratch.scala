package graft.tools

/** Ad-hoc local probe main; not part of the engine API. Edit freely to
  * time or inspect a single query, e.g.:
  * `sbt "runMain graft.tools.Scratch q28_minhash_lsh /root/testdata/sf0.1"`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    // mirror Bench: one warm-up run, then the timed run
    val q = graft.queries.Catalog.byName(name)
    q.run(spark, dir).count()
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val df = q.run(spark, dir)
    val n = df.count()
    println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s warm, $n rows")
    df.explain("formatted")
    spark.stop()
  }
}
