package graft.tools

import org.apache.spark.sql.functions._

/** Measurement probe (guide §1: isolate before claiming): the catalog
  * READ path's constant factor vs a native Spark parquet scan of the
  * SAME rows. Loads lineitem (4 columns) into a graft catalog table,
  * mirrors it as plain parquet, then times an aggregation over each
  * with the noop-equivalent count action. Not part of any query path —
  * evidence generator for OPTIMIZATION_r16.md.
  *
  * Usage: graftrun.sh graft.tools.CatalogScanProbe [sfDir] [reps]
  */
object CatalogScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_scanprobe_")
      .toString
    spark.conf.set("spark.sql.catalog.probe", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.probe.root", root)
    spark.sql("CREATE NAMESPACE probe.ns")
    spark.sql("CREATE TABLE probe.ns.li (l_orderkey BIGINT, " +
      "l_quantity DOUBLE, l_extendedprice DOUBLE, l_returnflag STRING)")
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      .repartitionByRange(8, col("l_orderkey"))
    src.writeTo("probe.ns.li").append()
    val mirror = s"$root/mirror"
    src.write.parquet(mirror)

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.count() // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s min=${times.min}%.3f s median=${times.sorted.apply(reps / 2)}%.3f s")
    }

    // full-width aggregation (reads all 4 columns)
    time("catalog agg 4col") {
      spark.sql("SELECT l_returnflag, COUNT(*), SUM(l_extendedprice), " +
        "SUM(l_quantity), MAX(l_orderkey) FROM probe.ns.li GROUP BY 1")
    }
    time("native agg 4col") {
      spark.read.parquet(mirror)
        .groupBy("l_returnflag")
        .agg(count(lit(1)), sum("l_extendedprice"), sum("l_quantity"),
          max("l_orderkey"))
    }
    // narrow scan (1 numeric column)
    time("catalog agg 1col") {
      spark.sql("SELECT SUM(l_extendedprice) FROM probe.ns.li")
    }
    time("native agg 1col") {
      spark.read.parquet(mirror).agg(sum("l_extendedprice"))
    }
    // count(*) — empty projection path
    time("catalog count(*)") { spark.sql("SELECT * FROM probe.ns.li") }
    time("native count(*)") { spark.read.parquet(mirror) }

    spark.stop()
  }
}
