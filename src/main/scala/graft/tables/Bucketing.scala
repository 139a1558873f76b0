package graft.tables

import org.apache.spark.sql.DataFrame

/** Bucketed materialization for co-located joins (the "optimize for
  * scale" lever the reference leaves to Databricks): two fact tables
  * bucketed by the same join key into the same bucket count join WITHOUT
  * a shuffle exchange — at 100 TB the dominant cost of repeated
  * fact-fact joins (e.g. lineitem ⋈ orders every hour). Requires catalog
  * tables (`saveAsTable`); BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    // the in-memory catalog is per-session but the warehouse directory
    // outlives the JVM: a location left by a previous run would fail
    // CREATE TABLE even in overwrite mode (the session has no catalog
    // entry to overwrite), so clear both catalog entry and location
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
