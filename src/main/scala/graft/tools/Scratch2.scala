package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    val d = "/root/testdata/sf0.01"
    import graft.queries.QH._
    val wCum = Window.partitionBy("user_id")
      .orderBy(unix_timestamp(col("ts")), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w24 = Window.partitionBy("user_id")
      .orderBy(unix_timestamp(col("ts"))).rangeBetween(-86400L, 0L)
    t(spark, d, "events")
      .withColumn("t", unix_timestamp(col("ts")))
      .withColumn("equity", sum(col("value").cast(DEC)).over(wCum).cast("string").cast("double"))
      .withColumn("anchor", first(col("equity")).over(w24))
      .withColumn("s1", sum((col("value") * col("t")).cast(DEC)).over(w24).cast("string").cast("double"))
      .withColumn("s0", sum(col("value").cast(DEC)).over(w24).cast("string").cast("double"))
      .withColumn("wf", (col("s1") + (lit(86400.0) - col("t")) * col("s0")) / 86400.0)
      .withColumn("den", col("anchor") + col("wf") + 100.0)
      .select("event_id", "t", "equity", "anchor", "s1", "s0", "wf", "den")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/q63_debug")
    spark.stop()
  }
}
