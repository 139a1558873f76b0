package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc local probe main; not part of the engine API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.select(col("event_id"), col("ts"), date_trunc("hour", col("ts")),
      unix_timestamp(col("ts"))).show(3, false)
    spark.stop()
  }
}
