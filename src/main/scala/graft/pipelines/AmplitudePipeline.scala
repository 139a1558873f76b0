package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.graph.{Mode, Registry, TableDef}

/** Product-analytics sessionization (zetadex-amplitude-events-pipeline
  * .py): wallet-connect events open usage windows that attribute every
  * subsequent event to a wallet, until the next connect.
  *
  * Input: an events frame (ts, device_id, event_type, wallet). Connects
  * are rows with a non-null wallet; AM:141–167 builds the windows with
  * row_number + lead (null → 9999-12-31), AM:186–197 joins events into
  * them by interval containment.
  */
object AmplitudePipeline {

  val EndOfTime = "9999-12-31 00:00:00"

  def build(spark: SparkSession, events: () => DataFrame): Registry = {
    val reg = new Registry(spark)
    reg.source("raw_amplitude_events", events)

    // wallet connect sequence per device (AM:141–167: W2 row_number +
    // W3 lead, null-capped usage_end)
    reg.register(TableDef("cleaned_wallet_connects",
      Seq("raw_amplitude_events"), { case Seq(ev) =>
        val w = Window.partitionBy("device_id").orderBy("ts")
        ev.filter(col("wallet").isNotNull)
          .withColumn("connect_seq", row_number().over(w))
          .withColumn("usage_start", col("ts"))
          .withColumn("usage_end",
            coalesce(lead(col("ts"), 1).over(w),
              lit(EndOfTime).cast("timestamp")))
          .select("device_id", "wallet", "connect_seq",
            "usage_start", "usage_end")
      }, mode = Mode.Full))

    // attribute every event to the wallet whose window contains it
    // (AM:186–197: equi key + interval-containment residual, J7)
    reg.register(TableDef("cleaned_amplitude_events",
      Seq("raw_amplitude_events", "cleaned_wallet_connects"), {
        case Seq(ev, wc) =>
          // wc derives from ev → rename its columns to disambiguate the
          // self-join lineage
          val w = wc.select(
            col("device_id").as("wc_device_id"),
            col("wallet").as("attributed_wallet"),
            col("connect_seq"), col("usage_start"), col("usage_end"))
          ev.join(w,
              col("device_id") === col("wc_device_id") &&
                col("ts") >= col("usage_start") && col("ts") < col("usage_end"),
              "left")
            .select(col("ts"), col("device_id"), col("event_type"),
              col("attributed_wallet"), col("connect_seq"))
      }, mode = Mode.Full))

    reg
  }
}
