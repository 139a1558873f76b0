package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** DAG executors — the engine's stand-in for the DLT runtime's two
  * update modes (SURVEY.md §1.1, §2.11).
  *
  * Batch: topological materialization of every registered table.
  *
  * Streaming: tables flagged [[Mode.Incremental]] run as one fused
  * Structured Streaming query per leaf (micro-batch, Trigger.AvailableNow
  * for a catch-up run — the hourly-cluster cadence of the reference,
  * transactions:926); tables flagged [[Mode.Full]] are batch-recomputed
  * from the materialized incremental outputs afterwards, exactly like the
  * reference forces window-function gold tables to `dlt.read`
  * (orderbook:571–574).
  */
object Runner {

  /** Materialize every table batch-style under `outDir`, in topo order,
    * honoring each table's partition columns (the reference's
    * `partition_cols=["date_"]` convention, transactions:996). Returns
    * the materialized paths. */
  def runBatch(reg: Registry, outDir: String): Map[String, String] =
    reg.topoOrder.map { name =>
      val path = s"$outDir/$name"
      val parts = reg.describe(name).map(_.partitionCols).getOrElse(Nil)
      val w = reg.resolve(name).write.mode("overwrite")
      (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(path)
      name -> path
    }.toMap

  /** Run the DAG with streaming sources: every Incremental table whose
    * consumers include a Full table (or which has no registered consumer)
    * is a streaming MATERIALIZATION BOUNDARY — it runs as one
    * `writeStream` job (checkpointed under `outDir/_checkpoints`), and
    * Full tables then batch-read the materialized parquet.
    *
    * `streamSources` must map every source name to a streaming DataFrame
    * factory; transforms are reused untouched — the engine's transforms
    * are mode-agnostic by construction.
    */
  def runStreamingThenFull(spark: SparkSession, reg: Registry,
                           streamSources: Map[String, () => DataFrame],
                           outDir: String): Map[String, String] = {
    val defs = reg.topoOrder.map(n => n -> reg.describe(n)).toMap
    val incremental = reg.topoOrder.filter(n => defs(n).exists(_.mode == Mode.Incremental))
    val full = reg.topoOrder.filter(n => defs(n).exists(_.mode == Mode.Full))

    // boundaries: incremental tables consumed by a Full table, or by nothing
    val consumers: Map[String, Seq[TableDef]] =
      reg.topoOrder.flatMap(n => defs(n)).flatMap(t => t.deps.map(_ -> t))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val boundaries = incremental.filter { n =>
      consumers.get(n).forall(_.isEmpty) ||
        consumers.getOrElse(n, Seq.empty).exists(_.mode == Mode.Full)
    }

    // one streaming resolver whose sources are the streaming frames;
    // sources NOT being streamed stay batch loaders — the stream-static
    // join pattern (a streaming table may read a dim batch-style)
    val streamReg = new Registry(spark)
    reg.sourceLoaders.foreach { case (n, f) =>
      if (!streamSources.contains(n)) streamReg.source(n, f)
    }
    streamSources.foreach { case (n, f) => streamReg.source(n, f) }
    reg.topoOrder.flatMap(defs(_)).foreach(streamReg.register)

    val written = boundaries.map { name =>
      val path = s"$outDir/$name"
      val q = streamReg.resolve(name).writeStream
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", s"$outDir/_checkpoints/$name")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      name -> path
    }.toMap

    // Full tables batch-read the materialized boundaries; static
    // sources (never streamed, never a boundary) keep their loaders
    val batchReg = new Registry(spark)
    reg.sourceLoaders.foreach { case (n, f) =>
      if (!written.contains(n)) batchReg.source(n, f)
    }
    written.foreach { case (n, p) =>
      batchReg.source(n, () => spark.read.parquet(p))
    }
    full.flatMap(defs(_)).foreach(batchReg.register)
    val fullOut = full.map { name =>
      val path = s"$outDir/$name"
      batchReg.resolve(name).write.mode("overwrite").parquet(path)
      name -> path
    }.toMap
    written ++ fullOut
  }
}
