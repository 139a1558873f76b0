package graft.graph

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
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
      val t = reg.describe(name)
      val parts = t.map(_.partitionCols).getOrElse(Nil)
      val df = reg.resolve(name)
      t.map(_.writeMode).getOrElse(WriteMode.Overwrite) match {
        case WriteMode.Overwrite =>
          val w = df.write.mode("overwrite")
          (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(path)
        case WriteMode.Append =>
          // K3 idempotent append: overwrite ONLY the partitions this run
          // produced (mm-uptime's hourly cadence); a re-run of the same
          // batch replaces its own partitions instead of doubling rows
          require(parts.nonEmpty,
            s"WriteMode.Append on '$name' needs partitionCols identifying the batch")
          df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(parts: _*).parquet(path)
        case WriteMode.Upsert(keys, seqCol, tie) =>
          if (parts.nonEmpty)
            upsertParquetPruned(path, keys, seqCol, tie, parts)(df)
          else upsertParquet(path, keys, seqCol, tie)(df)
      }
      name -> path
    }.toMap

  /** Merge `batch` into the parquet table at `path`, keeping the
    * max-`(seqCol, tieBreak)` row per `keys` — the parquet-native
    * `MERGE` used by [[WriteMode.Upsert]] tables and by the streaming
    * `foreachBatch` upsert sink. Copy-on-write: the merged generation is
    * staged next to the table and swapped in, so a reader never sees a
    * half-written table and a crashed merge leaves the old generation
    * intact. The rewrite is O(table) per batch — correct anywhere, and
    * the right default for unpartitioned tables; a hive-partitioned
    * table whose partition columns are stable per key should use
    * [[upsertParquetPruned]], which rewrites only touched partitions.
    * Idempotent: re-delivering a micro-batch cannot change the max row
    * per key.
    */
  def upsertParquet(path: String, keys: Seq[String], seqCol: String,
                    tieBreak: Seq[String] = Nil)(batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val target = new HPath(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val unioned =
      if (fs.exists(target))
        spark.read.parquet(path).unionByName(batch, allowMissingColumns = true)
      else batch
    val merged = graft.ops.Relational.applyChanges(
      keys, col(seqCol), tieBreak.map(col))(unioned)
    val staging = new HPath(path + ".staging")
    // the staging write MATERIALIZES the merge before the old generation
    // is touched — the read above is consumed entirely by this job
    merged.write.mode("overwrite").parquet(staging.toString)
    fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"upsert swap failed for $path")
  }

  /** Partition-pruned upsert — the 100 TB shape of [[upsertParquet]] for
    * hive-partitioned tables whose partition columns are FUNCTIONALLY
    * DEPENDENT on the merge keys (a key never changes partitions: a
    * key-hash bucket, an account's region, an asset's venue). Only the
    * partitions present in the batch are read (partition pruning at the
    * file index — the predicate is on partition columns only), merged,
    * and rewritten via dynamic partition overwrite; untouched partitions
    * are never read or written, so per-batch cost is O(touched
    * partitions), what Delta/Iceberg MERGE achieves with file pruning.
    * The touched-partition list is a driver collect at METADATA scale
    * (distinct partition tuples in one batch), not data scale. If a key
    * could move partitions, use [[upsertParquet]] — a pruned merge would
    * strand the key's old row in its previous partition.
    */
  def upsertParquetPruned(path: String, keys: Seq[String], seqCol: String,
                          tieBreak: Seq[String], partitionCols: Seq[String])(
      batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val target = new HPath(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val merge = graft.ops.Relational.applyChanges(
      keys, col(seqCol), tieBreak.map(col)) _
    if (!fs.exists(target)) {
      merge(batch).write.mode("overwrite")
        .partitionBy(partitionCols: _*).parquet(path)
    } else {
      val touched = batch.select(partitionCols.map(col): _*).distinct()
        .collect()
      val touchedPred = touched.map { r =>
        partitionCols.zipWithIndex
          .map { case (c, i) => col(c) <=> lit(r.get(i)) }
          .reduce(_ && _)
      }.reduceOption(_ || _).getOrElse(lit(false))
      // declared schema (the batch's) on the partitioned read: partition
      // column types must not drift via directory-name inference, or the
      // union would mismatch
      val existing = spark.read.schema(batch.schema).parquet(path)
        .filter(touchedPred)
      val merged = merge(existing.unionByName(batch,
        allowMissingColumns = true))
      // stage the merged partitions first: Spark refuses (and could not
      // safely execute) an overwrite of a path its own plan is reading
      val staging = new HPath(path + ".staging")
      merged.write.mode("overwrite").parquet(staging.toString)
      spark.read.parquet(staging.toString)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCols: _*).parquet(path)
      fs.delete(staging, true)
    }
  }

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
      val checkpoint = s"$outDir/_checkpoints/$name"
      val q = defs(name).map(_.writeMode).getOrElse(WriteMode.Overwrite) match {
        case WriteMode.Upsert(keys, seqCol, tie) =>
          // §2.10 streaming apply_changes as a sink: update-mode batches
          // carry the changed keys' latest rows; each micro-batch MERGEs
          // into the table (foreachBatch = the OSS seam where DLT calls
          // Delta MERGE, zetaflex-pipeline.py:138–151). Replay-safe: the
          // merge is idempotent, so at-least-once foreachBatch delivery
          // still converges to exactly the batch apply_changes result.
          val parts = defs(name).map(_.partitionCols).getOrElse(Nil)
          streamReg.resolve(name).writeStream
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .foreachBatch { (batch: DataFrame, _: Long) =>
              if (parts.nonEmpty)
                upsertParquetPruned(path, keys, seqCol, tie, parts)(batch)
              else upsertParquet(path, keys, seqCol, tie)(batch)
            }
            .trigger(Trigger.AvailableNow())
            .start()
        case _ =>
          // parquet file sink: append-only with an exactly-once sink log
          streamReg.resolve(name).writeStream
            .format("parquet")
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .trigger(Trigger.AvailableNow())
            .start()
      }
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
