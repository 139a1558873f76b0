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

  /** Write one resolved table per its [[WriteMode]]. Returns true when
    * the on-disk table now carries state BEYOND this run's plan (Append
    * accumulates partitions, Upsert merges history) — the signal that
    * downstream consumers must READ the materialized table rather than
    * re-derive its plan, or they would compute from this run's partial
    * view of an accumulating table. */
  private def writeTable(df: DataFrame, t: Option[TableDef],
                         path: String): Boolean = {
    val parts = t.map(_.partitionCols).getOrElse(Nil)
    t.map(_.writeMode).getOrElse(WriteMode.Overwrite) match {
      case WriteMode.Overwrite =>
        val w = df.write.mode("overwrite")
        (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(path)
        false
      case WriteMode.Append =>
        // K3 idempotent append: overwrite ONLY the partitions this run
        // produced (mm-uptime's hourly cadence); a re-run of the same
        // batch replaces its own partitions instead of doubling rows
        require(parts.nonEmpty,
          s"WriteMode.Append needs partitionCols identifying the batch ($path)")
        df.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(parts: _*).parquet(path)
        true
      case WriteMode.Upsert(keys, seqCol, tie) =>
        // checkEmpty=false: a batch-mode plan is essentially never empty
        // and the emptiness probe would execute the full plan once more
        if (parts.nonEmpty)
          upsertParquetPruned(path, keys, seqCol, tie, parts,
            checkEmpty = false)(df)
        else upsertParquet(path, keys, seqCol, tie, checkEmpty = false)(df)
        true
    }
  }

  /** Materialize every table batch-style under `outDir`, in topo order,
    * honoring each table's partition columns (the reference's
    * `partition_cols=["date_"]` convention, transactions:996) and write
    * mode. After a STATEFUL table (Append/Upsert) is written, its name is
    * shadowed by a read of the materialized path, so downstream consumers
    * see the full accumulated table — matching how the streaming runner's
    * Full tables read materialized boundaries. Returns the materialized
    * paths. */
  def runBatch(reg: Registry, outDir: String): Map[String, String] = {
    val spark = reg.session
    val work = new Registry(spark)
    reg.sourceLoaders.foreach { case (n, f) => work.source(n, f) }
    reg.topoOrder.flatMap(reg.describe).foreach(work.register)
    reg.topoOrder.map { name =>
      val path = s"$outDir/$name"
      val df = work.resolve(name)
      // shadow with the PLAN's schema, not directory inference — a read
      // without it re-types partition columns from directory names
      // (string "00" → int 0) and reorders them to the end, silently
      // changing what downstream consumers see
      val planSchema = df.schema
      val stateful = writeTable(df, work.describe(name), path)
      if (stateful)
        work.source(name, () => spark.read.schema(planSchema).parquet(path))
      name -> path
    }.toMap
  }

  /** Merge `batch` into the parquet table at `path`, keeping the
    * max-`(seqCol, tieBreak)` row per `keys` — the parquet-native
    * `MERGE` used by [[WriteMode.Upsert]] tables and by the streaming
    * `foreachBatch` upsert sink. Copy-on-write with a two-rename swap:
    * the merged generation is staged, the old generation moves aside to
    * `<path>.old`, the new one renames into place, and only then is the
    * backup dropped — every crash point leaves either the old or the new
    * complete generation recoverable (the `.old` restore on entry), so a
    * replayed micro-batch merges against intact history. The rewrite is
    * O(table) per batch — correct anywhere, and the right default for
    * unpartitioned tables; a hive-partitioned table whose partition
    * columns are stable per key should use [[upsertParquetPruned]],
    * which rewrites only touched partitions. Idempotent: re-delivering a
    * micro-batch cannot change the max row per key.
    */
  def upsertParquet(path: String, keys: Seq[String], seqCol: String,
                    tieBreak: Seq[String] = Nil, checkEmpty: Boolean = true)(
      batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val target = new HPath(path)
    val backup = new HPath(path + ".old")
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    // recovery: a crash between the two swap renames below leaves no
    // target but an intact backup — restore it before merging. The
    // restore MUST succeed or stop the merge: proceeding would treat
    // the table as empty and the later backup delete would destroy the
    // only surviving generation.
    if (!fs.exists(target) && fs.exists(backup) &&
        !fs.rename(backup, target))
      throw new java.io.IOException(s"upsert recovery rename failed for $path")
    // no-data micro-batches (watermark-advance triggers) must not pay an
    // O(table) rewrite — the merge result would be identical. Skipped in
    // batch mode (checkEmpty=false), where the probe would re-execute a
    // full plan that is essentially never empty.
    if (checkEmpty && batch.isEmpty) return
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
    fs.delete(backup, true) // stale backup from a completed prior swap
    if (fs.exists(target) && !fs.rename(target, backup))
      throw new java.io.IOException(s"upsert swap: backup rename failed for $path")
    if (!fs.rename(staging, target))
      // old generation still intact at .old — recovered on next entry
      throw new java.io.IOException(s"upsert swap failed for $path")
    fs.delete(backup, true)
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
    *
    * Durability granularity: the dynamic overwrite commits per
    * partition, so a crash mid-commit can leave SOME touched partitions
    * on the new generation and some on the old — each partition is
    * individually complete, and replaying the batch re-merges both to
    * the same final state (merge idempotence). That is a weaker
    * all-or-nothing story than [[upsertParquet]]'s whole-table swap —
    * the price of not rewriting untouched partitions; a table format
    * with a commit log (Delta/Iceberg) is the production answer.
    */
  def upsertParquetPruned(path: String, keys: Seq[String], seqCol: String,
                          tieBreak: Seq[String], partitionCols: Seq[String],
                          checkEmpty: Boolean = true)(
      batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val target = new HPath(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    // no-data micro-batch: nothing to merge (see upsertParquet)
    if (checkEmpty && batch.isEmpty) return
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
      // declared read schema: the batch's fields keep their declared
      // types (partition-column types must not drift via directory-name
      // inference, or the union would mismatch) and on-disk columns
      // ABSENT from this batch ride along, so a pruned rewrite cannot
      // drop data from rows the batch never touched. mergeSchema: a
      // column that exists only in SOME files must still be discovered —
      // single-footer sampling would miss it and the rewrite would erase
      // it from the files that have it. The probe is scoped to the
      // TOUCHED partition directories (only their columns can be
      // erased), keeping the per-batch cost O(touched partitions) as
      // documented — except when a touched partition value is null,
      // whose hive dir encoding is private; that rare case pays the
      // full-table probe.
      val touchedDirs =
        if (touched.exists(r => (0 until partitionCols.length)
            .exists(r.isNullAt)))
          Seq(path)
        else touched.toSeq.map { r =>
          partitionCols.zipWithIndex
            .map { case (c, i) => s"$c=${r.get(i)}" }
            .mkString(s"$path/", "/", "")
        }.filter(dir => fs.exists(new HPath(dir)))
      val extra =
        if (touchedDirs.isEmpty) Array.empty[org.apache.spark.sql.types.StructField]
        else spark.read.option("mergeSchema", "true")
          .parquet(touchedDirs: _*).schema.fields
          .filterNot(f => batch.schema.fieldNames.contains(f.name))
      val readSchema =
        org.apache.spark.sql.types.StructType(batch.schema.fields ++ extra)
      val existing = spark.read.schema(readSchema).parquet(path)
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
      val resolved = streamReg.resolve(name)
      val q = defs(name).map(_.writeMode).getOrElse(WriteMode.Overwrite) match {
        case WriteMode.Upsert(keys, seqCol, tie) =>
          // §2.10 streaming apply_changes as a sink: update-mode batches
          // carry the changed keys' latest rows; each micro-batch MERGEs
          // into the table (foreachBatch = the OSS seam where DLT calls
          // Delta MERGE, zetaflex-pipeline.py:138–151). Replay-safe: the
          // merge is idempotent, so at-least-once foreachBatch delivery
          // still converges to exactly the batch apply_changes result.
          val parts = defs(name).map(_.partitionCols).getOrElse(Nil)
          resolved.writeStream
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
          resolved.writeStream
            .format("parquet")
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .trigger(Trigger.AvailableNow())
            .start()
      }
      q.awaitTermination()
      // the boundary's PLAN schema, for the same reason as runBatch:
      // consumers must not see directory-inference re-typing
      name -> (path, resolved.schema)
    }.toMap
    // A terminated query's state-store providers stay loaded in the
    // executor cache (in-memory version maps + a maintenance thread
    // each); a long-lived shared JVM running many catch-up jobs
    // accumulates them into heap pressure on unrelated work. Providers
    // reload lazily from the checkpoint on the next run, so unloading
    // here is pure hygiene. Reflection because the API is private[sql];
    // a no-op if it ever disappears.
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      cls.getMethod("unloadAll").invoke(cls.getField("MODULE$").get(null))
    } catch { case _: Throwable => () }

    // Full tables batch-read the materialized boundaries; static
    // sources (never streamed, never a boundary) keep their loaders
    val batchReg = new Registry(spark)
    reg.sourceLoaders.foreach { case (n, f) =>
      if (!written.contains(n)) batchReg.source(n, f)
    }
    written.foreach { case (n, (p, schema)) =>
      batchReg.source(n, () => spark.read.schema(schema).parquet(p))
    }
    full.flatMap(defs(_)).foreach(batchReg.register)
    val fullOut = full.map { name =>
      val path = s"$outDir/$name"
      // same write dispatch and stateful-shadowing as runBatch: a Full
      // table with Append/Upsert semantics accumulates across runs, and
      // its consumers must read the accumulated table (with the plan's
      // schema — see runBatch)
      val df = batchReg.resolve(name)
      val planSchema = df.schema
      val stateful = writeTable(df, defs(name), path)
      if (stateful)
        batchReg.source(name, () => spark.read.schema(planSchema).parquet(path))
      name -> path
    }.toMap
    written.view.mapValues(_._1).toMap ++ fullOut
  }
}
