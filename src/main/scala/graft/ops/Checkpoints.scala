package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-cut hygiene for iterative operators.
  *
  * `localCheckpoint` pins its materialized blocks in the BlockManager
  * until the RDD object is GC'd and the async ContextCleaner gets to
  * it — in an iterative loop that's one pinned copy of the working set
  * PER ROUND, and in a long-lived session (a bench or test run
  * executing hundreds of queries in one JVM) the superseded rounds
  * accumulate into real memory pressure that evicts other queries'
  * blocks and inflates their runtimes. Tracking the RDD ids a
  * checkpoint pinned lets a loop release each round the moment the
  * next one is materialized, bounding pinned memory at ~2 rounds
  * regardless of iteration count.
  */
private[graft] object Checkpoints {

  /** Eager localCheckpoint plus the ids of the RDDs it pinned. The ids
    * are diffed around the checkpoint call; this session issues jobs
    * sequentially, so the diff only ever sees our own RDDs. */
  def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val pre = sc.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint()
    (out, sc.getPersistentRDDs.keySet.toSet -- pre)
  }

  /** Release blocks pinned by a superseded checkpoint. Non-blocking:
    * the next round's compute overlaps the cleanup. */
  def releasePinned(df: DataFrame, ids: Set[Int]): Unit = {
    val persisted = df.sparkSession.sparkContext.getPersistentRDDs
    ids.foreach(id => persisted.get(id).foreach(_.unpersist(blocking = false)))
  }
}
