package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for iterative localCheckpoint loops.
  *
  * `Dataset.unpersist` only removes CacheManager entries; the blocks a
  * `localCheckpoint` writes belong to an INTERNAL RDD referenced by the
  * plan's [[LogicalRDD]] leaf and are otherwise freed only by the
  * ContextCleaner after that RDD object is GC'd (Bench documents the
  * same mechanism for its per-query System.gc nudge). A loop that
  * checkpoints a full closure per round would therefore stack one
  * closure-sized block set per round in the block manager until a GC
  * happens to run — on a 1000-executor cluster that is silent memory
  * pressure on every executor's storage pool.
  */
private[graft] object Checkpoints {

  /** Free the block-manager storage behind a localCheckpoint'd Dataset
    * NOW, by unpersisting the underlying checkpointed RDD(s) found at
    * the plan's LogicalRDD leaves. Safe only once every downstream
    * consumer of the checkpointed data has materialized (eager
    * localCheckpoint of the successor round satisfies this).
    */
  def free(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr
    }.foreach(_.rdd.unpersist(blocking = false))
}
