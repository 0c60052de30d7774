package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge into `private[sql]` plan internals for deterministic release of
  * localCheckpoint storage (the public API persists the checkpointed RDD
  * but exposes no unpersist — blocks otherwise linger until the
  * ContextCleaner GCs the reference, which a long-lived bench JVM running
  * hundreds of queries cannot afford; see
  * [[graft.core.CacheRegistry.checkpoint]]). */
object CheckpointOps {

  /** Eagerly localCheckpoint `df`; returns the checkpointed frame and a
    * release handle that unpersists the underlying RDD blocks (idempotent,
    * non-blocking). */
  def eagerLocal(df: DataFrame): (DataFrame, () => Unit) = {
    val ck = df.localCheckpoint()
    val release: () => Unit = ck.queryExecution.logical match {
      case lr: LogicalRDD => () => { lr.rdd.unpersist(blocking = false); () }
      case _              => () => ()
    }
    (ck, release)
  }
}
