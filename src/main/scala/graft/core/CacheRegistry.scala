package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Registry for operator-internal persisted frames.
  *
  * Operators persist subtrees that are consumed more than once within one
  * query (shingle tables, LSH candidate sets, label-propagation rounds) —
  * required for correctness of cost: Catalyst re-executes the whole subtree
  * per consumer otherwise. The persist is right *per query*, but a
  * long-lived JVM running a whole suite accumulates storage across queries,
  * causing eviction churn and memory pressure (round 1's bench death).
  *
  * Operators therefore route such persists through [[persist]]; the harness
  * (Bench / Verify / specs) calls [[drain]] after it has fully consumed each
  * query's result. Unpersisting an already-released frame is a no-op, so
  * operators that release eagerly mid-query (e.g. per-round caches in
  * [[graft.ops.Dedup.clusters]]) can still register every frame.
  *
  * Cross-query memoized caches (the star-schema fact, the staged SCD2 diff)
  * are deliberately NOT registered here — they are bounded (one per source
  * dir) and shared across queries; release those via
  * [[graft.SparkEntry.clearCaches]] at suite end.
  */
object CacheRegistry {

  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]

  /** Persist `ds` and register it for a later [[drain]]. */
  def persist[T](ds: Dataset[T],
                 level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    frames.add(ds)
    ds
  }

  /** Unpersist every registered frame; returns how many were released. */
  def drain(): Int = {
    var n = 0
    var d = frames.poll()
    while (d != null) {
      d.unpersist()
      n += 1
      d = frames.poll()
    }
    n
  }

  def size: Int = frames.size
}
