package graft.core

import scala.collection.mutable.ArrayBuffer

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
  * Two release mechanisms, safe to combine:
  *
  *   - [[scoped]] — the preferred form. The harness (and any library
  *     caller) wraps one query's build-and-consume in `scoped { ... }`;
  *     every frame the calling thread registers inside the block is
  *     unpersisted when the block exits. Scopes are per-thread, so two
  *     queries in flight on different threads cannot release each other's
  *     frames, and a global [[drain]] issued elsewhere never touches an
  *     open scope's frames.
  *   - [[drain]] — the legacy global release. Only frames registered
  *     OUTSIDE any scope land in the global queue; `drain()` releases
  *     exactly those. Callers that never drain and never scope leak
  *     storage — that is the documented cost of ignoring both.
  *
  * Frames registered on a thread the caller spawned inside `scoped` (not
  * the scope's own thread) fall through to the global queue: scope
  * membership is thread-confined by design, matching how these operators
  * build their plans (driver-side, single-threaded per query).
  *
  * Cross-query memoized caches (the star-schema fact, the staged SCD2 diff)
  * are deliberately NOT registered here — they are bounded (one per source
  * dir) and shared across queries; release those via
  * [[graft.SparkEntry.clearCaches]] at suite end.
  */
object CacheRegistry {

  private val global = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]

  private val scopes = new ThreadLocal[List[ArrayBuffer[() => Unit]]] {
    override def initialValue(): List[ArrayBuffer[() => Unit]] = Nil
  }

  private def register(release: () => Unit): Unit =
    scopes.get() match {
      case head :: _ => head += release
      case Nil       => global.add(release)
    }

  /** Persist `ds` and register it for release — with the calling thread's
    * innermost open [[scoped]] block if one is active, else globally for a
    * later [[drain]]. */
  def persist[T](ds: Dataset[T],
                 level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    register(() => { ds.unpersist(); () })
    ds
  }

  /** Eager localCheckpoint with the SAME release contract as [[persist]]:
    * materialize + lineage cut in one job, and the checkpointed blocks are
    * unpersisted at scope exit / [[drain]] instead of lingering until the
    * ContextCleaner GCs them — iterative operators (label propagation)
    * checkpoint once per round, so deterministic release is the difference
    * between flat storage and rounds × labels of zombie blocks. */
  def checkpoint(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val (ck, release) = org.apache.spark.sql.graft.CheckpointOps.eagerLocal(df)
    register(release)
    ck
  }

  /** Run `body` in a fresh cache scope: frames the calling thread registers
    * inside it are unpersisted when the block exits (normally or not).
    * Nests; inner scopes release first. Unpersisting an already-released
    * frame is a no-op, so operators that release eagerly mid-query can
    * still register every frame. */
  def scoped[A](body: => A): A = {
    val buf = ArrayBuffer.empty[() => Unit]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(_.apply())
    }
  }

  /** Release every globally-registered frame (frames inside open scopes
    * are untouched); returns how many were released. */
  def drain(): Int = {
    var n = 0
    var d = global.poll()
    while (d != null) {
      d()
      n += 1
      d = global.poll()
    }
    n
  }

  /** Globally-registered frames awaiting a [[drain]] (excludes open scopes). */
  def size: Int = global.size
}
