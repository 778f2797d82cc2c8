package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle owner for the materialized indexes some operators build at
  * plan-construction time (the shingle inverted index, the TF-IDF term
  * table, the IVF cell assignment).
  *
  * Spark re-evaluates plan subtrees referenced more than once, so those
  * builders persist their index DataFrame — but `persist` at construction
  * time with no matching `unpersist` accumulates cache entries for the
  * session lifetime when the same query is built across several scale
  * factors. Every such persist goes through [[materialize]] instead, and the
  * harness (Verify / Bench / tests) calls [[releaseAll]] when it is done
  * with the plans it built. Spark's CacheManager keys on the canonical plan,
  * so registering the same logical index twice still stores one copy;
  * unpersisting it twice is a no-op.
  */
object CacheRegistry {
  private val live = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Persist `df` (memory-and-disk) and track it for later release. */
  def materialize(df: DataFrame): DataFrame = synchronized {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    live += df
    df
  }

  /** Unpersist every tracked index (non-blocking) and clear the registry.
    * Also drops the components memo (LlmOps) — it holds checkpoint-backed
    * DataFrames built FROM these caches, so a release that left it in place
    * would serve a stale clustering if the underlying data changed before
    * the next build. */
  def releaseAll(): Unit = synchronized {
    live.foreach(_.unpersist(blocking = false))
    live.clear()
    operators.LlmOps.clearComponentsMemo()
  }

  /** Number of currently tracked materializations (for tests). */
  def trackedCount: Int = synchronized(live.size)
}
