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
  private val releaseHooks = scala.collection.mutable.ArrayBuffer[() => Unit]()

  /** Persist `df` (memory-and-disk) and track it for later release. */
  def materialize(df: DataFrame): DataFrame = synchronized {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    live += df
    df
  }

  private val sharedLive = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** [[materialize]] for frames registered DURING a shared-build memo's
    * build (the PCA covariance and power rounds, the BPE round winners,
    * the incremental-components contraction frame): tracked separately so
    * [[passReset]] can UNPERSIST them along with clearing the memos.
    * Without this, a rebuild whose plan is canonically identical across
    * passes is a CacheManager hit (it keys on the canonical plan) — the
    * "one honest build per pass" contract would silently report the
    * cached-prefix cost from pass 2 on, and `live` would accumulate a
    * duplicate registration per pass. Frames that hold PREP a deployment
    * persists (stored labels, input spools, table reads) stay on
    * [[materialize]] and survive passes. */
  def materializeShared(df: DataFrame): DataFrame = synchronized {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    sharedLive += df
    df
  }

  /** Register a callback to run on every [[releaseAll]] — for operator
    * modules that keep DERIVED state built from registry caches (e.g. the
    * components memo): a release that cleared the caches but left such a
    * memo in place would serve stale results if the underlying data changed
    * before the next build. Hook registration keeps the registry
    * operator-agnostic (idempotent hooks; registered once per module). */
  def onRelease(hook: () => Unit): Unit = synchronized {
    releaseHooks += hook
  }

  private val passResetHooks = scala.collection.mutable.ArrayBuffer[() => Unit]()

  /** Register a callback for [[passReset]] — for SHARED-BUILD memos whose
    * build is graded work (the components index, the PCA basis, the BPE
    * rounds): Bench resets these before each timed pass so exactly one
    * honest build is measured per pass (whichever consumer runs first
    * pays; the others read the shared frame — the real serving shape).
    * Contrast with [[onRelease]]-only memos, which hold PREP a deployment
    * keeps as persisted state (stored labels, landing spools, the table
    * read cache) and survive across passes. */
  def onPassReset(hook: () => Unit): Unit = synchronized {
    passResetHooks += hook
  }

  /** Clear every shared-build memo (see [[onPassReset]]) AND unpersist the
    * frames those builds registered via [[materializeShared]] — called by
    * Bench before each timed pass, so the next pass's rebuild re-executes
    * the build instead of reading a canonical-plan cache hit. */
  def passReset(): Unit = synchronized {
    sharedLive.foreach(_.unpersist(blocking = false))
    sharedLive.clear()
    passResetHooks.foreach(_.apply())
  }

  /** Unpersist every tracked index (non-blocking), clear the registry, and
    * run the registered release + pass-reset hooks. */
  def releaseAll(): Unit = synchronized {
    live.foreach(_.unpersist(blocking = false))
    live.clear()
    sharedLive.foreach(_.unpersist(blocking = false))
    sharedLive.clear()
    releaseHooks.foreach(_.apply())
    passResetHooks.foreach(_.apply())
  }

  /** Number of currently tracked materializations (for tests). */
  def trackedCount: Int = synchronized(live.size)
}
