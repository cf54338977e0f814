package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deferred-release persist registry for intermediates that must stay
  * lazy (they back a returned frame, so an in-function try/finally
  * would unpersist before the caller's action runs) but whose plan
  * loses measurably to recomputation (multi-consumer corpus-scale
  * tables). Each callsite key holds at most ONE cached intermediate:
  * registering a new one unpersists the previous call's, so a
  * long-lived session's cache stays bounded instead of accumulating
  * per query. The serving layer drains the whole registry at request
  * boundaries via [[releaseAll]] (surfaced as
  * `graft.operators.Dedup.releaseCaches()`).
  */
object DfCache {

  private val held = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Cache `df` under the callsite key, releasing the key's previous
    * occupant. Returns the SAME frame (persist is lazy). */
  def holdCached(key: String, df: DataFrame): DataFrame = synchronized {
    val prev = held.put(key, df)
    // blocking: the registry's contract is "bounded live cache", which
    // tests pin by counting persisted RDDs — async removal would make
    // that count (and executor memory accounting) timing-dependent.
    if (prev != null && (prev ne df) && !planStillHeld(prev)) {
      prev.unpersist(blocking = true); ()
    }
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Spark's CacheManager dedupes logically-equal plans into ONE
    * shared InMemoryRelation across persist calls, so unpersisting an
    * evicted frame would also evict every equal-plan holder still in
    * the registry — and force a fresh re-persist (a NEW RDD) on that
    * holder's next registration, growing the persisted-RDD set across
    * passes when two keys share a plan (e.g. jaccard's and
    * containment's capped posting tables since r13). Skip the
    * unpersist while any live entry — including the just-registered
    * frame — resolves to the same canonical plan; the last equal-plan
    * holder to leave the registry releases the relation. holdCached /
    * releaseAll synchronize on this object: without the lock, two
    * threads concurrently evicting the LAST two equal-plan holders
    * would each see the other still registered, both skip the
    * unpersist, and the shared relation would leak until releaseAll.
    * No same-reference exclusion: a frame registered under TWO keys is
    * still a live holder when one key evicts it (held.put already
    * removed it from the evicting key, so any remaining same-reference
    * entry is another key's), and sameResult is trivially true for the
    * same reference — excluding it would unpersist the other key's
    * live cache, the exact case this guard exists to prevent. */
  private def planStillHeld(evicted: DataFrame): Boolean = {
    val p = evicted.queryExecution.analyzed
    held.values.stream().anyMatch(h => h.queryExecution.analyzed.sameResult(p))
  }

  /** Release every deferred-release intermediate (idempotent). */
  def releaseAll(): Unit = synchronized {
    held.values.forEach(df => { df.unpersist(blocking = true); () })
    held.clear()
  }

  /** Live entries (test/observability hook for the drain contract). */
  def heldCount: Int = held.size
}
