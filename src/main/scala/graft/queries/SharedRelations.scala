package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialized base relations.
  *
  * Several query families derive from the same intermediate (the
  * orders-derived edge list, the shingle relation, the normalized
  * embedding table). Rebuilding those per query repeats the scan +
  * shuffle; this cache persists each one once per (session, sfDir) —
  * the Spark-native analogue of a materialized view in the catalog.
  * At cluster scale these would be bucketed tables written once;
  * in-session `persist(MEMORY_AND_DISK)` is the local-mode twin.
  *
  * Keys hold the session reference, so a stopped session's entries are
  * never served to a new one. Long-lived drivers (Bench between query
  * families, a service-style entry point between workloads) call
  * [[evict]] to release the session's pins.
  */
object SharedRelations {
  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]
  private val evictHooks = TrieMap.empty[SparkSession, List[() => Unit]]

  def apply(s: SparkSession, dir: String, name: String)
           (build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((s, dir, name),
      build.persist(StorageLevel.MEMORY_AND_DISK))

  /** Register a cleanup to run when `s` is evicted — for pinned state
    * `clearCache` can't reach (checkpoint RDDs live outside the
    * CacheManager). Hooks run once and are dropped.
    */
  def onEvict(s: SparkSession)(f: () => Unit): Unit =
    evictHooks.updateWith(s)(prev => Some(f :: prev.getOrElse(Nil)))

  /** Release every relation pinned for `s`, then clear the session
    * cache wholesale — the latter also drops stray non-shared persists
    * (e.g. the trailing per-pass caches of the iterative PageRank
    * loops), so a long run's executor memory stays bounded by one
    * family's working set.
    */
  def evict(s: SparkSession): Unit = {
    cache.keys.filter(_._1 eq s).foreach { k =>
      cache.remove(k).foreach(_.unpersist(false))
    }
    evictHooks.remove(s).foreach(_.foreach(f => f()))
    s.catalog.clearCache()
  }
}
