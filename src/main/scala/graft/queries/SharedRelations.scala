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
  * never served to a new one (and local-mode processes are
  * short-lived, so no eviction is needed).
  */
object SharedRelations {
  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]

  def apply(s: SparkSession, dir: String, name: String)
           (build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((s, dir, name),
      build.persist(StorageLevel.MEMORY_AND_DISK))
}
