package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO — apply a keyed changeset (CDC batch) to a snapshot:
  * `U` rows replace the snapshot row with their key, `D` rows remove
  * it, `I` rows append. The warehouse maintenance verb every CDC
  * ingestion pipeline runs per batch (Delta/Iceberg `MERGE INTO`,
  * the upsert half of a lakehouse), sibling to
  * [[graft.sources.Compaction]]'s file-maintenance half.
  *
  * Spark lacks a native MERGE over plain parquet; per the preference
  * order this is COMPOSED from existing operators, decomposed so the
  * snapshot side NEVER shuffles:
  *
  *   merged = (snapshot ANTI JOIN touched-keys) ∪ updates ∪ inserts
  *
  * At 100 TB the changeset is orders of magnitude smaller than the
  * snapshot (a CDC batch vs the corpus), so the touched-key set
  * broadcasts and the anti-join is map-side — the whole merge is one
  * broadcast + one pass over the snapshot, no exchange on the fact
  * side. (The naive full-outer-join formulation CANNOT broadcast —
  * Spark has no broadcast full-outer strategy — and sort-merges the
  * entire snapshot per batch.) Written back `partitionBy` the
  * snapshot's partition key, only directories containing touched or
  * inserted rows change — copy-on-write MERGE; the read-back
  * (merge-on-read) form is this same relation served directly.
  *
  * Caller contracts (MergeIntoSpec pins them; not enforced per-row,
  * which would cost a pass over the snapshot):
  *  - at most one change per key (CDC compaction upstream: latest op
  *    per key wins);
  *  - `U`/`D` keys exist in the snapshot, `I` keys do not (a `U` for
  *    an absent key degrades to an insert — visible in row counts;
  *    an `I` for a present key duplicates it — a hash-gate breach).
  */
object MergeInto {

  /** @param snapshot the current table state
    * @param changes  key column + `op` ('U'|'D'|'I') + the snapshot's
    *                 payload columns (payload ignored for 'D')
    * @param key      equi key column name (both sides)
    */
  def apply(snapshot: DataFrame, changes: DataFrame, key: String)
      : DataFrame = {
    val touched = broadcast(
      changes.filter(col("op").isin("U", "D")).select(col(key)))
    val survivors = snapshot.join(touched, Seq(key), "left_anti")
    val arriving = changes.filter(col("op").isin("U", "I")).drop("op")
    survivors.unionByName(arriving)
  }
}
