package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  * entire snapshot per batch.) [[apply]] is the merge-on-read form —
  * the merged relation served directly; [[copyOnWrite]] is the
  * write-back form — the same merge applied IN PLACE to a
  * hive-partitioned tree, rewriting only the directories containing
  * touched or inserted rows (spec-executed, not just asserted:
  * MergeIntoSpec pins untouched directories' files byte-untouched).
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

  /** COPY-ON-WRITE merge over the hive-partitioned tree at
    * `tablePath` (partitioned by `partCol`): apply `changes` IN PLACE,
    * rewriting ONLY the partition directories that hold a touched
    * key's current row or receive an arriving row — every other
    * directory's files are left byte-untouched (MergeIntoSpec pins
    * file names, sizes, AND mtimes unchanged). This is the property
    * that makes CDC affordable at 100 TB: a batch touching 0.1% of
    * partitions rewrites 0.1% of the table, not all of it.
    *
    * Mechanics, in Spark terms:
    *  1. affected partitions = distinct `partCol` of (snapshot
    *     SEMI-JOIN touched keys) ∪ arriving rows' `partCol` — the
    *     semi-join broadcasts the same touched-key set as the merge
    *     itself, and the distinct collects |affected dirs| values to
    *     the driver (partition VALUES, never rows).
    *  2. the merge ([[apply]]) runs over the snapshot FILTERED to
    *     those partitions — partition-pruned scan, so the read side
    *     is proportional to the affected slice too.
    *  3. `partitionOverwriteMode=dynamic` write-back: Spark replaces
    *     exactly the directories present in the written data.
    *     The merged slice is `localCheckpoint`ed first — the write
    *     would otherwise scan the same path it overwrites (Spark
    *     rejects that plan statically), and the checkpoint is one
    *     extra materialization of exactly the bytes being rewritten,
    *     which copy-on-write pays by definition.
    *  4. a partition whose rows were ALL deleted produces no output
    *     rows, so dynamic overwrite never touches it — its stale
    *     directory is deleted explicitly (the resurrect-on-full-delete
    *     trap; spec-pinned).
    *
    * The changeset must carry `partCol` for arriving rows (it is part
    * of the payload). A key UPDATE that moves a row across partitions
    * rewrites both directories — the old one loses the row via the
    * anti-join, the new one gains it via the arriving union. Null
    * partition values follow the null directory like [[
    * graft.sources.Compaction]] (hive's `__HIVE_DEFAULT_PARTITION__`).
    *
    * `partitionKeyImmutable = true` is the production fast path for
    * the common CDC contract (the partition key never changes for an
    * existing row, and D rows carry the row's current `partCol`):
    * affected partitions then come straight from the CHANGESET's
    * partition values and step 1's snapshot semi-join probe — the
    * only full-table scan in the default path — is skipped entirely,
    * making the whole merge proportional to the affected slice. The
    * same pruning a table format derives from a partition predicate
    * in the MERGE condition. If the caller breaks the contract (a
    * touched key actually lives in an unprobed partition), its stale
    * row SURVIVES — which is why it is an explicit opt-in, defaulted
    * off, and spec-pinned equal to the probing path on a conforming
    * changeset.
    *
    * Returns the post-merge relation read back from `tablePath`.
    */
  def copyOnWrite(s: SparkSession, tablePath: String, partCol: String,
                  changes: DataFrame, key: String,
                  partitionKeyImmutable: Boolean = false,
                  hooks: Seq[graft.sources.StatsStore.PostRewriteHook] = Nil)
      : DataFrame = {
    val snapshot = s.read.parquet(tablePath)
    val touched = broadcast(
      changes.filter(col("op").isin("U", "D")).select(col(key)))
    val arriving = changes.filter(col("op").isin("U", "I")).drop("op")
    // Every collected partition value is cast to the SNAPSHOT's
    // inferred partition type first: the changeset (immutable path)
    // and the post-union merged relation can carry a coerced sibling
    // type (Int vs Long), and the full-delete set test below compares
    // boxed values — a java.lang.Integer never equals a
    // java.lang.Long, so without the cast a live partition could fail
    // membership and have its freshly written directory deleted.
    val partType = snapshot.schema(partCol).dataType
    val parts = (if (partitionKeyImmutable)
        changes.select(col(partCol).cast(partType))
      else snapshot.join(touched, Seq(key), "left_semi")
        .select(col(partCol))
        .union(arriving.select(col(partCol).cast(partType))))
      .distinct().collect().map(_.get(0)).toSeq
    if (parts.isEmpty) return snapshot // empty changeset: no-op
    val (nullPart, defined) = parts.partition(_ == null)
    val inAffected = (
      (if (defined.nonEmpty) Seq(col(partCol).isInCollection(defined))
       else Nil) ++
      (if (nullPart.nonEmpty) Seq(col(partCol).isNull) else Nil)
    ).reduce(_ || _)
    val affected = snapshot.filter(inAffected)
    val merged = apply(affected, changes, key)
      .localCheckpoint(true)
    val survivingParts = merged.select(col(partCol).cast(partType))
      .distinct().collect().map(_.get(0)).toSet
    merged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(tablePath)
    // full-delete partitions: no output rows → dynamic overwrite left
    // the stale directory behind; remove it
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    parts.filterNot(survivingParts).foreach { pv =>
      val dirName = if (pv == null) "__HIVE_DEFAULT_PARTITION__"
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(String.valueOf(pv))
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$tablePath/$partCol=$dirName"), true)
    }
    // Post-rewrite maintenance (r16 verdict: the maintenance verbs
    // must maintain the stats they taught q55 to trust): each hook
    // sees exactly the partition values this merge rewrote — a
    // stats-sidecar hook recomputes those directories from the
    // post-merge tree and splices, never re-scanning the corpus.
    hooks.foreach(_.afterRewrite(s, tablePath, partCol, parts))
    s.read.parquet(tablePath)
  }
}
