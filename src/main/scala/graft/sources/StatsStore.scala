package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized column statistics for a hive-partitioned tree, at two
  * grains, with INCREMENTAL maintenance — the machinery behind
  * [[graft.queries.CoreQueries.q54_partition_stats]] (the stats table
  * as a relation) and [[graft.queries.CoreQueries.q55_stats_skipping]]
  * (the stats table as a zone map), factored out so the warehouse
  * MAINTENANCE verbs can keep the sidecar fresh for exactly the
  * directories they rewrite instead of leaving q55 stale envelopes
  * (the r16 verdict's composition gap).
  *
  * Grains:
  *  - DIRECTORY ([[dirStats]]): one row per partition value — Delta/
  *    Iceberg partition-level manifest stats; what q55's zone-map
  *    probe reads.
  *  - FILE ([[fileStats]]): one row per (partition value, data file) —
  *    Delta's per-file min/max in checkpoint form; prunes WITHIN
  *    surviving directories when files are range-clustered on the
  *    stats column ([[graft.queries.CoreQueries.q58_file_skipping]]).
  *
  * Incrementality rests on the property PartitionedSpec proved for
  * q54: count, min/max, and the HLL NDV sketch all merge
  * associatively, so a rewrite of K of N directories needs ONE
  * aggregation pass over those K directories' rows (partition-pruned
  * scan — [[refreshDirStats]] / [[refreshFileStats]]), spliced into
  * the sidecar by key. Stats stay |directories| (or |files|) rows at
  * any corpus size; no refresh ever re-scans the corpus (the spec
  * pins the refresh scan's input files to the affected directories).
  *
  * [[DirStatsHook]] / [[FileStatsHook]] adapt the refresh into the
  * post-rewrite hook [[graft.operators.MergeInto.copyOnWrite]] and
  * [[Compaction.compact]] accept — the minimal form of a table
  * format's post-commit hooks.
  */
object StatsStore {

  /** One source column's min/max spec: aggregate `src` into columns
    * named `minName` / `maxName`. */
  final case class ColSpec(src: String, minName: String, maxName: String)

  /** NDV sketch spec: HLL of `src` into column `name` at `lgK`. */
  final case class NdvSpec(src: String, name: String, lgK: Int)

  /** Bloom spec: a membership sketch of `src` into binary column
    * `name`, sized for `expectedItems` distinct values PER KEY (per
    * file at file grain) — constant-size by construction, the
    * ANN-codebook rule applied to stats. Serves equality/IN skipping
    * on columns the layout doesn't cluster, where min/max envelopes
    * are useless ([[ZoneMapFileIndex]]'s `bloomCols`). */
  final case class BloomSpec(src: String, name: String, expectedItems: Long)

  private def aggs(cols: Seq[ColSpec], ndv: Option[NdvSpec],
                   blooms: Seq[BloomSpec] = Nil): Seq[Column] =
    cols.flatMap(c => Seq(min(col(c.src)).as(c.minName),
      max(col(c.src)).as(c.maxName))) ++
      ndv.map(n => hll_sketch_agg(col(n.src), lit(n.lgK)).as(n.name)) ++
      blooms.map(b => graft.functions.GraftExpressions
        .bloomAgg(col(b.src), b.expectedItems).as(b.name))

  /** Per-directory stats relation of `df` (not yet materialized):
    * (partCol, n_rows, min/max per ColSpec, optional NDV sketch). */
  def dirStats(df: DataFrame, partCol: String, cols: Seq[ColSpec],
               ndv: Option[NdvSpec] = None): DataFrame =
    df.groupBy(col(partCol))
      .agg(count(lit(1)).as("n_rows"), aggs(cols, ndv): _*)

  /** Per-file stats relation: like [[dirStats]] plus a `file` column
    * holding the data file's path RELATIVE to the tree root
    * (`partCol=v/part-…`), extracted from `input_file_name` — the
    * same relative-path identity [[VersionedTable]]'s manifests use.
    * `input_file_name` renders the file's URI, so the fragment is
    * percent-DECODED ([[graft.functions.GraftExpressions.uriDecode]])
    * to match the raw `FileStatus` rendering the consuming index
    * ([[ZoneMapFileIndex]]) keys on — without it, a partition value
    * hive-escapes to characters URI-encoding rewrites (space, `%`)
    * would never match and, even fail-open, never skip (r17 advice). */
  def fileStats(df: DataFrame, partCol: String, cols: Seq[ColSpec],
                ndv: Option[NdvSpec] = None,
                blooms: Seq[BloomSpec] = Nil): DataFrame =
    df.withColumn("file",
        graft.functions.GraftExpressions.uriDecode(
          regexp_extract(input_file_name(), "([^/]+=[^/]+/[^/]+)$", 1)))
      .groupBy(col(partCol), col("file"))
      .agg(count(lit(1)).as("n_rows"), aggs(cols, ndv, blooms): _*)

  /** Compute and overwrite the full sidecar for the tree at
    * `treePath`. One pass at creation; [[refreshDirStats]] maintains
    * it from then on. */
  def writeDirStats(s: SparkSession, treePath: String, statsPath: String,
                    partCol: String, cols: Seq[ColSpec],
                    ndv: Option[NdvSpec] = None): DataFrame = {
    dirStats(s.read.parquet(treePath), partCol, cols, ndv)
      .write.mode(SaveMode.Overwrite).parquet(statsPath)
    s.read.parquet(statsPath)
  }

  /** Full per-file sidecar, creation-time twin of [[writeDirStats]]. */
  def writeFileStats(s: SparkSession, treePath: String, statsPath: String,
                     partCol: String, cols: Seq[ColSpec],
                     ndv: Option[NdvSpec] = None,
                     blooms: Seq[BloomSpec] = Nil): DataFrame = {
    fileStats(s.read.parquet(treePath), partCol, cols, ndv, blooms)
      .write.mode(SaveMode.Overwrite).parquet(statsPath)
    s.read.parquet(statsPath)
  }

  /** The partition-pruned slice a refresh aggregates — exposed so the
    * spec can pin "no corpus re-scan": this plan's input files all
    * live under the affected directories. */
  private[sources] def slice(s: SparkSession, treePath: String,
                             partCol: String,
                             partVals: Seq[Any]): DataFrame = {
    val tree = s.read.parquet(treePath)
    val (nullPart, defined) = partVals.partition(_ == null)
    val pred = (
      (if (defined.nonEmpty) Seq(col(partCol).isInCollection(defined))
       else Nil) ++
      (if (nullPart.nonEmpty) Seq(col(partCol).isNull) else Nil)
    ).reduce(_ || _)
    tree.filter(pred)
  }

  private def splice(s: SparkSession, statsPath: String, keep: Column,
                     fresh: DataFrame): DataFrame = {
    val prev = s.read.parquet(statsPath)
    // align the recomputed slice to the sidecar's persisted types
    // (partition inference vs aggregation output can differ in width)
    val aligned = fresh.select(prev.schema.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    // the sidecar is |directories| (or |files|) rows — checkpointing
    // it is metadata-scale, and required: the write below replaces
    // the very files the survivors are read from
    val updated = prev.filter(keep).unionByName(aligned)
      .localCheckpoint(true)
    updated.write.mode(SaveMode.Overwrite).parquet(statsPath)
    s.read.parquet(statsPath)
  }

  /** Recompute the sidecar rows for exactly `partVals` from the
    * (post-rewrite) tree and splice them in: one pruned aggregation
    * over the affected directories, never a corpus re-scan. A
    * partition that no longer exists (full delete) contributes no
    * rows, so its stale stats row simply drops out. */
  def refreshDirStats(s: SparkSession, treePath: String, statsPath: String,
                      partCol: String, partVals: Seq[Any],
                      cols: Seq[ColSpec],
                      ndv: Option[NdvSpec] = None): DataFrame = {
    if (partVals.isEmpty) return s.read.parquet(statsPath)
    spliceDirStats(s, statsPath, partCol, partVals,
      dirStats(slice(s, treePath, partCol, partVals), partCol, cols, ndv))
  }

  /** Splice a recomputed directory-grain slice into the sidecar:
    * drop every row whose partition value is in `partVals`, union
    * `fresh` in. Factored out so readers that must compute the slice
    * differently (a VERSIONED table aggregates its live file set,
    * not the directory — [[VersionedTable.statsHook]]) reuse the
    * splice semantics exactly. */
  def spliceDirStats(s: SparkSession, statsPath: String, partCol: String,
                     partVals: Seq[Any], fresh: DataFrame): DataFrame = {
    val affected = partVals.map(v =>
      if (v == null) Compaction.HiveDefaultPartition
      else String.valueOf(v)).toSet
    // coalesce to the hive null sentinel so a null-partition stats
    // row is droppable (a bare NOT IN would null out and silently
    // drop every null row instead)
    val keep = !coalesce(col(partCol).cast("string"),
        lit(Compaction.HiveDefaultPartition))
      .isInCollection(affected.toSeq)
    splice(s, statsPath, keep, fresh)
  }

  /** File-grain twin of [[refreshDirStats]]: every stats row whose
    * file lives in an affected directory is replaced by the
    * recomputed rows for that directory's current files. */
  def refreshFileStats(s: SparkSession, treePath: String, statsPath: String,
                       partCol: String, partVals: Seq[Any],
                       cols: Seq[ColSpec],
                       ndv: Option[NdvSpec] = None,
                       blooms: Seq[BloomSpec] = Nil): DataFrame = {
    if (partVals.isEmpty) return s.read.parquet(statsPath)
    val fresh = fileStats(slice(s, treePath, partCol, partVals),
      partCol, cols, ndv, blooms)
    val affected = partVals.map(v =>
      if (v == null) Compaction.HiveDefaultPartition
      else String.valueOf(v)).toSet
    // coalesce to the hive null sentinel so a null-partition stats
    // row is droppable (a bare NOT IN would null out and silently
    // drop every null row instead)
    val keep = !coalesce(col(partCol).cast("string"),
        lit(Compaction.HiveDefaultPartition))
      .isInCollection(affected.toSeq)
    splice(s, statsPath, keep, fresh)
  }

  /** Post-rewrite maintenance hook — the composition point
    * [[graft.operators.MergeInto.copyOnWrite]] and
    * [[Compaction.compact]] call with the partition values they
    * actually rewrote (a table format's post-commit hook, minimally).
    */
  trait PostRewriteHook {
    def afterRewrite(s: SparkSession, treePath: String, partCol: String,
                     rewrittenParts: Seq[Any]): Unit
  }

  /** Keep a directory-grain sidecar fresh across rewrites. */
  final case class DirStatsHook(statsPath: String, cols: Seq[ColSpec],
                                ndv: Option[NdvSpec] = None)
      extends PostRewriteHook {
    def afterRewrite(s: SparkSession, treePath: String, partCol: String,
                     rewrittenParts: Seq[Any]): Unit = {
      refreshDirStats(s, treePath, statsPath, partCol, rewrittenParts,
        cols, ndv)
      ()
    }
  }

  /** Keep a file-grain sidecar fresh across rewrites — what
    * compaction must refresh even though directory-grain stats are
    * invariant under it (same rows, new files). */
  final case class FileStatsHook(statsPath: String, cols: Seq[ColSpec],
                                 ndv: Option[NdvSpec] = None,
                                 blooms: Seq[BloomSpec] = Nil)
      extends PostRewriteHook {
    def afterRewrite(s: SparkSession, treePath: String, partCol: String,
                     rewrittenParts: Seq[Any]): Unit = {
      refreshFileStats(s, treePath, statsPath, partCol, rewrittenParts,
        cols, ndv, blooms)
      ()
    }
  }
}
