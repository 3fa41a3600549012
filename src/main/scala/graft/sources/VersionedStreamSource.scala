package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** A [[VersionedTable]] COMMIT as a streaming micro-batch offset —
  * the version number is the offset, serialized as its decimal
  * rendering (what the engine's checkpoint offset log stores and
  * hands back as a `SerializedOffset` after a restart). */
case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** `spark.readStream.format("graft-versioned").option("path", t)` —
  * the STREAMING read of a [[VersionedTable]], Delta's streaming
  * source shape: the commit log is the stream. Offsets are version
  * numbers; each micro-batch serves exactly the data files the
  * versions in `(start, end]` ADDED, so a committed batch is served
  * once and exactly once across restarts (the engine's offset
  * checkpoint holds the last version served — VersionedStreamSpec
  * pins resume-after-restart and no-replay).
  *
  * Commit-kind handling, Delta's semantics:
  *  - APPEND commits ([[VersionedTable.commitAppend]], and `init`'s
  *    v0 when the stream starts from scratch) serve their added files
  *    as the increment — the ingest fast path, I/O exactly the new
  *    data;
  *  - commits flagged `dataChange=false` (OPTIMIZE / OPTIMIZE ZORDER)
  *    are SKIPPED entirely: their "added" files are rearrangements of
  *    rows already served, and re-serving them would duplicate —
  *    the flag is what lets compaction run underneath a live stream;
  *  - a commit that RETIRED files while changing data (a merge's
  *    update/delete) has no append-only reading — the source fails
  *    loudly by default, or drops the whole commit under
  *    `skipChangeCommits=true` (Delta's option of the same name).
  *
  * Options: `path` (required), `startingVersion` (serve only commits
  * AFTER this version; default -1 serves the v0 snapshot as the first
  * increment), `skipChangeCommits` (above), `maxVersionsPerBatch`
  * (admission control: cap how many commits one micro-batch absorbs —
  * a restarted stream facing 10k backlogged commits should catch up
  * in bounded batches, not one giant one), and `readChangeFeed`
  * (below).
  *
  * `readChangeFeed=true` switches WHAT each batch carries: row-level
  * CHANGE EVENTS ([[VersionedTable.changeFeed]]'s relation —
  * payload + `change_type` + `change_version`) instead of appended
  * rows — Delta's CDF streaming read. Update/delete commits become
  * STREAMABLE (each batch derives its commits' events from the
  * manifest diff, reading only the rewritten slice), append commits
  * serve their rows as `insert` events, and `dataChange=false`
  * commits still contribute nothing. This is the incremental input a
  * live materialized view consumes; the batch twin is
  * [[graft.queries.CoreQueries.q65_cdf_maintenance]].
  *
  * Scale shape: `getOffset` is one log listing (metadata);
  * `getBatch` reads manifests for the version RANGE (metadata) plus
  * the added files only — never the table. The schema is fixed at
  * stream start (the head version's recorded schema); evolve the
  * table and the stream must restart, Delta's rule.
  */
class VersionedStreamProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  private def headSchema(s: SparkSession, path: String,
                         changeFeed: Boolean): StructType = {
    val v = VersionedTable.currentVersion(s, path)
    require(v >= 0, s"$path is not a versioned table (no log)")
    val base = VersionedTable.schemaOf(s, path, v)
      .getOrElse(VersionedTable.snapshot(s, path, v).schema)
    if (!changeFeed) base
    else StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("change_version",
        org.apache.spark.sql.types.LongType, nullable = false)))
  }

  private def wantsChangeFeed(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-versioned source requires option 'path'"))
    (shortName(), schema.getOrElse(
      headSchema(ctx.sparkSession, path, wantsChangeFeed(parameters))))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val path = parameters("path")
    val cdf = wantsChangeFeed(parameters)
    val key = parameters.get("key")
    require(!cdf || key.nonEmpty,
      "readChangeFeed=true requires option 'key' (the primary key the " +
        "before/after images join on)")
    new VersionedStreamSource(ctx.sparkSession, path,
      schema.getOrElse(headSchema(ctx.sparkSession, path, cdf)),
      parameters.get("startingVersion").map(_.toLong).getOrElse(-1L),
      parameters.get("skipChangeCommits").exists(_.toBoolean),
      parameters.get("maxVersionsPerBatch").map(_.toLong)
        .getOrElse(Long.MaxValue),
      changeFeedKey = if (cdf) key else None)
  }
}

class VersionedStreamSource(s: SparkSession, tablePath: String,
                            override val schema: StructType,
                            startingVersion: Long,
                            skipChangeCommits: Boolean,
                            maxVersionsPerBatch: Long,
                            changeFeedKey: Option[String] = None)
    extends Source {

  require(maxVersionsPerBatch >= 1, "maxVersionsPerBatch must be >= 1")

  /** Highest version this source has offered as a batch end —
    * admission-control state only; exactly-once comes from the
    * ENGINE's offset checkpoint, not from this. */
  private var offered: Long = startingVersion

  private def versionOf(o: Offset): Long = o match {
    case VersionOffset(v) => v
    // the engine replays checkpointed offsets as SerializedOffset
    case other => other.json().trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val cur = VersionedTable.currentVersion(s, tablePath)
    val base = math.max(offered, startingVersion)
    // saturating add: the default cap is Long.MaxValue, and a plain
    // base + cap wraps NEGATIVE once base >= 0 (i.e. after the first
    // served batch or a restart's recovery getBatch), silently
    // stalling the stream
    val horizon = if (base > Long.MaxValue - maxVersionsPerBatch)
      Long.MaxValue else base + maxVersionsPerBatch
    val end = math.min(cur, horizon)
    // keep re-offering the same end while it stands (the engine dedups
    // against its own committed offsets) — returning None after a
    // lost offer would stall the stream
    if (end <= startingVersion) None
    else {
      offered = math.max(offered, end)
      Some(VersionOffset(end))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val to = versionOf(end)
    offered = math.max(offered, to)
    changeFeedKey match {
      case Some(key) =>
        // CDF mode: the batch is the range's row-level change events —
        // per-commit manifest-diff joins over the rewritten slices
        // (dataChange=false commits contribute nothing; v0 diffs
        // against the empty table, its snapshot feeding as inserts),
        // aligned by name across an evolution: changeFeed's exact
        // semantics, incrementally
        val steps = (from + 1 to to).flatMap { v =>
          if (!VersionedTable.dataChangeOf(s, tablePath, v)) None
          else Some(VersionedTable.diffFeed(s, tablePath, v - 1, v, key))
        }
        return org.apache.spark.sql.graft.ColumnBridge.asStreamingFrame(s,
          alignToSchema(
            if (steps.isEmpty) emptyBatch()
            else steps.reduce((a, b) =>
              a.unionByName(b, allowMissingColumns = true))))
      case None => ()
    }
    val files = (from + 1 to to).flatMap { v =>
      val cur = VersionedTable.manifest(s, tablePath, v).toSet
      val prev = if (v == 0) Set.empty[String]
        else VersionedTable.manifest(s, tablePath, v - 1).toSet
      val added = (cur -- prev).toSeq.sorted
      val removed = prev -- cur
      if (!VersionedTable.dataChangeOf(s, tablePath, v)) {
        Nil // pure rearrangement: its files hold rows already served
      } else if (removed.nonEmpty) {
        if (skipChangeCommits) Nil
        else throw new IllegalStateException(
          s"version $v of $tablePath retired ${removed.size} file(s) " +
            "while changing data (update/delete) — a streaming read " +
            "has no append-only interpretation; set " +
            "skipChangeCommits=true to drop such commits, or consume " +
            "the change feed (VersionedTable.changeFeed) in batch")
      } else added
    }
    val batch =
      if (files.isEmpty) emptyBatch()
      // manifest-driven read (no listing job / footer inference —
      // see VersionedFileIndex.filesRelation)
      else VersionedFileIndex.filesRelation(s, tablePath, files, schema)
    // a v1 Source must hand back a STREAMING frame over the batch's
    // physical rows (the FileStreamSource recipe)
    org.apache.spark.sql.graft.ColumnBridge.asStreamingFrame(s, batch)
  }

  private def emptyBatch(): DataFrame =
    s.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)

  /** Project onto the source's fixed schema — a late (evolved) column
    * no step in the range carried serves a typed null, the same
    * null-widening a historical read gets. */
  private def alignToSchema(df: DataFrame): DataFrame =
    df.select(schema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType)
        .as(f.name)
    }.toIndexedSeq: _*)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
