package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BoundReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A Catalyst [[FileIndex]] over one VERSION of a
  * [[VersionedTable]] — the architecture a table format plugs into
  * Spark with (Delta's TahoeFileIndex, Iceberg's SparkScan): the
  * scan's file listing comes from the version's MANIFEST, not a
  * directory walk, so retired history files are structurally
  * invisible to the plan, and the two pruning tiers run INSIDE the
  * index at planning time:
  *
  *  - `partitionFilters` evaluate against each live directory's
  *    partition value — ordinary partition pruning, on a historical
  *    version;
  *  - `dataFilters` consult the (optional) q54-style stats sidecar:
  *    a conjunct of comparisons on a column with recorded [min, max]
  *    envelopes keeps only intersecting directories — q55's
  *    zone-map skip, AUTOMATIC for any query over the relation
  *    instead of hand-written in the query function. Unsupported
  *    predicate shapes prune nothing (superset-safe by
  *    construction); the residual predicate still runs in the scan.
  *
  * The sidecar probe is a |directories|-row local query at planning
  * time — exactly what reading a format's checkpoint stats costs.
  * Instances are per-version immutable ([[refresh]] is a no-op);
  * [[VersionedTable.snapshotRelation]] wires one into a
  * `HadoopFsRelation` so the reader is Spark's own parquet scan with
  * all its pushdown intact.
  */
class VersionedFileIndex(
    s: SparkSession, tablePath: String, partCol: String, version: Long,
    statsPath: Option[String] = None,
    statsCols: Map[String, (String, String)] = Map.empty)
    extends FileIndex {

  private val fs = new Path(tablePath)
    .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** (partition value rendering, file statuses) per live directory. */
  private val byDir: Seq[(String, Seq[FileStatus])] =
    VersionedTable.manifest(s, tablePath, version)
      .groupBy(_.split("/")(0)).toSeq.sortBy(_._1)
      .map { case (dir, files) =>
        val raw = dir.split("=", 2)(1)
        val value = if (raw == "__HIVE_DEFAULT_PARTITION__") null
          else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(raw)
        value -> files.map(f => fs.getFileStatus(new Path(tablePath, f)))
      }

  /** Partition type by the narrow hive-style inference shared with
    * [[ZoneMapFileIndex]] (int → long → string; the layouts in this
    * repo key on int months and short strings — richer inference
    * belongs to the writer's catalog). */
  private val partType: DataType = ZoneMap.inferPartType(byDir.map(_._1))

  private def valueOf(raw: String): Any = ZoneMap.valueOf(raw, partType)

  override val partitionSchema: StructType =
    StructType(Seq(StructField(partCol, partType, nullable = true)))

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def refresh(): Unit = () // a version is immutable

  override def sizeInBytes: Long =
    byDir.iterator.flatMap(_._2).map(_.getLen).sum

  override def inputFiles: Array[String] =
    byDir.iterator.flatMap(_._2).map(_.getPath.toString).toArray

  /** Directories surviving the stats sidecar for `dataFilters` (as
    * partition-value renderings), or None when no sidecar / no
    * supported conjunct — superset-safe: only recognized comparison
    * shapes on columns with recorded envelopes ever prune. */
  private def statsSurvivors(dataFilters: Seq[Expression])
      : Option[Set[String]] =
    statsPath.flatMap { sp =>
      ZoneMap.envelopePredicate(dataFilters, statsCols).map { pred =>
        s.read.parquet(sp)
          .filter(pred)
          .select(col(partCol).cast("string"))
          .collect().map(_.getString(0)).toSet
      }
    }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    // bind the (single-column) partition predicate to slot 0
    val partPred = partitionFilters.reduceOption(
      org.apache.spark.sql.catalyst.expressions.And.apply).map { e =>
      Predicate.create(e.transform {
        case a: AttributeReference if a.name == partCol =>
          BoundReference(0, partType, nullable = true)
      })
    }
    val fromStats = statsSurvivors(dataFilters)
    byDir.iterator
      .map { case (raw, files) => (raw, valueOf(raw), files) }
      .filter { case (raw, v, _) =>
        partPred.forall(_.eval(InternalRow(v))) &&
          fromStats.forall(live => raw != null && live.contains(raw))
      }
      .map { case (_, v, files) =>
        PartitionDirectory(InternalRow(v), files.toArray)
      }
      .toSeq
  }
}

/** Companion read API — see [[VersionedTable.snapshotRelation]]. */
object VersionedFileIndex {

  /** The index-backed DataFrame over version `v` of the table:
    * Spark's parquet scan over a `HadoopFsRelation` whose listing IS
    * the manifest. `stats` optionally wires a q54-style sidecar for
    * automatic zone-map skipping: data column → (min, max) sidecar
    * column names. */
  def relation(s: SparkSession, tablePath: String, partCol: String,
               version: Long = -1L, statsPath: Option[String] = None,
               statsCols: Map[String, (String, String)] = Map.empty)
      : DataFrame = {
    val v = if (version < 0) VersionedTable.currentVersion(s, tablePath)
      else version
    val idx = new VersionedFileIndex(s, tablePath, partCol, v,
      statsPath, statsCols)
    val first = idx.inputFiles.headOption.getOrElse(
      throw new IllegalArgumentException(
        s"version $v of $tablePath has no live files"))
    // data schema from one footer: every file of a version shares the
    // writer's schema (commits write whole relations)
    val dataSchema = s.read.parquet(first).schema
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      idx, idx.partitionSchema, dataSchema, None,
      new org.apache.spark.sql.execution.datasources.parquet
        .ParquetFileFormat, Map.empty)(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    ColumnBridge.ofRows(s,
      org.apache.spark.sql.execution.datasources.LogicalRelation(rel))
  }
}
