package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared zone-map machinery for the stats-consulting file indexes
  * ([[VersionedFileIndex]], directory grain over a versioned
  * manifest; [[ZoneMapFileIndex]], FILE grain over a plain tree):
  * translate a scan's data filters into an interval-intersection
  * predicate over a [[StatsStore]] sidecar's min/max envelope
  * columns. Only recognized comparison shapes on columns with
  * recorded envelopes contribute — anything else prunes NOTHING, so
  * the skip is superset-safe by construction and the scan's residual
  * predicate does the exact filtering.
  */
object ZoneMap {

  /** The sidecar predicate for `dataFilters` given data column →
    * (min, max) sidecar column names, or None when no supported
    * conjunct matched. */
  def envelopePredicate(dataFilters: Seq[Expression],
                        statsCols: Map[String, (String, String)])
      : Option[Column] = {
    if (statsCols.isEmpty) return None
    def probe(attr: String,
              mk: ((String, String)) => Option[Column]): Option[Column] =
      statsCols.get(attr).flatMap(mk)
    val conjuncts = dataFilters.flatMap { f =>
      def litCol(l: Literal) = ColumnBridge.column(l)
      f match {
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
          probe(a.name, { case (_, mx) => Some(col(mx) >= litCol(l)) })
        case GreaterThan(a: AttributeReference, l: Literal) =>
          probe(a.name, { case (_, mx) => Some(col(mx) > litCol(l)) })
        case LessThanOrEqual(a: AttributeReference, l: Literal) =>
          probe(a.name, { case (mn, _) => Some(col(mn) <= litCol(l)) })
        case LessThan(a: AttributeReference, l: Literal) =>
          probe(a.name, { case (mn, _) => Some(col(mn) < litCol(l)) })
        case EqualTo(a: AttributeReference, l: Literal) =>
          probe(a.name, { case (mn, mx) =>
            Some(col(mn) <= litCol(l) && col(mx) >= litCol(l)) })
        // flipped literal-first renderings
        case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
          probe(a.name, { case (mn, _) => Some(col(mn) <= litCol(l)) })
        case GreaterThan(l: Literal, a: AttributeReference) =>
          probe(a.name, { case (mn, _) => Some(col(mn) < litCol(l)) })
        case LessThanOrEqual(l: Literal, a: AttributeReference) =>
          probe(a.name, { case (_, mx) => Some(col(mx) >= litCol(l)) })
        case LessThan(l: Literal, a: AttributeReference) =>
          probe(a.name, { case (_, mx) => Some(col(mx) > litCol(l)) })
        case _ => None
      }
    }
    conjuncts.reduceOption(_ && _)
  }

  /** Narrow hive-style partition-value type inference shared by the
    * indexes: all-int → int, all-long → long, else string. */
  private[sources] def inferPartType(values: Seq[String]): DataType = {
    val vs = values.filter(_ != null)
    if (vs.nonEmpty && vs.forall(v => scala.util.Try(v.toInt).isSuccess))
      IntegerType
    else if (vs.nonEmpty && vs.forall(v => scala.util.Try(v.toLong).isSuccess))
      LongType
    else StringType
  }

  private[sources] def valueOf(raw: String, t: DataType): Any =
    if (raw == null) null
    else t match {
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case _ => UTF8String.fromString(raw)
    }
}

/** A Catalyst [[FileIndex]] over a PLAIN hive-partitioned tree with a
  * per-FILE stats sidecar ([[StatsStore.writeFileStats]]) — Delta's
  * checkpoint-stats skipping as an index: `listFiles` prunes whole
  * directories via partition filters AND individual files via the
  * sidecar's per-file min/max envelopes, so an intra-partition window
  * never plans the partition's non-intersecting files at all. This is
  * [[graft.queries.CoreQueries.q58_file_skipping]]'s machinery moved
  * from the query function into the scan's own planning — automatic
  * for any query over the relation. The sidecar probe is a
  * |files|-row local query at planning time; unsupported predicate
  * shapes prune nothing (superset-safe, see [[ZoneMap]]).
  */
class ZoneMapFileIndex(
    s: SparkSession, treePath: String, partCol: String,
    statsPath: String, statsCols: Map[String, (String, String)])
    extends FileIndex {

  private val fs = new Path(treePath)
    .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** (partition value rendering, relative path → status) per dir. */
  private val byDir: Seq[(String, Map[String, FileStatus])] =
    fs.listStatus(new Path(treePath)).iterator
      .filter(d => d.isDirectory && d.getPath.getName.contains("="))
      .map { d =>
        val raw = d.getPath.getName.split("=", 2)(1)
        val value = if (raw == "__HIVE_DEFAULT_PARTITION__") null
          else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(raw)
        value -> fs.listStatus(d.getPath).iterator
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
          .map(f => s"${d.getPath.getName}/${f.getPath.getName}" -> f)
          .toMap
      }.toSeq.sortBy(_._1)

  private val partType: DataType =
    ZoneMap.inferPartType(byDir.map(_._1))

  override val partitionSchema: StructType =
    StructType(Seq(StructField(partCol, partType, nullable = true)))

  override def rootPaths: Seq[Path] = Seq(new Path(treePath))

  override def refresh(): Unit = ()

  override def sizeInBytes: Long =
    byDir.iterator.flatMap(_._2.values).map(_.getLen).sum

  override def inputFiles: Array[String] =
    byDir.iterator.flatMap(_._2.values).map(_.getPath.toString).toArray

  /** Relative paths of files whose envelopes intersect, or None when
    * the filters carry no supported conjunct. */
  private def liveFiles(dataFilters: Seq[Expression]): Option[Set[String]] =
    ZoneMap.envelopePredicate(dataFilters, statsCols).map { pred =>
      s.read.parquet(statsPath).filter(pred)
        .select(col("file")).collect().map(_.getString(0)).toSet
    }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val partPred = partitionFilters.reduceOption(
      org.apache.spark.sql.catalyst.expressions.And.apply).map { e =>
      Predicate.create(e.transform {
        case a: AttributeReference if a.name == partCol =>
          BoundReference(0, partType, nullable = true)
      })
    }
    val live = liveFiles(dataFilters)
    byDir.iterator
      .map { case (raw, files) => (ZoneMap.valueOf(raw, partType), files) }
      .filter { case (v, _) => partPred.forall(_.eval(InternalRow(v))) }
      .map { case (v, files) =>
        val kept = live match {
          case Some(set) => files.collect {
            case (rel, st) if set.contains(rel) => st }.toArray
          case None => files.values.toArray
        }
        PartitionDirectory(InternalRow(v), kept)
      }
      .filter(_.files.nonEmpty)
      .toSeq
  }
}

object ZoneMapFileIndex {
  /** Index-backed DataFrame over the tree, per-file skipping wired. */
  def relation(s: SparkSession, treePath: String, partCol: String,
               statsPath: String,
               statsCols: Map[String, (String, String)]): DataFrame = {
    val idx = new ZoneMapFileIndex(s, treePath, partCol, statsPath,
      statsCols)
    val first = idx.inputFiles.headOption.getOrElse(
      throw new IllegalArgumentException(s"$treePath has no data files"))
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
