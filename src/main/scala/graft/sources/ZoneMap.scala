package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, Predicate, XxHash64}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared zone-map machinery for the stats-consulting file indexes
  * ([[VersionedFileIndex]], directory grain over a versioned
  * manifest; [[ZoneMapFileIndex]], file OR directory grain over a
  * plain tree): translate a scan's data filters into an
  * interval-intersection predicate over a [[StatsStore]] sidecar's
  * min/max envelope columns. Only recognized comparison shapes on
  * columns with recorded envelopes contribute — anything else prunes
  * NOTHING, so the skip is superset-safe by construction and the
  * scan's residual predicate does the exact filtering.
  *
  * The prune itself is FAIL-OPEN, the Delta stats posture (r17
  * advice): an index only ever drops a file/directory whose sidecar
  * row is PRESENT and whose envelope DEFINITIVELY misses the window.
  * A key the sidecar doesn't know (stale or partial sidecar — e.g. a
  * compaction run without its stats hook, or a partition that landed
  * after the last ANALYZE) and a row whose envelope columns are null
  * both degrade to "no skipping", never to missing rows.
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

  /** One sidecar read → the PRUNED key set: rows where the envelope
    * predicate is definitively FALSE. A null predicate result (null
    * envelope bounds) keeps the row live — fail-open — and keys
    * absent from the sidecar are never in the set, so they are
    * likewise kept by construction. Keys are the sidecar's string
    * renderings of `keyCols` in order, nulls preserved (the
    * `__HIVE_DEFAULT_PARTITION__` directory's row). */
  private[sources] def prunedSet(s: SparkSession, statsPath: String,
                                 keyCols: Seq[Column], pred: Column)
      : Set[List[String]] =
    s.read.parquet(statsPath)
      .filter(not(coalesce(pred, lit(true))))
      .select(keyCols: _*)
      .collect()
      .map(r => keyCols.indices.map(r.getString).toList)
      .toSet

  /** Equality conjuncts usable for BLOOM probing: data column →
    * candidate literal values, from `=` (either literal order) and
    * `IN`/`InSet` shapes on columns with a recorded bloom sidecar.
    * Anything else contributes nothing — like the envelope shapes,
    * unrecognized predicates prune NOTHING (fail-open). The analyzer
    * has already promoted the literal to the column's type, so the
    * probe hashes exactly what [[graft.functions.GraftExpressions
    * .bloomAgg]] hashed at build time. */
  def equalityProbes(dataFilters: Seq[Expression],
                     bloomCols: Map[String, String])
      : Seq[(String, Seq[Literal])] = {
    if (bloomCols.isEmpty) return Nil
    dataFilters.flatMap {
      case EqualTo(a: AttributeReference, l: Literal)
          if bloomCols.contains(a.name) => Some(a.name -> Seq(l))
      case EqualTo(l: Literal, a: AttributeReference)
          if bloomCols.contains(a.name) => Some(a.name -> Seq(l))
      case In(a: AttributeReference, vs)
          if bloomCols.contains(a.name) &&
            vs.forall(_.isInstanceOf[Literal]) =>
        Some(a.name -> vs.map(_.asInstanceOf[Literal]))
      case InSet(a: AttributeReference, vs)
          if bloomCols.contains(a.name) =>
        Some(a.name -> vs.toSeq.map(v => Literal(v, a.dataType)))
      case _ => None
    }
  }

  /** Driver-side bloom probe: keys whose sidecar bloom DEFINITIVELY
    * excludes every candidate value — a bloom has no false negatives,
    * so "might contain none of them" is a proof of absence and the
    * prune stays superset-safe. A null bloom cell keeps its key live
    * (fail-open), and keys absent from the sidecar are never in the
    * returned set. The sidecar is |files| (or |directories|) rows —
    * metadata-scale, same cost class as the envelope probe. */
  private[sources] def bloomPrunedSet(s: SparkSession, statsPath: String,
                                      keyCols: Seq[Column], bloomCol: String,
                                      lits: Seq[Literal])
      : Set[List[String]] = {
    val hashes = lits.map { l =>
      new XxHash64(Seq(l)).eval(InternalRow.empty).asInstanceOf[Long]
    }
    s.read.parquet(statsPath)
      .select((keyCols :+ col(bloomCol)).toIndexedSeq: _*)
      .collect()
      .iterator
      .flatMap { r =>
        val cell = r.get(keyCols.size)
        if (cell == null) None // fail-open: unknown bloom never prunes
        else {
          val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(cell.asInstanceOf[Array[Byte]]))
          if (hashes.exists(bf.mightContainLong)) None
          else Some(keyCols.indices.map(r.getString).toList)
        }
      }
      .toSet
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
  * [[StatsStore]] sidecar — Delta's checkpoint-stats skipping as an
  * index, at either grain:
  *
  *  - FILE grain (`dirGrain = false`, sidecar from
  *    [[StatsStore.writeFileStats]]): `listFiles` prunes whole
  *    directories via partition filters AND individual files via the
  *    sidecar's per-file min/max envelopes, so an intra-partition
  *    window never plans the partition's non-intersecting files at
  *    all — [[graft.queries.CoreQueries.q58_file_skipping]]'s
  *    machinery.
  *  - DIRECTORY grain (`dirGrain = true`, sidecar from
  *    [[StatsStore.writeDirStats]]): the sidecar is keyed by the
  *    partition value and prunes whole directories for a DATA-column
  *    predicate the partitioning never declared —
  *    [[graft.queries.CoreQueries.q55_stats_skipping]]'s skip, moved
  *    from a hand-written driver probe in the query function into the
  *    scan's own planning, automatic for any query over the relation.
  *
  * The sidecar probe is a |files|- (or |directories|-) row local
  * query at planning time, MEMOIZED per canonical envelope predicate:
  * Catalyst calls `listFiles` more than once per query (and again
  * under AQE re-planning), and the probe is a Spark action — one
  * sidecar job per distinct predicate, not per call (spec-pinned via
  * [[probeRuns]]). Unsupported predicate shapes prune nothing, and
  * the prune is fail-open per [[ZoneMap]] — superset-safe.
  */
class ZoneMapFileIndex(
    s: SparkSession, treePath: String, partCol: String,
    statsPath: String, statsCols: Map[String, (String, String)],
    dirGrain: Boolean = false,
    bloomCols: Map[String, String] = Map.empty)
    extends FileIndex {

  private val fs = new Path(treePath)
    .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** (partition value rendering, relative path → status) per dir,
    * ordered by DIRECTORY NAME — never by the unescaped value, which
    * is null for `__HIVE_DEFAULT_PARTITION__` and would NPE the sort
    * (r17 advice). */
  private val byDir: Seq[(String, Map[String, FileStatus])] =
    fs.listStatus(new Path(treePath)).iterator
      .filter(d => d.isDirectory && d.getPath.getName.contains("="))
      .toSeq.sortBy(_.getPath.getName)
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
      }

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

  private val probeMemo = scala.collection.concurrent.TrieMap
    .empty[String, Set[List[String]]]
  /** Sidecar Spark actions actually run — the memoization pin. */
  private[graft] val probeRuns = new java.util.concurrent.atomic.AtomicLong(0)

  private def keyCol =
    if (dirGrain) col(partCol).cast("string") else col("file")

  /** Keys (relative file paths, or partition renderings at directory
    * grain) whose recorded stats DEFINITIVELY exclude the filters —
    * the union of the min/max envelope prune and the per-key BLOOM
    * prune (equality/IN predicates on columns with a recorded bloom,
    * where the envelope is useless when the column isn't clustered) —
    * or None when the filters carry no supported conjunct for either
    * tier. Both tiers are fail-open: see [[ZoneMap.prunedSet]] /
    * [[ZoneMap.bloomPrunedSet]]; each distinct probe memoizes its own
    * Spark action. */
  private def prunedKeys(dataFilters: Seq[Expression]): Option[Set[String]] = {
    val env = ZoneMap.envelopePredicate(dataFilters, statsCols).map { pred =>
      probeMemo.getOrElseUpdate("env:" + pred.toString, {
        probeRuns.incrementAndGet()
        ZoneMap.prunedSet(s, statsPath, Seq(keyCol), pred)
      })
    }
    val blooms = ZoneMap.equalityProbes(dataFilters, bloomCols).map {
      case (dataCol, lits) =>
        val memoKey = "bloom:" + dataCol + ":" +
          lits.map(_.toString).sorted.mkString(",")
        probeMemo.getOrElseUpdate(memoKey, {
          probeRuns.incrementAndGet()
          ZoneMap.bloomPrunedSet(s, statsPath, Seq(keyCol),
            bloomCols(dataCol), lits)
        })
    }
    val all = env.toSeq ++ blooms
    if (all.isEmpty) None
    else Some(all.reduce(_ ++ _).map(_.head))
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
    val pruned = prunedKeys(dataFilters)
    byDir.iterator
      .map { case (raw, files) => (raw, ZoneMap.valueOf(raw, partType), files) }
      .filter { case (raw, v, _) =>
        partPred.forall(_.eval(InternalRow(v))) &&
          !(dirGrain && pruned.exists(_.contains(raw)))
      }
      .map { case (_, v, files) =>
        val kept =
          if (dirGrain) files.values.toArray
          else pruned match {
            case Some(set) => files.collect {
              case (rel, st) if !set.contains(rel) => st }.toArray
            case None => files.values.toArray
          }
        PartitionDirectory(InternalRow(v), kept)
      }
      .filter(_.files.nonEmpty)
      .toSeq
  }
}

object ZoneMapFileIndex {
  /** Index-backed DataFrame over the tree, per-FILE skipping wired
    * (sidecar from [[StatsStore.writeFileStats]]): min/max envelopes
    * via `statsCols`, and optionally per-file BLOOM filters via
    * `bloomCols` (data column → sidecar bloom column) for
    * equality/IN predicates on columns the layout doesn't cluster —
    * where every file's min/max envelope spans the whole domain and
    * only a membership sketch can separate them (Delta's bloom
    * filter index). */
  def relation(s: SparkSession, treePath: String, partCol: String,
               statsPath: String,
               statsCols: Map[String, (String, String)],
               bloomCols: Map[String, String] = Map.empty): DataFrame =
    wire(s, new ZoneMapFileIndex(s, treePath, partCol, statsPath, statsCols,
      bloomCols = bloomCols))

  /** Index-backed DataFrame over the tree, per-DIRECTORY skipping
    * wired (sidecar from [[StatsStore.writeDirStats]] — q54's stats
    * table consumed inside the scan's planning). */
  def dirRelation(s: SparkSession, treePath: String, partCol: String,
                  statsPath: String,
                  statsCols: Map[String, (String, String)]): DataFrame =
    wire(s, new ZoneMapFileIndex(s, treePath, partCol, statsPath, statsCols,
      dirGrain = true))

  private def wire(s: SparkSession, idx: ZoneMapFileIndex): DataFrame = {
    val first = idx.inputFiles.headOption.getOrElse(
      throw new IllegalArgumentException(
        s"${idx.rootPaths.head} has no data files"))
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
