package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic `Column` ⇄ Catalyst `Expression` converters,
  * which became `private[sql]` with Spark 4's Connect/classic API
  * split. Lives under `org.apache.spark.sql` for access — the standard
  * pattern for Spark-native extension libraries shipping custom
  * Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame — the constructor custom
    * logical operators (e.g. [[graft.plans.GroupedTopK]]) need;
    * `Dataset.ofRows` is `private[sql]`, hence this bridge.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** True if `df`'s logical plan is already in the session cache —
    * lets iterative loops reuse a sibling query's materialization
    * instead of re-persisting the same plan ("Asked to cache already
    * cached data" warnings). `CacheManager.lookupCachedData` is
    * `private[sql]`, hence this bridge.
    */
  def isCached(df: org.apache.spark.sql.DataFrame): Boolean = {
    val cd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    cd.sparkSession.sharedState.cacheManager.lookupCachedData(cd).isDefined
  }

  /** Release the pinned RDD behind a `localCheckpoint`ed Dataset.
    * `Dataset.checkpoint` stores the materialized rows in an internal
    * RDD referenced only by the returned plan's `LogicalRDD` node;
    * nothing public unpersists it, so an iterative loop that
    * checkpoints on cadence would otherwise leave every superseded
    * checkpoint pinned until GC/ContextCleaner. No-op on
    * non-checkpoint plans.
    */
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit = {
    val cd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    cd.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** A session bound to exactly `sc` — for code handed bare RDDs (the
    * GraphX paths) that must not adopt a stranger active session in a
    * multi-session driver. `Builder.sparkContext` is `private[spark]`,
    * hence this bridge.
    */
  def sessionFor(sc: org.apache.spark.SparkContext): org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.classic.SparkSession.builder()
      .sparkContext(sc).getOrCreate()

  /** Re-wrap a batch DataFrame's physical rows as a STREAMING frame —
    * what a DSv1 streaming `Source.getBatch` must return (the
    * FileStreamSource recipe: the engine rejects a non-streaming
    * child under a streaming sink). `internalCreateDataFrame` is
    * `private[sql]`, hence this bridge.
    */
  def asStreamingFrame(spark: org.apache.spark.sql.SparkSession,
      batch: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      batch.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.toRdd,
      batch.schema, isStreaming = true)
  }

  /** Block until every queued listener event is delivered — lets a
    * measurement harness read task-metric tallies after an action
    * (events post async). `listenerBus` is `private[spark]`, hence
    * this bridge.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Synchronously close every loaded state-store provider on this
    * JVM's executors. `StreamingQuery.stop()` does NOT unload the
    * query's state stores — RocksDB instances stay open until the
    * lazy maintenance pass or JVM shutdown, and closing a RocksDB
    * whose checkpoint/working directory was already deleted sprays
    * `MANIFEST verification on Close` ERRORs over teardown (the spew
    * that displaced the bench JSON from two rounds of driver
    * artifacts). Callers unload BEFORE deleting a stopped query's
    * directories; providers reload on demand, so this is always safe.
    */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()

  /** Write a file-sink commit log (`_spark_metadata`) at `outputDir`
    * declaring exactly `files` as batch 0's committed output — the
    * re-registration step of compacting a STREAMING sink's directory:
    * the compacted files are a fresh, complete snapshot, and readers
    * of a dir containing `_spark_metadata` serve ONLY manifest-listed
    * files, so a stale or partially-written stray file is invisible
    * (the same exactly-once read contract the original sink gave).
    * Uses Spark's own `FileStreamSinkLog` (VERSION, serialization,
    * compaction cadence), not a hand-rolled format — the log stays
    * readable by any Spark that can read the original sink's.
    * `FileStreamSinkLog`/`SinkFileStatus` are `private[sql]`, hence
    * this bridge.
    */
  def writeSinkManifest(spark: org.apache.spark.sql.SparkSession,
      outputDir: String,
      files: Seq[org.apache.hadoop.fs.FileStatus],
      batchId: Long = 0L): Unit = {
    import org.apache.spark.sql.execution.streaming.sinks.{FileStreamSinkLog, SinkFileStatus}
    val logDir = new org.apache.hadoop.fs.Path(
      outputDir, org.apache.spark.sql.execution.streaming.sinks.FileStreamSink.metadataDir)
    val log = new FileStreamSinkLog(FileStreamSinkLog.VERSION,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      logDir.toString)
    require(log.add(batchId, files.map(SinkFileStatus.apply).toArray),
      s"sink manifest batch $batchId already committed at $logDir")
  }

  /** The latest batch id committed to a file sink's `_spark_metadata`
    * log at `outputDir`, or -1 if the log doesn't exist yet — lets
    * incremental sink re-compaction detect how far its appended
    * increments actually committed (torn-increment recovery). */
  def sinkLogLatestBatch(spark: org.apache.spark.sql.SparkSession,
      outputDir: String): Long = {
    import org.apache.spark.sql.execution.streaming.sinks.{FileStreamSink, FileStreamSinkLog}
    val logDir = new org.apache.hadoop.fs.Path(
      outputDir, FileStreamSink.metadataDir)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir)) return -1L
    val log = new FileStreamSinkLog(FileStreamSinkLog.VERSION,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      logDir.toString)
    log.getLatest().map(_._1).getOrElse(-1L)
  }

  /** Register the graft SQL functions on an ALREADY-BUILT session
    * (sessions built with `GraftExtensions` don't need this). Uses the
    * session's function registry, which is `private[sql]`.
    */
  def registerGraftFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    graft.functions.GraftExtensions.descriptors.foreach {
      case (ident, info, builder) =>
        registry.registerFunction(ident, info, builder)
    }
  }
}
