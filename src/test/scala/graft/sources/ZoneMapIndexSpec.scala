package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[ZoneMapFileIndex]]'s round-18 hardening on inline data: a null
  * partition directory neither crashes index construction (the r17
  * sort NPE) nor gets silently pruned; the file-grain prune FAILS
  * OPEN for files the sidecar doesn't know (stale sidecar after an
  * unhooked rewrite); the plan-time probe memoizes; and the
  * directory-grain mode serves q55's skip inside the scan's planning.
  */
class ZoneMapIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive._
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case s: FileSourceScanExec => Seq(s); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children }
      here ++ kids.flatMap(scans)
    }
    df.collect()
    scans(df.queryExecution.executedPlan).head
  }

  private def ms(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(col)
    df.select(cols.toIndexedSeq: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("a null partition directory survives index construction AND the dir-grain stats prune") {
    val tree = "target/test_zmi_null"
    val stats = "target/test_zmi_null_side"
    // p0: v [10,17]; p1: v [20,27]; null partition: v [24,31]
    val rows = (0 until 8).map(k => (k.toLong, 10.0 + k, "p0")) ++
      (8 until 16).map(k => (k.toLong, 12.0 + k, "p1")) ++
      (16 until 24).map(k => (k.toLong, 8.0 + k, null: String))
    val df = rows.toDF("k", "v", "part")
    df.write.mode("overwrite").partitionBy("part").parquet(tree)
    StatsStore.writeDirStats(spark, tree, stats, "part",
      Seq(StatsStore.ColSpec("v", "min_v", "max_v")))
    // construction alone used to NPE on sorting the null rendering
    val rel = ZoneMapFileIndex.dirRelation(spark, tree, "part", stats,
      Map("v" -> (("min_v", "max_v"))))
    // window [24,27] intersects p1 and the NULL directory, not p0
    val q = rel.filter($"v" >= 24.0 && $"v" <= 27.0)
    val plain = spark.read.parquet(tree)
      .filter($"v" >= 24.0 && $"v" <= 27.0)
    assert(ms(q) === ms(plain),
      "dir-grain skip lost the null partition's qualifying rows")
    assert(q.filter($"part".isNull).count() === 4L)
    assert(scanOf(q).metrics("numPartitions").value === 2)
  }

  test("file-grain prune fails OPEN: files a stale sidecar doesn't know stay planned") {
    val tree = "target/test_zmi_stale"
    val stats = "target/test_zmi_stale_side"
    val df = (0 until 32).map(k => (k.toLong, 10.0 + k, s"p${k / 16}"))
      .toDF("k", "v", "part")
    df.repartitionByRange(4, $"part", $"v")
      .write.mode("overwrite").partitionBy("part").parquet(tree)
    StatsStore.writeFileStats(spark, tree, stats, "part",
      Seq(StatsStore.ColSpec("v", "min_v", "max_v")))
    // rewrite p1's files WITHOUT a stats hook — new file names the
    // sidecar has never seen (the stale-sidecar hazard)
    val p1 = spark.read.parquet(s"$tree/part=p1").localCheckpoint(true)
    p1.repartition(2).write.mode("overwrite").parquet(s"$tree/part=p1")
    val rel = ZoneMapFileIndex.relation(spark, tree, "part", stats,
      Map("v" -> (("min_v", "max_v"))))
    // the window's rows now live ONLY in sidecar-unknown files
    val q = rel.filter($"v" >= 30.0 && $"v" <= 35.0)
    assert(q.count() === 6L,
      "fail-closed prune dropped sidecar-absent files")
    // and pruning still engages where the sidecar IS fresh: a p0
    // window plans fewer than the tree's total files (p0's fresh rows
    // prune to the intersecting file; p1's unknown files all stay —
    // that is fail-open, not a missed prune)
    val q0 = rel.filter($"v" >= 10.0 && $"v" <= 12.0)
    val total = rel.inputFiles.length
    val p0Files = spark.read.parquet(stats)
      .filter($"part" === "p0").count()
    assert(p0Files >= 2)
    assert(scanOf(q0).metrics("numFiles").value < total,
      s"no pruning at all: planned $total of $total files")
  }

  test("hive-escaped partition values: sidecar file keys match the index's FileStatus keys (URI-decode round-trip)") {
    val tree = "target/test_zmi_escape"
    val stats = "target/test_zmi_escape_side"
    // values hive-escapes to % sequences ('a:b' → a%3Ab) and a space
    // (kept literal by hive, URI-encoded by input_file_name) — the
    // r17-advice divergence between input_file_name's URI rendering
    // and the FileStatus names the index keys on
    val df = (0 until 16)
      .map(k => (k.toLong, 10.0 + k, if (k < 8) "a:b" else "x y"))
      .toDF("k", "v", "part")
    df.repartitionByRange(4, $"part", $"v")
      .write.mode("overwrite").partitionBy("part").parquet(tree)
    StatsStore.writeFileStats(spark, tree, stats, "part",
      Seq(StatsStore.ColSpec("v", "min_v", "max_v")))
    // the sidecar's keys are exactly the on-disk relative paths
    val inStats = spark.read.parquet(stats)
      .select("file").collect().map(_.getString(0)).toSet
    val root = new org.apache.hadoop.fs.Path(tree)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(root).iterator
      .filter(d => d.isDirectory && d.getPath.getName.contains("="))
      .flatMap(d => fs.listStatus(d.getPath).iterator
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
        .map(f => s"${d.getPath.getName}/${f.getPath.getName}"))
      .toSet
    assert(inStats === onDisk,
      s"key divergence: only-stats=${inStats -- onDisk} " +
        s"only-disk=${onDisk -- inStats}")
    assert(onDisk.exists(_.startsWith("part=a%3Ab/")), onDisk)
    // and the skip ENGAGES through the matched keys (were they
    // divergent, fail-open would keep everything — correct but skipless)
    val rel = ZoneMapFileIndex.relation(spark, tree, "part", stats,
      Map("v" -> (("min_v", "max_v"))))
    val q = rel.filter($"v" >= 10.0 && $"v" <= 12.0)
    assert(ms(q) === ms(spark.read.parquet(tree)
      .filter($"v" >= 10.0 && $"v" <= 12.0)))
    assert(scanOf(q).metrics("numFiles").value < onDisk.size)
  }

  test("the plan-time probe memoizes: one sidecar job per predicate across repeated listFiles") {
    val tree = "target/test_zmi_memo"
    val stats = "target/test_zmi_memo_side"
    val df = (0 until 32).map(k => (k.toLong, 10.0 + k, s"p${k / 16}"))
      .toDF("k", "v", "part")
    df.repartitionByRange(4, $"part", $"v")
      .write.mode("overwrite").partitionBy("part").parquet(tree)
    StatsStore.writeFileStats(spark, tree, stats, "part",
      Seq(StatsStore.ColSpec("v", "min_v", "max_v")))
    val idx = new ZoneMapFileIndex(spark, tree, "part", stats,
      Map("v" -> (("min_v", "max_v"))))
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.DoubleType
    val v = AttributeReference("v", DoubleType)()
    val filters = Seq[Expression](
      GreaterThanOrEqual(v, Literal(12.0)), LessThanOrEqual(v, Literal(15.0)))
    val first = idx.listFiles(Nil, filters)
    val second = idx.listFiles(Nil, filters)
    assert(first.map(_.files.toSeq) === second.map(_.files.toSeq))
    assert(idx.probeRuns.get() === 1L,
      s"expected 1 memoized sidecar probe, ran ${idx.probeRuns.get()}")
    // a DIFFERENT predicate is its own probe
    idx.listFiles(Nil, Seq[Expression](LessThan(v, Literal(11.0))))
    assert(idx.probeRuns.get() === 2L)
  }

  // ---------------------------------------------------------------
  // the BLOOM tier: equality/IN skipping where envelopes can't
  // ---------------------------------------------------------------

  /** ids 0..31 range-clustered into 4 files (2 per partition), bloom
    * sidecar on id, NO envelope columns wired — any skip below is the
    * bloom's alone. */
  private def bloomFixture(tree: String, stats: String) = {
    val df = (0 until 32).map(k => (k.toLong, 10.0 + k, s"p${k / 16}"))
      .toDF("id", "v", "part")
    df.repartitionByRange(4, $"part", $"id")
      .write.mode("overwrite").partitionBy("part").parquet(tree)
    StatsStore.writeFileStats(spark, tree, stats, "part", cols = Nil,
      blooms = Seq(StatsStore.BloomSpec("id", "bf_id", 1024L)))
  }

  test("bloom prune: a point lookup plans only files that might contain the key") {
    val tree = "target/test_zmi_bloom"
    val stats = "target/test_zmi_bloom_side"
    bloomFixture(tree, stats)
    val rel = ZoneMapFileIndex.relation(spark, tree, "part", stats,
      Map.empty, Map("id" -> "bf_id"))
    val q = rel.filter($"id" === 5L)
    assert(ms(q) === ms(spark.read.parquet(tree).filter($"id" === 5L)))
    // id=5 lives in exactly one file; false positives could add at
    // most the other files' blooms (deterministic — pinned < total)
    val planned = scanOf(q).metrics("numFiles").value
    assert(planned < 4, s"bloom pruned nothing: planned $planned of 4")
    // a key NOT in the table prunes everything (zero files, zero rows)
    assert(rel.filter($"id" === 999L).count() === 0L)
  }

  test("bloom IN-list: a file is pruned only when NO candidate might be present") {
    val tree = "target/test_zmi_bloom_in"
    val stats = "target/test_zmi_bloom_in_side"
    bloomFixture(tree, stats)
    val rel = ZoneMapFileIndex.relation(spark, tree, "part", stats,
      Map.empty, Map("id" -> "bf_id"))
    // 5 (first p0 file) and 20 (first p1 file): both files planned,
    // the other two pruned; result exact
    val q = rel.filter($"id".isin(5L, 20L))
    assert(ms(q) ===
      ms(spark.read.parquet(tree).filter($"id".isin(5L, 20L))))
    assert(scanOf(q).metrics("numFiles").value < 4)
  }

  test("bloom prune fails OPEN: a null bloom cell keeps its file planned") {
    val tree = "target/test_zmi_bloom_null"
    val stats = "target/test_zmi_bloom_null_side"
    bloomFixture(tree, stats)
    // null out the bloom of the file holding id=5 — as after a stats
    // refresh that didn't recompute blooms
    val side = spark.read.parquet(stats).localCheckpoint(true)
    import org.apache.spark.sql.functions.{min => fmin, when => fwhen, lit => flit}
    val target = side.filter($"part" === "p0")
      .orderBy($"file").select("file").collect().map(_.getString(0))
    val withNull = side.withColumn("bf_id",
      fwhen($"file" === target.head, flit(null)).otherwise($"bf_id"))
    withNull.write.mode("overwrite").parquet(stats)
    val rel = ZoneMapFileIndex.relation(spark, tree, "part", stats,
      Map.empty, Map("id" -> "bf_id"))
    // a lookup for a key in the NULLED file still finds it
    val inNulled = spark.read.parquet(s"$tree/${target.head}")
      .select("id").collect().map(_.getLong(0)).min
    assert(rel.filter($"id" === inNulled).count() === 1L,
      "fail-closed bloom prune dropped the null-cell file")
  }

  test("bloom probes memoize and compose with the envelope tier") {
    val tree = "target/test_zmi_bloom_memo"
    val stats = "target/test_zmi_bloom_memo_side"
    val df = (0 until 32).map(k => (k.toLong, 10.0 + k, s"p${k / 16}"))
      .toDF("id", "v", "part")
    df.repartitionByRange(4, $"part", $"id")
      .write.mode("overwrite").partitionBy("part").parquet(tree)
    StatsStore.writeFileStats(spark, tree, stats, "part",
      cols = Seq(StatsStore.ColSpec("v", "min_v", "max_v")),
      blooms = Seq(StatsStore.BloomSpec("id", "bf_id", 1024L)))
    val idx = new ZoneMapFileIndex(spark, tree, "part", stats,
      Map("v" -> (("min_v", "max_v"))), bloomCols = Map("id" -> "bf_id"))
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val id = AttributeReference("id", LongType)()
    val v = AttributeReference("v", DoubleType)()
    // equality + range together: one bloom probe + one envelope probe
    val filters = Seq[Expression](
      EqualTo(id, Literal(5L)), LessThanOrEqual(v, Literal(20.0)))
    val first = idx.listFiles(Nil, filters)
    idx.listFiles(Nil, filters)
    assert(idx.probeRuns.get() === 2L,
      s"expected 2 memoized probes (bloom + envelope), " +
        s"ran ${idx.probeRuns.get()}")
    // both tiers engaged: only id=5's file (which also satisfies the
    // envelope) survives
    assert(first.map(_.files.length).sum < 4)
  }
}
