package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The round-18 table-format hardening of [[VersionedTable]], pinned
  * on inline data: multi-column partitioning (nested directories,
  * two-level pruning, hive-escape round-trip on every column), schema
  * evolution as a commit (each version serves its OWN schema), crash-
  * consistent vacuum ordering (every existing manifest always fully
  * readable), OPTIMIZE ZORDER BY (both-dims-bounded file envelopes,
  * relation-identical, history intact), optimistic-concurrency retry,
  * and the FAIL-OPEN stats-pruning contract of
  * [[VersionedFileIndex]] (null partition + sidecar-absent
  * directories stay live; the plan-time probe memoizes).
  */
class VersionedTableFormatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ms(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(col)
    df.select(cols.toIndexedSeq: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---------------------------------------------------------------
  // multi-column partitioning
  // ---------------------------------------------------------------

  private def mcTable = (0L until 48L)
    .map(k => (k, s"n$k", k * 1.0, s"m${k % 3}", (k % 2).toString))
    .toDF("k", "name", "v", "m", "src")

  test("multi-column: init + merge commit + AS-OF read over a (m, src) layout") {
    val path = "target/test_vt_mc"
    VersionedTable.initMulti(spark, path, mcTable, Seq("m", "src"))
    // the manifest accounts nested directories (m=…/src=…/file)
    val m0 = VersionedTable.manifest(spark, path, 0L)
    assert(m0.nonEmpty && m0.forall(_.split("/").length === 3), m0.take(3))
    assert(ms(VersionedTable.snapshot(spark, path, 0L)) === ms(mcTable))
    // a merge batch: update k=1 (m1/src=1), delete k=2 (m2/src=0),
    // insert k=100 into m0/src=1
    val ch = Seq(
      (1L, "upd", 111.0, "m1", "1", "U"),
      (2L, "del", 0.0, "m2", "0", "D"),
      (100L, "ins", 100.0, "m0", "1", "I")
    ).toDF("k", "name", "v", "m", "src", "op")
    val v1 = VersionedTable.commitMergeMulti(spark, path, Seq("m", "src"),
      ch, "k")
    assert(v1 === 1L)
    val exp1 = graft.operators.MergeInto(mcTable, ch, "k")
    assert(ms(VersionedTable.snapshot(spark, path, 1L)) === ms(exp1))
    assert(ms(VersionedTable.snapshot(spark, path, 0L)) === ms(mcTable))
    // untouched leaf directories' manifest entries carried forward:
    // only the three touched (m,src) leaves changed
    val m1 = VersionedTable.manifest(spark, path, 1L)
    val touched = Set("m=m1/src=1", "m=m2/src=0", "m=m0/src=1")
    def dirOf(f: String) = f.substring(0, f.lastIndexOf('/'))
    assert(m0.filterNot(f => touched(dirOf(f))).toSet ===
      m1.filterNot(f => touched(dirOf(f))).toSet)
    assert(m1.filter(f => touched(dirOf(f)))
      .forall(f => !m0.contains(f)))
  }

  test("multi-column: the index prunes on either or both partition columns") {
    val path = "target/test_vt_mc_prune"
    VersionedTable.initMulti(spark, path, mcTable, Seq("m", "src"))
    def scan(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.execution._
      import org.apache.spark.sql.execution.adaptive._
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
        val here = p match {
          case s: FileSourceScanExec => Seq(s); case _ => Nil
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        here ++ kids.flatMap(scans)
      }
      df.collect()
      scans(df.queryExecution.executedPlan).head
    }
    val rel = VersionedTable.snapshotRelationMulti(spark, path,
      Seq("m", "src"))
    // both columns: 1 of 6 leaves; one column: 2 of 6
    val both = scan(rel.filter($"m" === "m1" && $"src" === "1"))
    assert(both.metrics("numPartitions").value === 1)
    val one = scan(rel.filter($"m" === "m1"))
    assert(one.metrics("numPartitions").value === 2)
    // and the relation is exact either way
    assert(ms(rel.filter($"m" === "m1")) ===
      ms(mcTable.filter($"m" === "m1")))
  }

  test("multi-column: hive-escaped values round-trip on BOTH columns through commit accounting") {
    val path = "target/test_vt_mc_escape"
    val et = Seq(
      (1L, 1.0, "a:b", "c=d"),
      (2L, 2.0, "a:b", "e f"),
      (3L, 3.0, "p*q", "c=d")
    ).toDF("k", "v", "pa", "pb")
    VersionedTable.initMulti(spark, path, et, Seq("pa", "pb"))
    // every manifest entry's directory segments are hive-ESCAPED
    val m0 = VersionedTable.manifest(spark, path, 0L)
    assert(m0.exists(_.startsWith("pa=a%3Ab/pb=c%3Dd/")), m0)
    val ch = Seq((1L, 111.0, "a:b", "c=d", "U"))
      .toDF("k", "v", "pa", "pb", "op")
    val v1 = VersionedTable.commitMergeMulti(spark, path, Seq("pa", "pb"),
      ch, "k")
    val exp = graft.operators.MergeInto(et, ch, "k")
    assert(ms(VersionedTable.snapshot(spark, path, v1)) === ms(exp))
    // the index-backed read unescapes back to the data values
    assert(ms(VersionedTable.snapshotRelationMulti(spark, path,
      Seq("pa", "pb"), v1)) === ms(exp))
    // only the one touched leaf was rewritten
    val m1 = VersionedTable.manifest(spark, path, v1)
    assert(m0.filterNot(_.startsWith("pa=a%3Ab/pb=c%3Dd/")).toSet ===
      m1.filterNot(_.startsWith("pa=a%3Ab/pb=c%3Dd/")).toSet)
  }

  // ---------------------------------------------------------------
  // schema evolution as a commit
  // ---------------------------------------------------------------

  private def evoTable = (0L until 32L)
    .map(k => (k, s"n$k", k * 1.0, s"p${k % 4}"))
    .toDF("k", "name", "v", "part")

  test("schema evolution: an arriving column widens the commit, history keeps its own schema, and the default refuses") {
    val path = "target/test_vt_evolve"
    VersionedTable.init(spark, path, evoTable, "part")
    val ch = Seq(
      (1L, "upd", 111.0, "p1", "gold", "U"),
      (200L, "ins", 200.0, "p2", "silver", "I")
    ).toDF("k", "name", "v", "part", "tier", "op")
    // no silent drop: unknown column without the opt-in is an error
    intercept[IllegalArgumentException] {
      VersionedTable.commitMerge(spark, path, "part", ch, "k")
    }
    assert(VersionedTable.versions(spark, path) === Seq(0L))
    val v1 = VersionedTable.commitMerge(spark, path, "part", ch, "k",
      evolveSchema = true)
    val s1 = VersionedTable.snapshot(spark, path, v1)
    assert(s1.columns.contains("tier"))
    // arriving rows carry the value; carried rows serve a typed null —
    // including rows in UNTOUCHED partitions' old files
    val byK = s1.select($"k", $"tier").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byK(1L) === "gold" && byK(200L) === "silver")
    assert(byK(0L) === null && byK(3L) === null)
    // AS-OF v0 serves the PRE-evolution schema
    assert(!VersionedTable.snapshot(spark, path, 0L).columns.contains("tier"))
    // the index-backed read serves the same evolved relation
    assert(ms(VersionedTable.snapshotRelation(spark, path, "part", v1)) ===
      ms(s1))
    // and a later non-evolving commit carries the evolved schema
    val ch2 = Seq((5L, "upd2", 555.0, "p1", "x", "U"))
      .toDF("k", "name", "v", "part", "tier", "op")
    val v2 = VersionedTable.commitMerge(spark, path, "part", ch2, "k")
    assert(VersionedTable.snapshot(spark, path, v2).columns.contains("tier"))
  }

  // ---------------------------------------------------------------
  // crash-consistent vacuum
  // ---------------------------------------------------------------

  test("vacuum is crash-consistent: manifests drop first, a torn sweep re-runs, every existing manifest always reads") {
    val path = "target/test_vt_vacuum_torn"
    VersionedTable.init(spark, path, evoTable, "part")
    val ch = Seq((1L, "upd", 111.0, "p1", "U")).toDF("k", "name", "v", "part", "op")
    VersionedTable.commitMerge(spark, path, "part", ch, "k")
    val exp1 = ms(VersionedTable.snapshot(spark, path, 1L))
    val m0 = VersionedTable.manifest(spark, path, 0L).toSet
    val m1 = VersionedTable.manifest(spark, path, 1L).toSet
    // simulate the torn vacuum the ORDERING guarantees safe: the
    // dropped manifest is gone, the orphan sweep never ran
    val fs = fsOf(path)
    fs.delete(new org.apache.hadoop.fs.Path(path,
      "_graft_log/00000000.manifest"), false)
    // invariant: every manifest that still exists reads fully
    assert(VersionedTable.versions(spark, path) === Seq(1L))
    assert(ms(VersionedTable.snapshot(spark, path, 1L)) === exp1)
    // the re-run completes the sweep: exactly v0's superseded files go
    val deleted = VersionedTable.vacuum(spark, path, keepFrom = 1L)
    assert(deleted.toSet === (m0 -- m1))
    assert(ms(VersionedTable.snapshot(spark, path, 1L)) === exp1)
  }

  // ---------------------------------------------------------------
  // OPTIMIZE ZORDER BY
  // ---------------------------------------------------------------

  test("OPTIMIZE ZORDER: relation identical, history reads, file envelopes bounded on BOTH dims, vacuum reclaims") {
    val path = "target/test_vt_zorder"
    val grid = (for { a <- 0 until 32; b <- 0 until 32 }
      yield (a.toLong * 32 + b, a.toLong, b.toLong, "p0")).toSeq
      .toDF("k", "da", "db", "part")
    VersionedTable.init(spark, path, grid, "part")
    val exp = ms(VersionedTable.snapshot(spark, path, 0L))
    val m0 = VersionedTable.manifest(spark, path, 0L)
    val v1 = VersionedTable.commitOptimizeZOrder(spark, path, "part",
      "da", "db", filesPerDir = 16)
    assert(v1 === 1L)
    // identical relation (the z-value never reaches the data), and
    // the schema is unchanged
    val s1 = VersionedTable.snapshot(spark, path, 1L)
    assert(ms(s1) === exp)
    assert(s1.columns.sorted.toSeq === Seq("da", "db", "k", "part"))
    // history reads across the rewrite
    assert(ms(VersionedTable.snapshot(spark, path, 0L)) === exp)
    // the z-tiling produced a real multi-file layout whose per-file
    // envelopes are bounded on BOTH dims: a band predicate on EITHER
    // dim intersects a minority of files (1-D sort layouts bound only
    // their own sort column — the other dim's band hits every file)
    val m1 = VersionedTable.manifest(spark, path, 1L)
    assert(m1.size >= 12, s"z-rewrite produced only ${m1.size} files")
    val envs = m1.map { f =>
      val r = spark.read.parquet(s"$path/$f")
        .agg(org.apache.spark.sql.functions.min($"da"),
          org.apache.spark.sql.functions.max($"da"),
          org.apache.spark.sql.functions.min($"db"),
          org.apache.spark.sql.functions.max($"db")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val daBand = envs.count { case (a0, a1, _, _) => a1 >= 2L && a0 <= 5L }
    val dbBand = envs.count { case (_, _, b0, b1) => b1 >= 2L && b0 <= 5L }
    assert(daBand <= m1.size / 2,
      s"da band hits $daBand of ${m1.size} files — da not bounded")
    assert(dbBand <= m1.size / 2,
      s"db band hits $dbBand of ${m1.size} files — db not bounded")
    // vacuum reclaims exactly the pre-optimize files
    val deleted = VersionedTable.vacuum(spark, path, keepFrom = 1L)
    assert(deleted.toSet === m0.toSet)
    assert(ms(VersionedTable.snapshot(spark, path, 1L)) === exp)
  }

  // ---------------------------------------------------------------
  // optimistic concurrency
  // ---------------------------------------------------------------

  test("retry-with-rebase: a commit that loses the manifest race rebases on the new version and lands") {
    val path = "target/test_vt_retry"
    VersionedTable.init(spark, path, evoTable, "part")
    val chA = Seq((1L, "updA", 111.0, "p1", "U"))
      .toDF("k", "name", "v", "part", "op")
    val chB = Seq((2L, "updB", 222.0, "p2", "U"))
      .toDF("k", "name", "v", "part", "op")
    // interleave writer B at exactly the conflict window of writer A:
    // A has appended its data and audited rows, but not yet committed
    var fired = false
    VersionedTable.preCommitHook = () => {
      if (!fired) {
        fired = true
        // B commits v1 while A is mid-commit
        VersionedTable.commitMerge(spark, path, "part", chB, "k")
      }
    }
    try {
      val vA = VersionedTable.commitMergeWithRetry(spark, path, "part",
        chA, "k")
      assert(vA === 2L, "A should land AFTER B via rebase")
    } finally VersionedTable.preCommitHook = () => ()
    assert(VersionedTable.versions(spark, path) === Seq(0L, 1L, 2L))
    // both changes present — the serialized result equals sequential
    // application (disjoint keys/partitions, order-free)
    val exp = graft.operators.MergeInto(
      graft.operators.MergeInto(evoTable, chB, "k"), chA, "k")
    assert(ms(VersionedTable.snapshot(spark, path, 2L)) === ms(exp))
    // A's lost first attempt left stray files no manifest names;
    // vacuum sweeps them and every kept version still reads
    VersionedTable.vacuum(spark, path, keepFrom = 2L)
    assert(ms(VersionedTable.snapshot(spark, path, 2L)) === ms(exp))
  }

  // ---------------------------------------------------------------
  // fail-open stats pruning in the index
  // ---------------------------------------------------------------

  test("stats skipping keeps the null partition live when its envelope intersects (the r17 superset-safety hole)") {
    val path = "target/test_vt_nullpart"
    val stats = "target/test_vt_nullpart_side"
    // p0: v in [10, 17]; p1: v in [20, 27]; NULL partition: v in [24, 31]
    val rows = (0 until 8).map(k => (k.toLong, 10.0 + k, "p0")) ++
      (8 until 16).map(k => (k.toLong, 12.0 + k, "p1")) ++
      (16 until 24).map(k => (k.toLong, 8.0 + k, null: String))
    val df = rows.toDF("k", "v", "part")
    VersionedTable.init(spark, path, df, "part")
    val cols = Seq(StatsStore.ColSpec("v", "min_v", "max_v"))
    StatsStore.writeDirStats(spark, path, stats, "part", cols)
    val rel = VersionedTable.snapshotRelation(spark, path, "part",
      statsPath = Some(stats), statsCols = Map("v" -> (("min_v", "max_v"))))
    // window [24, 27] intersects p1 AND the null partition, not p0
    val q = rel.filter($"v" >= 24.0 && $"v" <= 27.0)
    val plain = VersionedTable.snapshot(spark, path)
      .filter($"v" >= 24.0 && $"v" <= 27.0)
    assert(ms(q) === ms(plain),
      "stats skip lost the null partition's qualifying rows")
    assert(q.filter($"part".isNull).count() === 4L)
    // and p0 was actually pruned (the skip still skips)
    q.collect()
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive._
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case s: FileSourceScanExec => Seq(s); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case qs: QueryStageExec => Seq(qs.plan)
        case other => other.children }
      here ++ kids.flatMap(scans)
    }
    assert(scans(q.queryExecution.executedPlan).head
      .metrics("numPartitions").value === 2)
  }

  test("stats skipping fails OPEN: a directory the sidecar doesn't know stays live") {
    val path = "target/test_vt_failopen"
    val stats = "target/test_vt_failopen_side"
    val df = (0 until 16).map(k => (k.toLong, 10.0 + k, s"p${k / 8}"))
      .toDF("k", "v", "part")
    VersionedTable.init(spark, path, df, "part")
    val cols = Seq(StatsStore.ColSpec("v", "min_v", "max_v"))
    StatsStore.writeDirStats(spark, path, stats, "part", cols)
    // a later commit lands a NEW partition p9 — and nothing refreshes
    // the sidecar (the stale-sidecar hazard)
    val ch = Seq((100L, 24.5, "p9", "I")).toDF("k", "v", "part", "op")
    val v1 = VersionedTable.commitMerge(spark, path, "part", ch, "k")
    val rel = VersionedTable.snapshotRelation(spark, path, "part", v1,
      statsPath = Some(stats), statsCols = Map("v" -> (("min_v", "max_v"))))
    // the window hits only p9's row — which the sidecar has never seen
    val q = rel.filter($"v" >= 24.2 && $"v" <= 24.8)
    assert(q.count() === 1L,
      "fail-closed prune dropped a sidecar-absent directory")
  }

  test("the plan-time stats probe memoizes: one sidecar job per predicate across repeated listFiles") {
    val path = "target/test_vt_memo"
    val stats = "target/test_vt_memo_side"
    val df = (0 until 16).map(k => (k.toLong, 10.0 + k, s"p${k / 8}"))
      .toDF("k", "v", "part")
    VersionedTable.init(spark, path, df, "part")
    val cols = Seq(StatsStore.ColSpec("v", "min_v", "max_v"))
    StatsStore.writeDirStats(spark, path, stats, "part", cols)
    val idx = new VersionedFileIndex(spark, path, Seq("part"), 0L,
      Some(stats), Map("v" -> (("min_v", "max_v"))))
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
    // the probe pruned: only p0's envelope [10,17] intersects [12,15]
    assert(first.size === 1)
  }
}
