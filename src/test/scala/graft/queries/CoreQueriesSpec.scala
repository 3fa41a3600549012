package graft.queries

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CoreQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketized range join equals the naive range-predicate form") {
    val bucketized = CoreQueries.q29_range_join(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ev = Tables.events(spark, sf)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("u"),
        col("ts").as("err_ts"))
    val naive = err.join(ev, col("user_id") === col("u") &&
        col("ts") > col("err_ts") &&
        col("ts") <= col("err_ts") + expr("INTERVAL 10 MINUTES"))
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bucketized === naive)
    assert(bucketized.nonEmpty)
  }

  test("grouping sets emit exactly detail + rf marginal + grand total") {
    val rows = CoreQueries.q36_grouping_sets(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val detail = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val rfMarginal = detail.groupBy(_._1).map { case (rf, g) =>
      (rf, "ALL", g.map(_._3).sum)
    }.toSet
    val total = Set(("ALL", "ALL", detail.map(_._3).sum))
    // no ls marginal — the set that distinguishes GROUPING SETS from CUBE
    assert(rows === detail ++ rfMarginal ++ total)
  }

  test("range frame equals the brute-force value-window definition") {
    val got = CoreQueries.q37_range_frame(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val raw = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("sec"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = raw.groupBy(_._2)
    // every event's trailing sum = sum of SAME-USER raw values within
    // [sec-600, sec] — including equal-sec peers AFTER it in any row
    // order (RANGE is tie-insensitive; a ROWS frame would differ
    // exactly there)
    got.foreach { case (id, u, sec, trailing) =>
      val want = byUser(u).filter(e => e._3 >= sec - 600 && e._3 <= sec)
        .map(e => BigDecimal(e._4).setScale(2)).sum.toDouble
      assert(trailing === want, s"event $id")
    }
    assert(got.length === raw.length)
    // the frame actually bounds: some trailing sum < its user's total
    assert(byUser.exists { case (u, es) =>
      val totals = got.filter(_._2 == u).map(_._4)
      totals.min < es.map(e => BigDecimal(e._4).setScale(2)).sum.toDouble
    })
  }

  test("transition matrix rows are normalized and counts match brute force") {
    val got = CoreQueries.q45_transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // per-from probabilities sum to 1 (exact: the terms share one
    // denominator)
    got.groupBy(_._1._1).foreach { case (from, cells) =>
      val tot = cells.head._2._2
      assert(cells.map(_._2._1).sum === tot, from)
      assert(math.abs(cells.map(_._2._3).sum - 1.0) < 1e-9, from)
    }
    val brute = graft.Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3)))
      .groupBy(_._1).toSeq.flatMap { case (_, evs) =>
        val types = evs.sortBy(e => (e._4.getTime, e._2)).map(_._3)
        types.zip(types.drop(1))
      }.groupBy(p => p).map { case (k, v) => k -> v.size.toLong }
    assert(got.view.mapValues(_._1).toMap === brute)
  }

  test("retention matrix matches the brute-force cohort definition") {
    val got = CoreQueries.q44_retention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

    val act = graft.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_date(to_date(ts))").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val cohort = act.groupBy(_._1).map { case (u, v) => u -> v.map(_._2).min }
    val sizes = cohort.values.groupBy(identity).map { case (d, v) => d -> v.size.toLong }
    val expected = act.groupBy { case (u, d) => (cohort(u), d - cohort(u)) }
      .map { case ((c, age), v) =>
        (c, age) -> ((v.size.toLong, sizes(c), v.size.toDouble / sizes(c)))
      }
    assert(got === expected)
    // age-0 cells are complete cohorts (everyone is active on day 0)
    got.collect { case ((_, 0L), (n, sz, r)) =>
      assert(n === sz && r === 1.0)
    }
  }

  test("histogram quantiles bracket the exact percentiles within one bin") {
    val hist = CoreQueries.q43_histogram_quantile(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val exact = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.75)").as("p75"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val W = 4096.0
    assert(hist.keySet === exact.keySet)
    hist.foreach { case (rf, (b25, b50, b75)) =>
      val (e25, e50, e75) = exact(rf)
      // the sketch's bin contains the true value to within one bin
      // either side (exact percentiles interpolate between order
      // statistics, which can straddle a bin edge)
      assert((b25 - 1) * W <= e25 && e25 < (b25 + 2) * W, s"$rf p25")
      assert((b50 - 1) * W <= e50 && e50 < (b50 + 2) * W, s"$rf p50")
      assert((b75 - 1) * W <= e75 && e75 < (b75 + 2) * W, s"$rf p75")
    }
  }

  test("approx_count_distinct stays within 2% of exact on the fixed fixture") {
    // q30's oracle gate is a loose 8% (rsd=0.02 is a std-dev, not a
    // bound, so the cross-sf hard gate needs headroom); the tight 2%
    // is pinned HERE against this fixed fixture so a sketch regression
    // fails first.
    val rows = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getLong(1); val e = r.getLong(2)
      assert(math.abs(a - e) <= e * 0.02,
        s"flag=${r.get(0)} approx=$a exact=$e outside 2%")
    }
    // and the shipped query's loose gate is green
    CoreQueries.q30_approx_distinct(spark, sf).collect()
      .foreach(r => assert(r.getBoolean(2)))
  }

  test("reconstructAsOf walks the time dial: pre-update, update-wins, post-delete") {
    // q56's oracle pins T=2 only; this fixture pins the DIAL — the
    // same log replayed at each epoch boundary gives each regime.
    import spark.implicits._
    val log = Seq(
      (1L, 10.0, "I", 1L), (2L, 20.0, "I", 1L), (3L, 30.0, "I", 1L),
      (2L, 22.0, "U", 2L),                      // update key 2 at t=2
      (3L, 0.0, "D", 3L),                       // delete key 3 at t=3
      (4L, 40.0, "I", 3L)                       // late insert at t=3
    ).toDF("k", "v", "op", "change_ts")
    def at(t: Long): Seq[(Long, Double)] =
      CoreQueries.reconstructAsOf(log, "k", t)
        .select(col("k"), col("v")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(at(1L) === Seq(1L -> 10.0, 2L -> 20.0, 3L -> 30.0),
      "T=1: the original inserts, untouched")
    assert(at(2L) === Seq(1L -> 10.0, 2L -> 22.0, 3L -> 30.0),
      "T=2: the update wins its key; the later delete is invisible")
    assert(at(3L) === Seq(1L -> 10.0, 2L -> 22.0, 4L -> 40.0),
      "T=3: key 3 deleted, late insert visible")
    assert(at(0L) === Seq.empty, "T before the log: empty table")
  }
}
