package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the explicit bloom-filter join-pruning contract
  * ([[GraftExpressions.bloomAgg]]/[[GraftExpressions.bloomMightContain]],
  * exercised by q49): the prefilter is a SUPERSET-pass — it may let
  * false positives through to the join, never drop a matching row —
  * so the join's result is identical with and without it, while the
  * fact side entering the join shrinks to ~selectivity·rows. Traffic
  * is measured by the Duel `bloom`; this spec pins semantics + plan.
  */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("bloom prefilter passes every matching key (superset-pass)") {
    val orders = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = orders
      .agg(GraftExpressions.bloomAgg(col("o_orderkey"), 100000L).as("bf"))
      .scalar()
    val li = Tables(spark, dir, "lineitem")
    val pruned = li.filter(
      GraftExpressions.bloomMightContain(bloom, col("l_orderkey")))
    // every lineitem row whose key IS in the dim set must survive:
    // anti-joining the true matches against the pruned set is empty
    val truePos = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(li.columns.map(col): _*)
    assert(truePos.exceptAll(pruned.intersectAll(truePos)).isEmpty)
    // and the prefilter actually prunes at this selectivity (1/5 of
    // orders are urgent; the FPP adds a few percent, never 4x)
    val (n, kept) = (li.count(), pruned.count())
    assert(kept < n, s"prefilter kept everything: $kept of $n")
    assert(kept >= truePos.count(), "prefilter dropped matching rows")
  }

  test("q49 equals the plain join and plans the might_contain prefilter") {
    val q = graft.queries.CoreQueries.q49_bloom_join(spark, dir)
    val plain = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 450000.0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(28,2)"))
        .cast("double").as("rev"), count(lit(1)).as("n_rows"))
    assert(q.exceptAll(plain).isEmpty && plain.exceptAll(q).isEmpty)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }
}
