package graft.sources

import graft.TestSpark
import graft.graph.GraphIO
import org.scalatest.funsuite.AnyFunSuite

class KChainSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kchain source emits exactly the reference k=3 fixture edge set") {
    val v2 = spark.read.format("kchain").option("k", 3).load()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = GraphIO.kChainEdges(spark, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v2 === expected)
    assert(v2.size === 9)
    // chain tails point at the sink
    assert(v2.filter(_._2 == 0L).map(_._1) === Set(3L, 6L, 9L))
  }

  test("partitioning splits whole chains and preserves the edge set") {
    val df = spark.read.format("kchain")
      .option("k", 10).option("numPartitions", 4).load()
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100)
    // each chain's k edges live in one partition (no straddling)
    val perPart = df.rdd.mapPartitions { it =>
      Iterator.single(it.map(r => (r.getLong(0) - 1) / 10).toSet)
    }.collect()
    val union = perPart.reduce(_ ++ _)
    assert(union === (0L until 10L).toSet)
    assert(perPart.map(_.size).sum === 10, "chains must not straddle partitions")
  }

  test("numPartitions is capped by k") {
    val df = spark.read.format("kchain")
      .option("k", 2).option("numPartitions", 16).load()
    assert(df.rdd.getNumPartitions <= 2)
    assert(df.count() === 4)
  }

  test("a compat PageRank pass over the source matches the golden semantics") {
    // heads get 0.0, non-heads 1/9 — same as the golden-file spec but
    // fed from the DSv2 source instead of driver-generated edges
    val st = graft.graph.PageRank.compat(
      spark.read.format("kchain").option("k", 3).load(), k = 3, passes = 1)
    val byNode = st.state.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Set(1L, 4L, 7L).forall(n => byNode(n) === 0.0))
    assert(Set(2L, 3L, 5L, 6L, 8L, 9L).forall(n =>
      math.abs(byNode(n) - 1.0 / 9) < 1e-15))
  }
}
