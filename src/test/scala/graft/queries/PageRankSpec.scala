package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_pagerank` — the integer-exact power iteration over the knn graph.
  * Graded like [[KmeansTrainSpec]]: structural invariants (every node, mass
  * floor, conservation bound) plus an EXACT match against a sequential
  * driver-side replay of the same integer recurrence — if the distributed
  * dataflow reorders, drops, or double-counts any contribution, the int64
  * masses cannot match. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private val S = ExtQueries.PrScale

  private lazy val result: Array[(Long, Long, Double)] =
    ExtQueries.pageRank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  private lazy val edges: Array[(Long, Long)] = {
    val e = ExtQueries.knnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    e
  }

  test("every node appears once with at least the teleport mass") {
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(result.length == n)
    assert(result.map(_._1).distinct.length == n)
    val base = ((S * 15) / 100) / n
    assert(result.forall(_._2 >= base), "teleport term is a hard floor")
    // truncating divisions only LOSE mass: total stays under one unit
    assert(result.map(_._2).sum <= S)
    assert(result.forall(t => math.abs(t._3 - t._2.toDouble / S) < 1e-15))
  }

  test("masses exactly match a sequential replay of the integer recurrence") {
    val nodes = result.map(_._1).sorted
    val n = nodes.length.toLong
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    var mass = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to ExtQueries.PageRankIters) {
      val inflow = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => ((mass(s) * 85) / 100) / deg(s) }.sum
      }
      val base = ((S * 15) / 100) / n
      mass = nodes.map(v => v -> (base + inflow.getOrElse(v, 0L))).toMap
    }
    val got = result.map(t => t._1 -> t._2).toMap
    assert(got == mass, {
      val bad = nodes.filter(v => got(v) != mass(v)).take(5)
      s"first mismatches: ${bad.map(v => s"$v: got ${got(v)} want ${mass(v)}").mkString(", ")}"
    })
  }

  test("similarity-cluster members outrank isolated nodes on average") {
    // in-degree is what PageRank rewards: nodes receiving any in-edge must
    // average strictly more mass than nodes receiving none
    val indeg = edges.map(_._2).toSet
    val (linked, isolated) = result.partition(t => indeg(t._1))
    if (linked.nonEmpty && isolated.nonEmpty) {
      val avg = (xs: Array[(Long, Long, Double)]) => xs.map(_._2).sum.toDouble / xs.length
      assert(avg(linked) > avg(isolated))
    }
  }
}
