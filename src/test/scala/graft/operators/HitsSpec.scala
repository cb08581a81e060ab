package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** [[Hits]] — the integer fixed-point engine must separate hubs from
  * authorities on a graph where the two roles are disjoint by
  * construction, conserve (up to deterministic truncation) the L1 mass it
  * normalizes to, and produce bit-identical scores on any input
  * partitioning (the cross-engine determinism claim). */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("pure-hub star: the center is all hub, the leaves are all authority") {
    val edges = (1L to 5L).map(l => (0L, l)).toDF("src", "dst")
    val nodes = (0L to 5L).toDF("id")
    val got = Hits.scores(edges, nodes, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    // center: sole hub, zero authority (nothing points at it)
    assert(got(0L)._1 == 0L)
    assert(got(0L)._2 > 0L)
    // leaves: equal positive authority, zero hub (they point at nothing)
    val leafAuth = (1L to 5L).map(got(_)._1).toSet
    assert(leafAuth.size == 1 && leafAuth.head > 0L)
    assert((1L to 5L).forall(got(_)._2 == 0L))
    // L1 normalization: each column sums to ~Scale (≤ one truncation unit
    // lost per vertex per division, and the div-of-div norm overshoots by
    // at most total/(total div Scale) − Scale < Scale/(total div Scale))
    val authSum = got.values.map(_._1).sum
    val hubSum = got.values.map(_._2).sum
    assert(authSum > Hits.Scale / 2 && authSum < Hits.Scale * 2, s"auth $authSum")
    assert(hubSum > Hits.Scale / 2 && hubSum < Hits.Scale * 2, s"hub $hubSum")
  }

  test("scores are invariant under input partitioning") {
    val edges = Seq(
      (0L, 1L), (0L, 2L), (3L, 1L), (3L, 2L), (4L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val nodes = (0L to 4L).toDF("id")
    val a = Hits.scores(edges, nodes, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = Hits.scores(edges.repartition(7), nodes.repartition(3), 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    spark.catalog.clearCache()
    assert(a == b)
    // node 2 both receives (from 0, 3, 4) and emits (to 1): nonzero in
    // BOTH roles — the population PageRank's single mass cannot separate
    val m = a.map(t => t._1 -> (t._2, t._3)).toMap
    assert(m(2L)._1 > 0L && m(2L)._2 > 0L)
    // node 1 is the in-degree-3 sink: the top authority, zero hub
    assert(m(1L)._1 == a.map(_._2).max && m(1L)._2 == 0L)
  }
}
