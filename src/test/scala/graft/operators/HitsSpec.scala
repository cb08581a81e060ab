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

  private def sequential(edges: Seq[(Long, Long)], nodes: Seq[Long],
      iters: Int): Map[Long, (Long, Long)] = {
    val S = Hits.Scale
    // toAuth = true: propagate along src→dst into the dst (authority
    // update); false: along dst→src into the src (hub update)
    def half(scores: Map[Long, Long], toAuth: Boolean): Map[Long, Long] = {
      val raw = edges.groupBy(e => if (toAuth) e._2 else e._1).view
        .mapValues(_.map(e => scores(if (toAuth) e._1 else e._2)).sum).toMap
      val t = math.max(raw.values.sum / S, 1L)
      nodes.map(v => v -> raw.getOrElse(v, 0L) / t).toMap
    }
    var hub = nodes.map(_ -> S).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      auth = half(hub, toAuth = true)
      hub = half(auth, toAuth = false)
    }
    nodes.map(v => v -> (auth(v), hub(v))).toMap
  }

  private def distributed(edges: Seq[(Long, Long)], n: Int,
      iters: Int): Map[Long, (Long, Long)] = {
    val got = Hits.scores(
      edges.toDF("src", "dst"), (0L until n.toLong).toDF("id"), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    got
  }

  test("random graphs: distributed scores equal the sequential replay exactly (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genGraph = for {
      n <- Gen.choose(2, 12)
      density <- Gen.choose(1, 3)
      edges <- Gen.listOfN(n * density,
        Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
      iters <- Gen.choose(1, 3)
    } yield (n, edges.filter(e => e._1 != e._2).distinct, iters)
    val prop = Prop.forAll(genGraph.suchThat(_._2.nonEmpty)) {
      case (n, edges, iters) =>
        distributed(edges, n, iters) ==
          sequential(edges, (0L until n.toLong).toSeq, iters)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("releases all loop storage except the returned frame's checkpoint") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // 4 rounds over a ring: a per-half-round leak would leave ~8 block
    // sets (plus the edge cache) behind, not one
    val out = Hits.scores(
      (0L until 10L).map(i => (i, (i + 1) % 10)).toDF("src", "dst"),
      (0L until 10L).toDF("id"), 4)
    out.collect()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"loop leaked ${leaked.size} persisted RDDs (only the returned " +
        s"frame's checkpoint may remain): $leaked")
    IterStorage.release(out)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
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
