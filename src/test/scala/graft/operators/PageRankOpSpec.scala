package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** [[PageRank.ranks]] as a general graph operator: on arbitrary random
  * graphs the distributed integer recurrence must EXACTLY match a
  * sequential replay — any reordering, drop, or double-count breaks int64
  * equality. Also pins the isolated-vertex and dangling-vertex contracts. */
class PageRankOpSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def sequential(edges: Seq[(Long, Long)], nodes: Seq[Long],
      iters: Int): Map[Long, Long] = {
    val S = PageRank.Scale
    val n = nodes.length.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var mass = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        ((mass(s) * 85) / 100) / deg(s)
      }.sum).toMap
      val base = ((S * 15) / 100) / n
      mass = nodes.map(v => v -> (base + inflow.getOrElse(v, 0L))).toMap
    }
    mass
  }

  private def distributed(edges: Seq[(Long, Long)], n: Int,
      iters: Int): Map[Long, Long] = {
    import spark.implicits._
    val got = PageRank.ranks(
      edges.toDF("src", "dst"), (0L until n.toLong).toDF("id"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    got
  }

  test("random graphs: distributed masses equal the sequential replay exactly (ScalaCheck)") {
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
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // 6 rounds over a ring: a per-round leak would leave ~6 block sets
    // (plus the edge cache) behind, not one
    val out = PageRank.ranks(
      (0L until 10L).map(i => (i, (i + 1) % 10)).toDF("src", "dst"),
      (0L until 10L).toDF("id"), 6)
    out.collect()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"loop leaked ${leaked.size} persisted RDDs (only the returned " +
        s"frame's checkpoint may remain): $leaked")
    IterStorage.release(out)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("isolated vertices keep exactly the teleport mass; totals never exceed Scale") {
    val got = distributed(Seq((0L, 1L), (1L, 0L)), 5, 2) // 2,3,4 isolated
    val base = ((PageRank.Scale * 15) / 100) / 5
    assert(Seq(2L, 3L, 4L).forall(got(_) == base))
    assert(got.values.sum <= PageRank.Scale)
    assert(got(0L) == got(1L), "symmetric 2-cycle must stay symmetric")
    assert(got(0L) > base, "linked vertices accumulate inflow above teleport")
  }
}
