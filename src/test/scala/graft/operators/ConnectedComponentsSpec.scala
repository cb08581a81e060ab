package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Correctness of the pointer-jumping CC operator on shapes the dup-cluster
  * fixture never produces: long chains (the case plain min-propagation needs
  * O(diameter) rounds for), stars, rings, and multi-component mixes.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val out = ConnectedComponents
      .components(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    out
  }

  test("a 200-vertex chain labels every vertex with the chain head") {
    // diameter 199: plain neighbor-min propagation would need ~200 rounds —
    // far beyond MaxRounds — so passing proves the pointer jump works
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = labelsOf(chain)
    assert(got.size == 200)
    assert(got.values.toSet == Set(0L))
  }

  test("stars, rings, and separate components get their own minima") {
    val star = (1L to 5L).map(i => (100L, 100L + i)) // min is the center
    val ring = Seq((200L, 201L), (201L, 202L), (202L, 200L))
    val pair = Seq((300L, 301L))
    val got = labelsOf(star ++ ring ++ pair)
    assert((star.flatMap(e => Seq(e._1, e._2)).toSet).forall(got(_) == 100L))
    assert(Seq(200L, 201L, 202L).forall(got(_) == 200L))
    assert(Seq(300L, 301L).forall(got(_) == 300L))
  }

  test("edge orientation does not matter") {
    val forward = labelsOf(Seq((1L, 2L), (2L, 3L)))
    val backward = labelsOf(Seq((3L, 2L), (2L, 1L)))
    assert(forward == backward)
    assert(forward.values.toSet == Set(1L))
  }

  test("releases all loop storage except the returned frame's checkpoint") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // 40-vertex chain: enough rounds that a per-round leak (the bug class
    // this pins) would show as MANY leftover ids, not one
    val out = ConnectedComponents
      .components((0L until 39L).map(i => (i, i + 1)).toDF("src", "dst"))
    out.collect()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"loop leaked ${leaked.size} persisted RDDs (only the returned " +
        s"frame's checkpoint may remain): $leaked")
    // the documented caller-side release of the result itself
    IterStorage.release(out)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }
}
