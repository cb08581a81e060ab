package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The general fixed-round k-core peel engine: distributed survivors must
  * equal a sequential peel on random graphs (ScalaCheck), reach the true
  * k-core at the fixpoint, obey the k-monotonicity law, and release every
  * superseded round's storage. */
class KcoreOpSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Sequential reference peel over a symmetric edge set. */
  private def sequential(sym: Set[(Long, Long)], k: Int, rounds: Int): Set[Long] = {
    var alive = sym.map(_._1)
    for (_ <- 1 to rounds) {
      val deg = sym.toSeq.filter { case (s, n) => alive(s) && alive(n) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      alive = alive.filter(v => deg.getOrElse(v, 0) >= k)
    }
    alive
  }

  private def distributed(sym: Set[(Long, Long)], k: Int, rounds: Int): Set[Long] = {
    import spark.implicits._
    val edges = sym.toSeq.toDF("src", "nbr").localCheckpoint(true)
    val out = Kcore.survivors(edges, k, rounds)
    val got = out.collect().map(_.getLong(0)).toSet
    IterStorage.release(out)
    IterStorage.release(edges)
    spark.catalog.clearCache()
    got
  }

  private def symmetrize(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    edges.filter(e => e._1 != e._2)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet

  test("random graphs: distributed peel equals the sequential replay (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genGraph = for {
      n <- Gen.choose(2, 14)
      density <- Gen.choose(1, 3)
      edges <- Gen.listOfN(n * density,
        Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
      k <- Gen.choose(1, 3)
      rounds <- Gen.choose(0, 4)
    } yield (symmetrize(edges), k, rounds)
    val prop = Prop.forAll(genGraph.suchThat(_._1.nonEmpty)) {
      case (sym, k, rounds) =>
        distributed(sym, k, rounds) == sequential(sym, k, rounds)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("fixpoint is the true k-core; cores are nested in k") {
    // two triangles joined by a bridge vertex, plus a pendant chain:
    // the 2-core is the two triangles (bridge survives only if on a cycle)
    val tri1 = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val tri2 = Seq((3L, 4L), (4L, 5L), (5L, 3L))
    val bridge = Seq((2L, 3L))
    val chain = Seq((5L, 6L), (6L, 7L))
    val sym = symmetrize(tri1 ++ tri2 ++ bridge ++ chain)
    val n = 8
    val core2 = distributed(sym, 2, n) // >= diameter rounds = fixpoint
    assert(core2 == (0L to 5L).toSet, "2-core = the two triangles + bridge edge endpoints")
    // k-core property at the fixpoint: induced min degree >= k
    val deg = sym.toSeq.filter { case (s, d) => core2(s) && core2(d) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    assert(core2.forall(deg(_) >= 2))
    // nested: 3-core is a subset of the 2-core (here: empty — no K4)
    val core3 = distributed(sym, 3, n)
    assert(core3.subsetOf(core2))
    assert(core3.isEmpty, "no vertex has 3 mutual neighbors surviving here")
  }

  test("rounds = 0 returns the vertex set; releases loop storage") {
    import spark.implicits._
    val sym = symmetrize(Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L)))
    assert(distributed(sym, 2, 0) == Set(0L, 1L, 2L, 3L))
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val edges = sym.toSeq.toDF("src", "nbr").localCheckpoint(true)
    val out = Kcore.survivors(edges, 2, 6)
    out.collect()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 2,
      s"loop leaked ${leaked.size} persisted RDDs (only the returned frame's " +
        s"checkpoint and the caller-owned edge checkpoint may remain): $leaked")
    IterStorage.release(out)
    IterStorage.release(edges)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }
}
