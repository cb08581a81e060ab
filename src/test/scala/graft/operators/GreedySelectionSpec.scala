package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The greedy-selection operator must equal the literal sequential greedy
  * walk (keep each item in id order unless it conflicts with an already-kept
  * one) and satisfy the two properties that distinguish it from pairwise
  * domination: independence AND domination.
  */
class GreedySelectionSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Literal sequential reference: walk ids ascending, keep unless a kept
    * smaller neighbor conflicts. */
  private def sequentialGreedy(pairs: Seq[(Long, Long)]): Map[Long, Boolean] = {
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val conflicts = pairs.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val kept = scala.collection.mutable.Set.empty[Long]
    verts.map { v =>
      val keep = conflicts.getOrElse(v, Set.empty).forall(u => !kept(u))
      if (keep) kept += v
      v -> keep
    }.toMap
  }

  private def distributed(pairs: Seq[(Long, Long)]): Map[Long, Boolean] = {
    import spark.implicits._
    val out = GreedySelection.survivors(pairs.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    spark.catalog.clearCache()
    out
  }

  test("chain a~b~c: greedy keeps both endpoints (pairwise would drop c)") {
    assert(distributed(Seq((1L, 2L), (2L, 3L))) ===
      Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("clique and star keep exactly the minimum") {
    val clique = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    assert(distributed(clique) === Map(1L -> true, 2L -> false, 3L -> false))
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L))
    assert(distributed(star) ===
      Map(10L -> true, 11L -> false, 12L -> false, 13L -> false))
  }

  // On a path each round resolves exactly ONE vertex (vertex k's fate needs
  // k-1's — the inherent sequential dependency of the greedy order the
  // scaladoc documents), so this 100-vertex chain takes ~99 rounds and
  // doubles as a regression test that deep-but-legal chains stay under
  // MaxRounds rather than tripping the guard.
  test("long alternating chain resolves, one vertex per round by necessity") {
    val chain = (0L until 99L).map(i => (i, i + 1))
    assert(chain.length < GreedySelection.MaxRounds)
    val got = distributed(chain)
    assert((0L to 100L by 2).forall(v => got.getOrElse(v, true)))
    assert((1L until 100L by 2).forall(v => !got(v)))
  }

  test("matches the sequential greedy walk on random graphs (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genPairs = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 14L), Gen.chooseNum(0L, 14L)))
      .map(_.collect { case (a, b) if a != b => (a min b, a max b) }.distinct)
      .suchThat(_.nonEmpty)
    val prop = Prop.forAll(genPairs) { pairs =>
      distributed(pairs) == sequentialGreedy(pairs)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("misoriented or self-loop pairs fail loud, not silently wrong") {
    import spark.implicits._
    // reversed edge: the "smaller neighbor" logic would silently read 2 as
    // 1's smaller conflict — the guard must refuse instead
    val reversed = intercept[IllegalArgumentException] {
      GreedySelection.survivors(Seq((1L, 2L), (3L, 1L)).toDF("src", "dst"))
    }
    assert(reversed.getMessage.contains("oriented src < dst"))
    val selfLoop = intercept[IllegalArgumentException] {
      GreedySelection.survivors(Seq((2L, 2L)).toDF("src", "dst"))
    }
    assert(selfLoop.getMessage.contains("oriented src < dst"))
    // int-typed id columns must hit the same message, not a
    // ClassCastException from unboxing the aggregate result
    val intTyped = intercept[IllegalArgumentException] {
      GreedySelection.survivors(Seq((2, 1)).toDF("src", "dst"))
    }
    assert(intTyped.getMessage.contains("oriented src < dst"))
  }

  test("releases all loop storage except the returned frame's checkpoint") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // 30-vertex chain resolves one vertex per round: a per-round leak would
    // leave ~30 ids behind, not one
    val out = GreedySelection
      .survivors((0L until 29L).map(i => (i, i + 1)).toDF("src", "dst"))
    out.collect()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"loop leaked ${leaked.size} persisted RDDs (only the returned " +
        s"frame's checkpoint may remain): $leaked")
    IterStorage.release(out)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("on the dedup fixture: independence AND domination hold (pairwise only independence)") {
    import graft.queries.ExtQueries
    val dir = "/root/testdata/sf0.001"
    val assigned = ExtQueries.semanticAssigned(spark, dir)
    val pairs = ExtQueries.semanticSimilarPairs(assigned)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val greedy = distributed(pairs)
    val conflicts = pairs.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // independence: no conflicting pair both kept
    assert(pairs.forall { case (a, b) => !(greedy(a) && greedy(b)) })
    // domination: every dropped item has a KEPT smaller conflicting neighbor
    assert(greedy.collect { case (v, false) => v }
      .forall(v => conflicts(v).exists(greedy)), "greedy must dominate")
    // the pairwise rule (e_semantic_dedup) keeps v iff v has NO smaller
    // similar neighbor at all — a strictly stronger condition than greedy's
    // "no KEPT smaller neighbor", so pairwise-kept ⊆ greedy-kept
    val pairwiseDropped = pairs.map(_._2).toSet
    assert(greedy.keySet.filterNot(pairwiseDropped).forall(greedy),
      "every pairwise-kept item must also be greedy-kept")
    assert(greedy.keySet.count(v => !pairwiseDropped(v)) <=
      greedy.valuesIterator.count(identity))
    spark.catalog.clearCache()
  }
}
