package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_walk_pairs` — the co-occurrence table must be a literal ±window
  * skip-gram replay of the graded walks, directional, weight-exact, and
  * symmetric (every ordered pair's mirror carries equal weight, since the
  * window condition is symmetric in the two steps). */
class WalkPairsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("pairs replay the skip-gram window over the collected walks") {
    val walks = ExtQueries.randWalk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val want = walks.groupBy(_._1).values.toSeq.flatMap { w =>
      val s = w.toSeq
      for {
        x <- s
        y <- s
        if x._2 != y._2 && math.abs(x._2 - y._2) <= ExtQueries.WalkPairWindow
      } yield (x._3, y._3)
    }.groupBy(x => x).map { case (k, v) => k -> v.size.toLong }

    val got = ExtQueries.walkPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache()
    assert(got == want)
    assert(got.values.sum % 2 == 0)
    for (((u, v), n) <- got)
      assert(got((v, u)) == n, s"window symmetry broken at ($u, $v)")
  }
}
