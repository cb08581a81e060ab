package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_cross_dedup` claims: the corpus×batch bucket join finds exactly the
  * cross-boundary subset of what the self-join family finds (banding and
  * verification are the SAME definitions, so a cross pair collides in a
  * bucket iff it collides in the self-join), and every emitted pair
  * actually crosses the corpus/batch boundary with verified J ≥ 0.5. */
class CrossDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("emitted pairs cross the boundary and pass the exact-Jaccard verify") {
    import spark.implicits._
    val rows = ExtQueries.crossDedup(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, inter, union) =>
      assert(a < ExtQueries.VariantIdOffset && b >= ExtQueries.VariantIdOffset,
        s"pair ($a,$b) does not cross the corpus/batch boundary")
      assert(2 * inter >= union, s"pair ($a,$b) fails J >= 0.5: $inter/$union")
    }
  }

  test("equals the self-join family restricted to cross-boundary pairs") {
    import spark.implicits._
    val cross = ExtQueries.crossDedup(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    spark.catalog.clearCache()
    val selfAll: Set[(Long, Long, Long, Long)] = ExtQueries.minhashDedup(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    spark.catalog.clearCache()
    val selfJoin = selfAll.filter { case (a, b, _, _) =>
      a < ExtQueries.VariantIdOffset && b >= ExtQueries.VariantIdOffset }
    assert(cross == selfJoin)
  }
}
