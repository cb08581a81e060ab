package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_ngram_overlap` — the eval-side contamination score. Pins coverage
  * (exactly the bench-fate docs, each with its full distinct shingle
  * count), range, and two-sided consistency with `e_decontaminate`: the
  * corpus-side audit flags a document iff the eval-side audit sees a hit
  * somewhere — the two views of the same shingle intersection. */
class NgramOverlapSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("covers every bench doc with in-range fractions, consistent with decontaminate") {
    val rows = ExtQueries.ngramOverlap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(rows.map(_._1).toSet ==
      (0L until ExtQueries.DecontamBenchIds).toSet,
      "one row per benchmark document, no corpus rows")
    for ((id, n, hit, frac) <- rows) {
      assert(n >= 1, s"doc $id: shingle count must be positive")
      assert(hit >= 0 && hit <= n)
      assert(frac == hit.toDouble / n.toDouble)
    }
    val anyHit = rows.exists(_._3 > 0)
    val contaminated = ExtQueries.decontaminate(spark, dir).count() > 0
    spark.catalog.clearCache()
    assert(anyHit == contaminated,
      "eval-side hits and corpus-side contamination flags must agree on existence")
  }
}
