package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Bloom-prefilter soundness for e_incr_dedup: a Bloom filter can emit
  * false POSITIVES (harmless — those rows just pay the anti-join) but a
  * false NEGATIVE would drop a genuinely-new document silently. The
  * contract is therefore: survivors with the prefilter ≡ survivors of the
  * plain anti-join, bit-for-bit. */
class IncrDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("bloom prefilter never changes the survivor set (no false negatives)") {
    val withBloom = ExtQueries.incrDedupImpl(spark, dir, useBloom = true).collect()
    spark.catalog.clearCache()
    val plain = ExtQueries.incrDedupImpl(spark, dir, useBloom = false).collect()
    spark.catalog.clearCache()
    assert(withBloom.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
  }

  test("exact re-ingests all drop; mangled revisions all survive") {
    val kept = ExtQueries.incrDedup(spark, dir).collect()
    spark.catalog.clearCache()
    val ids = kept.map(_.getAs[Long]("doc_id"))
    // re-ingests carry doc_id+1M and identical text — none may survive
    assert(!ids.exists(id => id >= 1000000L && id < 2000000L))
    // mangled revisions carry doc_id+2M and all differ from the corpus
    assert(ids.forall(_ >= 2000000L) && ids.nonEmpty)
  }
}
