package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_phrase_search` — index-probed phrase lookup. The result must equal a
  * direct token-boundary substring scan (the index is an optimization, not
  * a semantics change), the deliberate miss phrase must return nothing,
  * and every hit must actually contain its phrase. */
class PhraseSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("index-probed results equal the direct substring scan; miss phrase is empty") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      p <- ExtQueries.SearchPhrases
      (id, t) <- docs if (" " + t + " ").contains(" " + p + " ")
    } yield (p, id)).toSet

    val got = ExtQueries.phraseSearch(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(got == want, "index + verify must equal the direct scan")
    assert(!got.exists(_._1 == "lorem ipsum dolor"), "the miss phrase must be empty")
    assert(got.nonEmpty, "fixture phrases must actually hit (non-vacuous test)")
  }
}
