package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_pref_pairs` — chosen/rejected preference-pair mining. The pins:
  * every pair recomputes from the graded LM score's own collected output
  * under the pinned (score, doc_id) tie-breaks; margins are strictly
  * positive (zero-margin pairs are excluded by construction); and the
  * fixture yields a usable pair per multi-document source. */
class PrefPairsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("pairs equal the local argmax/argmin replay over the graded score") {
    val scored = ExtQueries.bigramLm(spark, dir).collect()
      .filter(!_.isNullAt(3))
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    spark.catalog.clearCache()

    val bySource = scored.toSeq
      .map { case (id, s) => (src(id), id, s) }
      .groupBy(_._1)
    val want = bySource.flatMap { case (source, docs) =>
      val chosen = docs.minBy { case (_, id, s) => (-s, id) }
      val rejected = docs.minBy { case (_, id, s) => (s, id) }
      if (chosen._2 == rejected._2) None
      else Some(source -> ((chosen._2, chosen._3, rejected._2, rejected._3)))
    }

    val got = ExtQueries.prefPairs(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    spark.catalog.clearCache()
    assert(got == want, "pairs != local replay")
    // every emitted pair carries a strictly positive margin and the
    // margin is exactly the score difference
    val margins = ExtQueries.prefPairs(spark, dir).collect()
      .map(r => (r.getDouble(2), r.getDouble(4), r.getDouble(5)))
    spark.catalog.clearCache()
    assert(margins.nonEmpty, "fixture must yield pairs")
    assert(margins.forall { case (c, rj, m) => m == c - rj && m > 0.0 })
  }
}
