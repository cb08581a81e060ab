package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_tok_fertility` — per-language tokenizer parity. Pins that the report
  * is exactly the per-lang aggregation of the graded encoder's per-doc
  * output (composition), that every language is covered, and the fertility
  * bounds (a word is ≥ 1 BPE token; a BPE token is ≥ 1 char). */
class TokFertilitySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("report is the encoder's own per-lang rollup, with sane fertility bounds") {
    val enc = ExtQueries.bpeEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val want = enc.groupBy { case (id, _, _) => docs(id)._1 }
      .map { case (lang, rs) =>
        lang -> (rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).sum,
          rs.map(r => docs(r._1)._2).sum)
      }

    val got = ExtQueries.tokFertility(spark, dir).collect()
    spark.catalog.clearCache()
    assert(got.map(_.getString(0)).toSet == docs.values.map(_._1).toSet,
      "every corpus language must appear")
    for (r <- got) {
      val (lang, nDocs, nWords, nBpe, nChars) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert((nDocs, nWords, nBpe, nChars) == want(lang),
        s"$lang: rollup must equal the encoder's own sums")
      assert(r.getDouble(5) == nBpe.toDouble / nWords.toDouble)
      assert(r.getDouble(5) >= 1.0, s"$lang: a word is at least one BPE token")
      assert(r.getDouble(6) >= 1.0, s"$lang: a BPE token is at least one char")
    }
  }
}
