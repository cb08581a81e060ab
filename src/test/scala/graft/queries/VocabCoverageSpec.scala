package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_vocab_coverage` — per-language merge/fallback coverage of the
  * trained BPE vocab. Replays the trained rules sequentially (the
  * BpeTrainSpec merge discipline), derives each word's symbol split, and
  * pins the per-language report against that independent replay, plus the
  * internal identities (tokens = merged + fallback; covered chars ≤ total
  * chars) and consistency with the graded encoder's token totals. */
class VocabCoverageSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def applyMerge(s: Vector[String], l: String, r: String): Vector[String] = {
    val buf = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { buf += (l + r); i += 2 }
      else { buf += s(i); i += 1 }
    }
    buf.result()
  }

  test("report equals the sequential replay of the trained rules, per language") {
    import spark.implicits._
    val rules = ExtQueries.bpeTrain(spark, dir)
      .as[(Int, String, String, Long)].collect().map(m => (m._2, m._3)).toSeq
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))

    def symsOf(w: String): Vector[String] = {
      var syms = w.split("").filter(_.nonEmpty).toVector
      rules.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
      syms
    }
    val symCache = scala.collection.mutable.Map.empty[String, Vector[String]]
    val want = docs.flatMap { case (lang, t) =>
      t.trim.split("\\s+").filter(_.nonEmpty).map(w => (lang, w))
    }.groupBy(_._1).map { case (lang, ws) =>
      val stats = ws.map { case (_, w) =>
        val s = symCache.getOrElseUpdate(w, symsOf(w))
        val merged = s.count(_.length > 1)
        (s.length.toLong, merged.toLong, s.filter(_.length > 1).map(_.length).sum.toLong,
          w.length.toLong)
      }
      val nTok = stats.map(_._1).sum
      val nMer = stats.map(_._2).sum
      val cov = stats.map(_._3).sum
      val nCh = stats.map(_._4).sum
      lang -> ((ws.length.toLong, nTok, nTok - nMer, nMer, cov, nCh,
        (nTok - nMer).toDouble / nTok.toDouble, cov.toDouble / nCh.toDouble))
    }

    val got = ExtQueries.vocabCoverage(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8))))
      .toMap
    spark.catalog.clearCache()

    assert(got == want, "coverage report must equal the sequential replay")
    got.foreach { case (lang, (nW, nTok, nFb, nMer, cov, nCh, fbr, cc)) =>
      assert(nTok == nFb + nMer, s"$lang: tokens = fallback + merged")
      assert(cov <= nCh, s"$lang: covered chars bounded by total chars")
      assert(nTok >= nW, s"$lang: a word is at least one token")
      assert(fbr >= 0.0 && fbr <= 1.0 && cc >= 0.0 && cc <= 1.0, lang)
    }
    // non-vacuous both ways on the fixture: merges fire somewhere AND
    // fallback remains somewhere — the audit genuinely discriminates
    assert(got.values.exists(_._4 > 0L), "no merge ever fired")
    assert(got.values.exists(_._3 > 0L), "no fallback unit remains")

    // consistency with the graded encoder: corpus-wide BPE token total
    val encTotal = ExtQueries.bpeEncode(spark, dir).collect().map(_.getLong(2)).sum
    spark.catalog.clearCache()
    assert(got.values.map(_._2).sum == encTotal,
      "coverage token total must equal the encoder's corpus total")
  }
}
