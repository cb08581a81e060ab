package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import org.apache.spark.sql.functions._

/** `e_bigram_lm` — the corpus-trained bigram-LM quality score: coverage and
  * bookkeeping invariants, probability bounds, and the smoothing floor. */
class BigramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = ExtQueries.bigramLm(spark, dir).collect()

  test("every document is scored; n_bigrams = max(0, n_tokens - 1)") {
    val nTok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length == nTok.size)
    rows.foreach { r =>
      val expected = math.max(0, nTok(r.getLong(0)) - 1)
      assert(r.getLong(1) == expected, s"doc=${r.getLong(0)}")
    }
  }

  test("avg_prob is a probability with the Laplace floor, null iff no bigrams") {
    rows.foreach { r =>
      if (r.getLong(1) == 0) {
        assert(r.isNullAt(3), s"doc=${r.getLong(0)}")
        assert(r.getLong(2) == 0L)
      } else {
        val p = r.getDouble(3)
        // add-one smoothing guarantees strictly positive mass; a
        // probability can never exceed 1
        assert(p > 0.0 && p <= 1.0, s"doc=${r.getLong(0)} p=$p")
      }
    }
  }

  test("scores separate documents (the signal is not constant)") {
    val ps = rows.filter(_.getLong(1) > 0).map(_.getDouble(3)).distinct
    assert(ps.length > 1, "every document scored identically — no signal")
  }

  test("e_lm_buckets: assignment matches exact per-language rank selection") {
    val langs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pfp = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = ExtQueries.lmBuckets(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    spark.catalog.clearCache()
    assert(got.length == rows.length)
    // sequential replay: per-lang sorted (p_fp, doc_id), thresholds at
    // ceil(q*n) ranks, bucket = 1 + thresholds strictly below the score
    val byLang = got.groupBy(_._2)
    byLang.foreach { case (lang, docs) =>
      val sorted = docs.map(d => (d._3, d._1)).sortBy(identity)
      val n = sorted.length
      def thrAt(q: Double) = sorted(math.ceil(n * q).toInt - 1)._1
      val (t25, t50, t75) = (thrAt(0.25), thrAt(0.5), thrAt(0.75))
      docs.foreach { case (id, _, p, bucket) =>
        val want = 1L + (if (p > t25) 1 else 0) + (if (p > t50) 1 else 0) +
          (if (p > t75) 1 else 0)
        assert(bucket == want, s"doc=$id lang=$lang p=$p")
        assert(p == pfp(id) && langs(id) == lang)
      }
    }
    // curriculum is non-degenerate: more than one tier appears
    assert(got.map(_._4).distinct.length > 1)
  }
}
