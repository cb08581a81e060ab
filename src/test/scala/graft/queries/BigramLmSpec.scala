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
}
