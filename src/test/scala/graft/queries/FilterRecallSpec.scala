package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_filter_recall` — filtered-serving evaluation harness. Recomputes
  * both strategy rows from the composed operators' own outputs and pins
  * exact equality, the truth size (|queries|·k), and that the summary
  * genuinely separates the two strategies on the fixture. */
class FilterRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("strategy rows equal recomputation from the composed operators") {
    val truth = ExtQueries.annFilter(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getLong(4)))
    spark.catalog.clearCache()
    val ivf = ExtQueries.ivfFilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()

    val nTruth = truth.length.toLong
    val postHit = truth.map(_._2).sum
    val ivfHit = truth.count { case (pair, _) => ivf(pair) }.toLong
    val want = Map(
      "ivf_prefilter" -> ((nTruth, ivfHit, ivfHit.toDouble / nTruth)),
      "postfilter" -> ((nTruth, postHit, postHit.toDouble / nTruth)))

    val got = ExtQueries.filterRecall(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    spark.catalog.clearCache()

    assert(got == want, "harness rows must equal the recomputation")
    assert(got("postfilter")._1 == 8L * ExtQueries.AnnFilterK,
      "truth is |queries| * k rows (every class holds >= k candidates)")
    // both strategies lose something AND find something on the fixture —
    // the comparison is non-degenerate in both directions
    got.values.foreach { case (n, hit, recall) =>
      assert(hit > 0L && hit < n)
      assert(recall > 0.0 && recall < 1.0)
    }
  }
}
