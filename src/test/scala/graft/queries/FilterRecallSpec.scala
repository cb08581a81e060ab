package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_filter_recall` — filtered-serving evaluation harness. Recomputes
  * all three strategy rows from the composed operators' own outputs and
  * pins exact equality, the truth size (|queries|·k), that the fixed-
  * nprobe and post-filter strategies are non-degenerate, and the
  * verdict-level ordering the adaptive plan exists for: its recall is at
  * least the post-filter strategy's. */
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
    val ad = ExtQueries.ivfFilterAdaptive(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val tr = ExtQueries.ivfFilterTrained(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()

    val nTruth = truth.length.toLong
    val postHit = truth.map(_._2).sum
    val ivfHit = truth.count { case (pair, _) => ivf(pair) }.toLong
    val adHit = truth.count { case (pair, _) => ad(pair) }.toLong
    val trHit = truth.count { case (pair, _) => tr(pair) }.toLong
    val want = Map(
      "ivf_prefilter" -> ((nTruth, ivfHit, ivfHit.toDouble / nTruth)),
      "ivf_adaptive" -> ((nTruth, adHit, adHit.toDouble / nTruth)),
      "ivf_trained" -> ((nTruth, trHit, trHit.toDouble / nTruth)),
      "postfilter" -> ((nTruth, postHit, postHit.toDouble / nTruth)))

    val got = ExtQueries.filterRecall(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    spark.catalog.clearCache()

    assert(got == want, "harness rows must equal the recomputation")
    assert(got("postfilter")._1 == 8L * ExtQueries.AnnFilterK,
      "truth is |queries| * k rows (every class holds >= k candidates)")
    // the two FIXED strategies lose something AND find something on the
    // fixture — the comparison is non-degenerate in both directions. The
    // adaptive row is exempt from the <1 bound: under the fixture's
    // selectivity it spills to the exact pre-filter path BY DESIGN, and
    // exactness there is the spill rule working, not a degenerate fixture.
    Seq("ivf_prefilter", "postfilter").foreach { s =>
      val (n, hit, recall) = got(s)
      assert(hit > 0L && hit < n, s"$s must be non-degenerate")
      assert(recall > 0.0 && recall < 1.0, s"$s must be non-degenerate")
    }
    // the operating-point ordering the adaptive plan exists for
    assert(got("ivf_adaptive")._3 >= got("postfilter")._3,
      "guaranteed-k adaptive serving must not lose to post-filtering")
    assert(got("ivf_adaptive")._2 > 0L)
    // the fourth row exists to attribute the quantizer: it must be a live
    // comparison, not a degenerate zero
    assert(got("ivf_trained")._2 > 0L, "trained filtered serve must hit the truth")
  }
}
