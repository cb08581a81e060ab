package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_nb_threshold` — the selective-prediction (risk–coverage) sweep.
  * The pins: every row recomputes from the graded classifier's own
  * collected predictions under the exact integer accept test; coverage is
  * monotone non-increasing in the threshold; t = 0 accepts everything
  * (overall accuracy); and the fixture exercises a real trade (some
  * cutoff accepts strictly fewer documents than t = 0). */
class NbThresholdSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("sweep recomputes from the classifier's predictions; coverage is monotone") {
    val preds = ExtQueries.nbClassify(spark, dir).collect()
      .map(r => (r.getBoolean(5), r.getLong(3), r.getLong(4)))
    spark.catalog.clearCache()
    val steps = ExtQueries.NbThresholdSteps

    val got = ExtQueries.nbThreshold(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)))))
      .toMap
    spark.catalog.clearCache()
    assert(got.keySet == (0L until steps).toSet)

    for (t <- 0L until steps) {
      val accepted = preds.filter { case (_, w, v) => w * steps >= t * v }
      val correct = accepted.count(_._1).toLong
      val (nd, na, nc, cov, sa) = got(t)
      assert(nd == preds.length.toLong)
      assert(na == accepted.length.toLong, s"t=$t accepted")
      assert(nc == correct, s"t=$t correct")
      assert(cov == na.toDouble / preds.length)
      assert(sa == (if (na == 0) None else Some(nc.toDouble / na)), s"t=$t")
    }
    // monotone coverage; t=0 is the no-gate row (overall accuracy)
    val covs = (0L until steps).map(got(_)._2)
    assert(covs.sliding(2).forall(p => p(0) >= p(1)), "coverage monotone")
    assert(got(0L)._2 == preds.length.toLong, "t=0 accepts everything")
    assert(covs.last < covs.head, "fixture must exercise a real cutoff")
  }
}
