package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_serve_drift` — answer-set churn between the seed and trained IVF
  * serves. The pin: the per-query overlap recomputes exactly from the two
  * graded operators' own collected lists, and the fixture exercises real
  * drift (some query's answers change) without total upheaval (some
  * overlap survives) — the regime where a rollout review is a judgment
  * call and the table earns its keep. */
class ServeDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("overlap recomputes from the two graded rank lists; fixture shows real drift") {
    val seed = ExtQueries.cosineTopkIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val trained = ExtQueries.cosineTopkIvfTrained(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    val sBy = seed.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tBy = trained.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val got = ExtQueries.serveDrift(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    spark.catalog.clearCache()
    assert(got.keySet == sBy.keySet)
    for ((q, (nS, nT, nO, ov)) <- got) {
      assert(nS == sBy(q).size.toLong && nT == tBy(q).size.toLong)
      assert(nO == (sBy(q) intersect tBy(q)).size.toLong, s"qid $q overlap")
      assert(ov == nO.toDouble / 10.0)
    }
    // real drift, not total upheaval
    assert(got.values.exists(_._3 < 10L), "fixture must show churn")
    assert(got.values.exists(_._3 > 0L), "fixture must keep some overlap")
  }
}
