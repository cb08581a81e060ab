package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_join_estimate` — the Selinger equi-join estimator audit. The pins:
  * every column recomputes from locally collected keys; the PK–FK pairs
  * are estimated EXACTLY (err_ratio ≡ 1 — the estimator's classic
  * correctness regime); the skewed self-join UNDERESTIMATES strictly
  * (Cauchy–Schwarz with a non-uniform key), which is the histogram
  * motivation the operator documents. */
class JoinEstimateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("estimates recompute locally; PK-FK exact; skewed self-join underestimates") {
    def keys(t: String, c: String): Seq[Any] =
      spark.read.parquet(s"$dir/$t.parquet").select(c).collect().map(_.get(0)).toSeq
    val pairs = Seq(
      ("orders_customer", keys("orders", "o_custkey"), keys("customer", "c_custkey")),
      ("lineitem_orders", keys("lineitem", "l_orderkey"), keys("orders", "o_orderkey")),
      ("documents_lang_self", keys("documents", "lang"), keys("documents", "lang")))

    val got = ExtQueries.joinEstimate(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    spark.catalog.clearCache()
    assert(got.keySet == pairs.map(_._1).toSet)

    for ((name, lk, rk) <- pairs) {
      val (nl, nr, ndl, ndr, est, actual, err) = got(name)
      assert(nl == lk.length.toLong && nr == rk.length.toLong)
      assert(ndl == lk.distinct.length.toLong && ndr == rk.distinct.length.toLong)
      assert(est == nl * nr / math.max(ndl, ndr), s"$name estimate")
      val rCounts = rk.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(actual == lk.map(k => rCounts.getOrElse(k, 0L)).sum, s"$name actual")
      assert(err == est.toDouble / actual.toDouble)
    }
    // the estimator's classic regimes, live on the fixture
    assert(got("orders_customer")._7 == 1.0, "PK-FK must estimate exactly")
    assert(got("lineitem_orders")._7 == 1.0, "PK-FK must estimate exactly")
    assert(got("documents_lang_self")._7 < 1.0,
      "a skewed key must make the uniformity assumption underestimate")
  }
}
