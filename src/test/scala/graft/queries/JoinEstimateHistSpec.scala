package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_join_estimate_hist` — the histogram-corrected estimator. The load-
  * bearing pin: `err_hist` ≡ 1 on EVERY pair — including the skewed
  * self-join, which is exactly where `e_join_estimate` pins Selinger's
  * uniformity assumption UNDER-estimating. The frequency product is the
  * group identity |A ⋈ B| = Σ_k c_A(k)·c_B(k); the audit's `n_actual`
  * comes from the real join, so the equality is a cross-check of two
  * independent computations, not a tautology. */
class JoinEstimateHistSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"the histogram estimate is exact where Selinger failed ($dir)") {
      val rows = ExtQueries.joinEstimateHist(spark, dir).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(rows.keySet == Set("orders_customer", "lineitem_orders",
        "documents_lang_self"))
      for ((pair, r) <- rows) {
        assert(r.getLong(4) == r.getLong(5),
          s"$pair: n_est_hist != n_actual — the group identity broke")
        assert(r.getDouble(7) == 1.0, s"$pair: err_hist != 1")
      }
      // the skewed self-join: Selinger under-estimates, the histogram fixes
      val skew = rows("documents_lang_self")
      assert(skew.getDouble(6) < 1.0,
        "the skewed pair must show Selinger's under-estimate")
      // the PK-FK pairs: both estimators agree (Selinger is provably exact)
      for (pair <- Seq("orders_customer", "lineitem_orders"))
        assert(rows(pair).getDouble(6) == 1.0, s"$pair: Selinger not exact")
    }
  }
}
