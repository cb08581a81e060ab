package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_range_estimate_eqd` — the equi-depth fix for the range estimator.
  * Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE: equi-depth boundaries at exact
  *    ⌈q·n⌉ ranks, per-bucket observed [min, max], and the fixed-point
  *    rational estimate Σ⌊cnt·overlap·2²⁰/width⌋ re-derived in plain
  *    Scala from the raw values, at both gate scales;
  *  - the MOTIVATING CLAIM: the sparse right-edge range's error strictly
  *    shrinks vs the composed equi-width row (|err_eqd − 1| <
  *    |err_eqw − 1| on `3_edge`) — the reason equi-depth histograms
  *    exist;
  *  - the equi-width columns are EXACTLY the graded `e_range_estimate`
  *    rows (composition, not re-derivation).
  */
class RangeEstimateEqdSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + edge-error shrink ($dir)") {
      val vals = RefQueries.table(spark, dir, "documents")
        .select("n_chars").collect().map(_.getLong(0)).sorted
      val eqwRows = ExtQueries.rangeEstimate(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(6))).toMap
      val got = ExtQueries.rangeEstimateEqd(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
            r.getLong(5), r.getDouble(6), r.getDouble(7))).toMap
      spark.catalog.clearCache()

      val n = vals.length
      val b = ExtQueries.RangeEstEqdBuckets
      val s = ExtQueries.RangeEstFpScale
      val ts = (1 until b).map(i => vals(math.ceil(n * i.toDouble / b).toInt - 1))
      val buckets = vals.groupBy(v => 1 + ts.count(v > _)).values.map { vs =>
        (vs.length.toLong, vs.min, vs.max)
      }
      assert(got.keySet == eqwRows.keySet, "range universe")
      for ((rid, (qlo, qhi, nEstEqw, errEqw)) <- eqwRows) {
        val (gqlo, gqhi, gEqw, gEqd, _, gErrEqw, gErrEqd) = got(rid)
        assert((gqlo, gqhi) == ((qlo, qhi)), s"$rid bounds")
        assert(gEqw == nEstEqw && gErrEqw == errEqw,
          s"$rid equi-width columns must be the graded audit's own")
        val estFp = buckets.map { case (cnt, vLo, vHi) =>
          val ov = math.max(0L, math.min(qhi, vHi) - math.max(qlo, vLo) + 1)
          cnt * ov * s / (vHi - vLo + 1)
        }.sum
        assert(gEqd == estFp.toDouble / s, s"$rid equi-depth estimate")
        assert(gErrEqd == gEqd / got(rid)._5.toDouble, s"$rid error ratio")
      }
      val edge = got("3_edge")
      assert(math.abs(edge._7 - 1.0) < math.abs(edge._6 - 1.0),
        s"edge-range error must shrink under equi-depth: " +
          s"eqd ${edge._7} vs eqw ${edge._6}")
    }
  }
}
