package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_corr_estimate` — the correlated-conjunction selectivity audit.
  * Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE (medians at exact ⌈n/2⌉ ranks,
  *    per-column counts, the B² grid, and the two-axis fixed-point
  *    estimate) from the raw values at both gate scales;
  *  - the MOTIVATING CLAIM: the two predicates are genuinely correlated
  *    (independence under-estimates by ~2×, err_indep < 0.7) and the
  *    joint-histogram estimate is strictly closer to truth
  *    (|err_joint − 1| < |err_indep − 1|) — the attribute-value-
  *    independence failure and its multi-column-statistics fix.
  */
class CorrEstimateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + correlation claim ($dir)") {
      val rows = RefQueries.table(spark, dir, "documents")
        .select("n_chars", "text").collect()
        .map(r => (r.getLong(0),
          r.getString(1).trim.split("\\s+").length.toLong))
      val got = ExtQueries.corrEstimate(spark, dir).collect().head
      spark.catalog.clearCache()

      val b = ExtQueries.RangeEstBuckets
      val s = ExtQueries.RangeEstFpScale
      val n = rows.length
      val ach = rows.map(_._1).sorted
      val atk = rows.map(_._2).sorted
      val tc = ach(math.ceil(n * 0.5).toInt - 1)
      val tt = atk(math.ceil(n * 0.5).toInt - 1)
      val (loa, hia, lob, hib) = (ach.head, ach.last, atk.head, atk.last)
      val wa = (hia - loa + b) / b
      val wb = (hib - lob + b) / b
      val estFp = rows.groupBy { case (c, t) =>
        ((c - loa) / wa, (t - lob) / wb) }.map { case ((i, j), vs) =>
        val ova = math.max(0L,
          math.min(loa + (i + 1) * wa - 1, hia) - math.max(loa + i * wa, tc) + 1)
        val ovb = math.max(0L,
          math.min(lob + (j + 1) * wb - 1, hib) - math.max(lob + j * wb, tt) + 1)
        vs.size * ova * ovb * s / (wa * wb)
      }.sum
      val ca = rows.count(_._1 >= tc).toLong
      val cb = rows.count(_._2 >= tt).toLong
      val cab = rows.count(r => r._1 >= tc && r._2 >= tt).toLong

      assert(got.getLong(0) == n.toLong && got.getLong(1) == tc &&
        got.getLong(2) == tt, "n/thresholds")
      assert((got.getLong(3), got.getLong(4), got.getLong(5)) ==
        ((ca, cb, cab)), "exact counts")
      val indep = (ca * cb).toDouble / n.toDouble
      assert(got.getDouble(6) == indep && got.getDouble(7) == indep / cab.toDouble,
        "independence estimate")
      val joint = estFp.toDouble / s
      assert(got.getDouble(8) == joint && got.getDouble(9) == joint / cab.toDouble,
        "joint estimate")

      val (errI, errJ) = (got.getDouble(7), got.getDouble(9))
      assert(errI < 0.7, s"predicates not correlated enough: err_indep $errI")
      assert(math.abs(errJ - 1.0) < math.abs(errI - 1.0),
        s"joint stats must beat independence: $errJ vs $errI")
    }
  }
}
