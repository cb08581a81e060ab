package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_card_feedback` — LEO-style cardinality feedback. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE (medians AND quartiles at exact
  *    ranks, the learned adjustment, all three estimates with the same
  *    IEEE operation order, the B² grid arithmetic) at both gate scales;
  *  - the PRODUCTION RANKING stated honestly: |err_joint − 1| <
  *    |err_fb − 1| < |err_indep − 1| — multi-column statistics beat
  *    feedback beat raw independence, strictly, so the key neither
  *    oversells the free fix nor hides that it helps;
  *  - feedback genuinely corrects: adj > 1 (the observed query was
  *    under-estimated) and the corrected estimate moves TOWARD the
  *    actual without overshooting past 2× of it.
  */
class CardFeedbackSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + estimator ranking ($dir)") {
      val rows = RefQueries.table(spark, dir, "documents")
        .select("n_chars", "text").collect()
        .map(r => (r.getLong(0),
          r.getString(1).trim.split("\\s+").length.toLong))
      val got = ExtQueries.cardFeedback(spark, dir).collect().head
      spark.catalog.clearCache()

      val b = ExtQueries.RangeEstBuckets
      val s = ExtQueries.RangeEstFpScale
      val n = rows.length
      val ach = rows.map(_._1).sorted
      val atk = rows.map(_._2).sorted
      def rank(sorted: Array[Long], q: Double) =
        sorted(math.ceil(n * q).toInt - 1)
      // the observation: the medians audit's actual and estimate
      val (tc50, tt50) = (rank(ach, 0.5), rank(atk, 0.5))
      val ca50 = rows.count(_._1 >= tc50).toLong
      val cb50 = rows.count(_._2 >= tt50).toLong
      val cab50 = rows.count(r => r._1 >= tc50 && r._2 >= tt50).toLong
      val obsEst = (ca50 * cb50).toDouble / n.toDouble
      val adj = cab50.toDouble / obsEst
      // the new query at the upper quartiles
      val (tc, tt) = (rank(ach, 0.75), rank(atk, 0.75))
      val ca = rows.count(_._1 >= tc).toLong
      val cb = rows.count(_._2 >= tt).toLong
      val cab = rows.count(r => r._1 >= tc && r._2 >= tt).toLong
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
      val indep = (ca * cb).toDouble / n.toDouble
      val fb = indep * adj
      val joint = estFp.toDouble / s

      assert(got.getLong(0) == n.toLong && got.getLong(1) == tc &&
        got.getLong(2) == tt, "n/thresholds")
      assert((got.getLong(3), got.getLong(4), got.getLong(5)) ==
        ((ca, cb, cab)), "exact counts")
      assert(got.getDouble(6) == adj, "learned adjustment")
      assert(got.getDouble(7) == indep &&
        got.getDouble(8) == indep / cab.toDouble, "independence estimate")
      assert(got.getDouble(9) == fb &&
        got.getDouble(10) == fb / cab.toDouble, "feedback estimate")
      assert(got.getDouble(11) == joint &&
        got.getDouble(12) == joint / cab.toDouble, "grid estimate")

      val (errI, errF, errJ) =
        (got.getDouble(8), got.getDouble(10), got.getDouble(12))
      assert(math.abs(errJ - 1) < math.abs(errF - 1) &&
        math.abs(errF - 1) < math.abs(errI - 1),
        s"ranking must hold strictly: joint $errJ, fb $errF, indep $errI")
      assert(adj > 1.0, s"observed query must be under-estimated: adj $adj")
      assert(fb > indep && fb < 2.0 * cab,
        s"feedback must correct toward actual without wild overshoot: $fb")
    }
  }
}
