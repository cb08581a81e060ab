package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_range_estimate` — the bucket-histogram selectivity audit. Pins:
  * the estimate is the exact rational est_num/w recomputed locally from
  * the raw values (an independent derivation of both the histogram and
  * the interpolation), the broad half-domain range estimates near-exactly
  * (the uniformity assumption holds where mass is dense), and the sparse
  * right-edge range shows MORE error than the half range (the assumption
  * failing exactly where theory says it fails) — at both gate scales. */
class RangeEstimateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"estimates recompute locally; dense ≈ exact; edge degrades ($dir)") {
      val vals = spark.read.parquet(s"$dir/documents.parquet")
        .select("n_chars").collect().map(_.getLong(0))
      val (lo, hi) = (vals.min, vals.max)
      val b = ExtQueries.RangeEstBuckets
      val w = (hi - lo + b) / b
      val cnt = vals.groupBy(v => (v - lo) / w).view.mapValues(_.length.toLong)
      val wd = hi - lo + 1
      val want = Map(
        "1_narrow" -> (lo + wd / 10, lo + wd * 2 / 10),
        "2_half" -> (lo + wd / 4, lo + wd * 3 / 4),
        "3_edge" -> (hi - wd / 20, hi))
      def estNum(qlo: Long, qhi: Long): Long =
        cnt.map { case (bk, c) =>
          val bLo = lo + bk * w
          val bHi = bLo + w - 1
          c * math.max(0L, math.min(qhi, bHi) - math.max(qlo, bLo) + 1)
        }.sum

      val rows = ExtQueries.rangeEstimate(spark, dir).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(rows.keySet == want.keySet)
      for ((id, (qlo, qhi)) <- want) {
        val r = rows(id)
        assert((r.getLong(1), r.getLong(2)) == ((qlo, qhi)), s"$id bounds")
        assert(r.getLong(3) == estNum(qlo, qhi), s"$id est_num")
        assert(r.getDouble(4) == estNum(qlo, qhi).toDouble / w.toDouble,
          s"$id n_est is the single divide")
        val actual = vals.count(v => v >= qlo && v <= qhi).toLong
        assert(r.getLong(5) == actual, s"$id actual")
        assert(actual > 0, s"$id degenerate range")
      }
      // dense range: near-exact; sparse edge: visibly worse
      val errHalf = math.abs(rows("2_half").getDouble(6) - 1.0)
      val errEdge = math.abs(rows("3_edge").getDouble(6) - 1.0)
      assert(errHalf < 0.05,
        s"half-domain estimate should be near-exact, off by $errHalf")
      assert(errEdge > errHalf,
        "the sparse edge must show more estimation error than the dense half")
    }
  }
}
