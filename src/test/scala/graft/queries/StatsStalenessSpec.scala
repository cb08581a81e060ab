package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_stats_staleness` — the ANALYZE-lifecycle audit. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE (the v0 histogram estimate, the
  *    replayed per-version actuals, churn counters and the trigger) at
  *    both gate scales;
  *  - version 0 ≡ the graded `e_range_estimate` audit (same estimate,
  *    same actual — the stats ARE that key's);
  *  - the TRIGGER SCHEDULE is exact: no re-analyze at version 0, fires
  *    at every later version (the fixture churns ~45% per version,
  *    far past the 1/10 scale factor);
  *  - the honesty claim: at the final version the same stale histogram
  *    is query-dependently wrong — max |err−1| over the pinned ranges
  *    is ≥ 2× the min — which is WHY the trigger counts churn instead
  *    of watching error.
  */
class StatsStalenessSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private case class Doc(id: Long, n: Long)

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + trigger schedule + query-dependent drift ($dir)") {
      val base = RefQueries.table(spark, dir, "documents")
        .select("doc_id", "n_chars").collect()
        .map(r => Doc(r.getLong(0), r.getLong(1)))
      val got = ExtQueries.statsStaleness(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)),
          r.getLong(7), r.getDouble(8), r.getBoolean(9))).toMap
      val v0Audit = ExtQueries.rangeEstimate(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getDouble(4), r.getLong(5))).toMap
      spark.catalog.clearCache()

      // the v0 equi-width histogram + pinned ranges (rangeEstimate's own)
      val b = ExtQueries.RangeEstBuckets
      val n0 = base.length.toLong
      val (lo, hi) = (base.map(_.n).min, base.map(_.n).max)
      val wd = (hi - lo + b) / b
      val hist = base.groupBy(d => (d.n - lo) / wd).view
        .mapValues(_.size.toLong).toMap
      val span = hi - lo + 1
      val ranges = Seq(
        ("1_narrow", lo + span / 10, lo + span * 2 / 10),
        ("2_half", lo + span / 4, lo + span * 3 / 4),
        ("3_edge", hi - span / 20, hi))
      def est(qlo: Long, qhi: Long): Double =
        hist.map { case (bk, cnt) =>
          cnt * math.max(0L, math.min(qhi, lo + (bk + 1) * wd - 1) -
            math.max(qlo, lo + bk * wd) + 1)
        }.sum.toDouble / wd.toDouble

      // replay + churn
      val off = ExtQueries.VariantIdOffset
      var snap = base.map(d => d.id -> d).toMap
      var churn = 0L
      for (v <- 0 to ExtQueries.TimeTravelVersions) {
        if (v > 0) {
          val delIds = base.collect {
            case d if d.id % 9 == v || (v == 3 && d.id % 9 == 4) => d.id }.toSet
          val upd = base.collect {
            case d if d.id % 9 == v + 3 || d.id % 9 == 7 => d.copy(n = d.n + 3) }
          val ins = base.collect { case d if d.id % 9 == 0 =>
            Doc(d.id + v * off, d.n + 3) }
          snap = snap -- delIds ++ (upd ++ ins).map(d => d.id -> d).toMap
          churn += delIds.size + upd.size + ins.size
        }
        val fire = churn * ExtQueries.StalenessThresholdDen >=
          n0 * ExtQueries.StalenessThresholdNum
        for ((rid, qlo, qhi) <- ranges) {
          val act = snap.values.count(d => d.n >= qlo && d.n <= qhi).toLong
          val e = est(qlo, qhi)
          val want = (qlo, qhi, e, act,
            if (act == 0) None else Some(e / act.toDouble),
            churn, churn.toDouble / n0.toDouble, fire)
          assert(got((v.toLong, rid)) == want,
            s"v$v $rid: ${got((v.toLong, rid))} vs $want")
        }
        assert(got((v.toLong, "1_narrow"))._8 == (v >= 1),
          s"trigger schedule at v$v")
      }

      // v0 ≡ the graded audit
      for ((rid, _, _) <- ranges)
        assert((got((0L, rid))._3, got((0L, rid))._4) == v0Audit(rid),
          s"v0 $rid must equal e_range_estimate")

      // query-dependent drift at the final version
      val errs = ranges.map { case (rid, _, _) =>
        math.abs(got((ExtQueries.TimeTravelVersions.toLong, rid))._5.get - 1) }
      assert(errs.max >= 2 * errs.min,
        s"stale error must be query-dependent (>=2x spread): $errs")
    }
  }
}
