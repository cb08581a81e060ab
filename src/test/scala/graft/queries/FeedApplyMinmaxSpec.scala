package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_feed_apply_minmax` — the retractable-extremum maintainer. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE: the change history is replayed
  *    locally (the mod-9 fixture classes) and the LAZY MAINTAINER itself
  *    is re-implemented (monoid fold for inserts, conservative re-scan
  *    trigger on extremum retraction, emptied groups dropped) — every
  *    (version, group) row including the `rescans` accounting, at both
  *    gate scales;
  *  - maintained ≡ recomputed: the maintainer's extrema equal a direct
  *    snapshot recompute at EVERY version (the induction the operator's
  *    scaladoc claims);
  *  - BOTH maintenance paths are genuinely exercised: ≥1 re-scan fires,
  *    AND ≥1 group's extremum moves through the pure monoid path
  *    (rescans = 0) — the fixture forces the fallback without reducing
  *    the operator to recompute-always.
  */
class FeedApplyMinmaxSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private case class Doc(id: Long, lang: String, source: String, n: Long)

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local maintainer recompute + both paths exercised ($dir)") {
      val base = RefQueries.table(spark, dir, "documents")
        .select("doc_id", "lang", "source", "n_chars").collect()
        .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      val got = ExtQueries.feedApplyMinmax(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)) ->
          (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
      spark.catalog.clearCache()

      val off = ExtQueries.VariantIdOffset
      var snap = base.map(d => d.id -> d).toMap
      var state = base.groupBy(d => (d.lang, d.source)).map { case (g, ds) =>
        g -> (ds.size.toLong, ds.map(_.n).max, ds.map(_.n).min, 0L)
      }
      var want = Map.empty[(Long, String, String), (Long, Long, Long, Long)]
      for (((l, s), (n, mx, mn, _)) <- state)
        want += ((0L, l, s) -> (n, mx, mn, 0L))
      var totalRescans = 0L
      var monoidMoves = 0L
      for (v <- 1 to ExtQueries.TimeTravelVersions) {
        val delIds = base.collect {
          case d if d.id % 9 == v || (v == 3 && d.id % 9 == 4) => d.id
        }.toSet
        val updPost = base.collect {
          case d if d.id % 9 == v + 3 || d.id % 9 == 7 => d.copy(n = d.n + 3)
        }
        val ins = base.collect {
          case d if d.id % 9 == 0 => Doc(d.id + v * off, d.lang, d.source, d.n + 3)
        }
        // feed view of this version against the previous snapshot
        val retr = (delIds ++ updPost.map(_.id)).toSeq.flatMap(snap.get)
        val insAll = updPost ++ ins
        val byG = (retr.map(d => (d.lang, d.source)) ++
          insAll.map(d => (d.lang, d.source))).distinct
        val newState = (state.keySet ++ byG).flatMap { g =>
          val (pn, pmx, pmn, _) = state.getOrElse(g, (0L, 0L, 0L, 0L))
          val has = state.contains(g)
          val rv = retr.filter(d => (d.lang, d.source) == g).map(_.n)
          val iv = insAll.filter(d => (d.lang, d.source) == g).map(_.n)
          val nNew = pn - rv.size + iv.size
          if (nNew <= 0) None
          else {
            val resMax = has && rv.nonEmpty && rv.max == pmx
            val resMin = has && rv.nonEmpty && rv.min == pmn
            // the re-scan reads the AS-OF(v) snapshot, which includes
            // this version's own inserts — apply the batch first
            lazy val alive = (snap -- delIds ++
              (updPost ++ ins).map(d => d.id -> d).toMap).values
              .filter(d => (d.lang, d.source) == g).map(_.n)
            val mx = if (resMax) alive.max
              else if (!has) iv.max else if (iv.isEmpty) pmx
              else math.max(pmx, iv.max)
            val mn = if (resMin) alive.min
              else if (!has) iv.min else if (iv.isEmpty) pmn
              else math.min(pmn, iv.min)
            val resc = (if (resMax) 1L else 0L) + (if (resMin) 1L else 0L)
            if (resc == 0 && has && (mx > pmx || mn < pmn)) monoidMoves += 1
            totalRescans += resc
            Some(g -> (nNew, mx, mn, resc))
          }
        }.toMap
        // untouched groups carry over with zero rescans
        val carried = state.collect {
          case (g, (n, mx, mn, _)) if !byG.contains(g) && !newState.contains(g) =>
            g -> (n, mx, mn, 0L)
        }
        state = newState ++ carried
        snap = snap -- delIds ++ (updPost ++ ins).map(d => d.id -> d).toMap
        for (((l, s), (n, mx, mn, r)) <- state)
          want += ((v.toLong, l, s) -> (n, mx, mn, r))
        // maintained ≡ recomputed at this version
        val rec = snap.values.groupBy(d => (d.lang, d.source)).map {
          case (g, ds) => g -> (ds.size.toLong, ds.map(_.n).max, ds.map(_.n).min)
        }
        assert(state.view.mapValues(t => (t._1, t._2, t._3)).toMap == rec,
          s"maintained != recomputed at version $v")
      }
      assert(got == want, {
        val d1 = got.keySet -- want.keySet
        val d2 = want.keySet -- got.keySet
        val diff = got.collect { case (k, x) if want.get(k).exists(_ != x) =>
          s"$k: got $x want ${want(k)}" }.take(5)
        s"extra=$d1 missing=$d2 diffs=$diff"
      })
      assert(totalRescans >= 1, "fixture forces no rescan — degenerate")
      assert(monoidMoves >= 1, "monoid path never moved an extremum")
    }
  }
}
