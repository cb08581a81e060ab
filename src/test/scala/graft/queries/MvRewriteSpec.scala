package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_mv_rewrite` — the rollup-match MV rewrite. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE: the change history replays
  *    locally to the final snapshot; both the rolled-up and direct
  *    answers (including the exact-double avg) match every emitted row
  *    at both gate scales;
  *  - the REWRITE IS CORRECT on every lang (`rewrite_ok` all true —
  *    decomposability of count/sum over the maintained partials);
  *  - the avg genuinely needs the partials: at least one lang's rolled
  *    avg differs from the mean of its per-source averages (the
  *    avg-of-avgs trap is live on this fixture, not hypothetical).
  */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private case class Doc(id: Long, lang: String, source: String, n: Long)

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + rewrite correctness ($dir)") {
      val base = RefQueries.table(spark, dir, "documents")
        .select("doc_id", "lang", "source", "n_chars").collect()
        .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      val got = ExtQueries.mvRewrite(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
      spark.catalog.clearCache()

      // replay the mod-9 history to the final snapshot
      val off = ExtQueries.VariantIdOffset
      var snap = base.map(d => d.id -> d).toMap
      for (v <- 1 to ExtQueries.TimeTravelVersions) {
        val delIds = base.collect {
          case d if d.id % 9 == v || (v == 3 && d.id % 9 == 4) => d.id }.toSet
        val upd = base.collect {
          case d if d.id % 9 == v + 3 || d.id % 9 == 7 => d.copy(n = d.n + 3) }
        val ins = base.collect { case d if d.id % 9 == 0 =>
          Doc(d.id + v * off, d.lang, d.source, d.n + 3) }
        snap = snap -- delIds ++ (upd ++ ins).map(d => d.id -> d).toMap
      }
      val mv = snap.values.groupBy(d => (d.lang, d.source)).map {
        case (g, ds) => g -> (ds.size.toLong, ds.map(_.n).sum) }
      val want = snap.values.groupBy(_.lang).map { case (l, ds) =>
        val parts = mv.filter(_._1._1 == l).values
        val (n, s) = (parts.map(_._1).sum, parts.map(_._2).sum)
        l -> (n, s, s.toDouble / n.toDouble,
          ds.size.toLong, ds.map(_.n).sum, true)
      }
      assert(got == want, s"got $got want $want")
      assert(got.values.forall(_._6), "every lang must rewrite correctly")

      // the avg-of-avgs trap is live: per-source group sizes are unequal
      // enough that naive averaging of averages diverges somewhere
      val trapLive = snap.values.groupBy(_.lang).exists { case (l, _) =>
        val parts = mv.filter(_._1._1 == l).values.toSeq
        val naive = parts.map(p => p._2.toDouble / p._1).sum / parts.size
        math.abs(naive - got(l)._3) > 1e-9
      }
      assert(trapLive, "avg-of-avgs coincides everywhere — fixture too uniform")
    }
  }
}
