package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_manifest_prune` — two-tier metadata pruning. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE (file inventory, merged manifest
  *    stats, both strategies' read counts / keep sets / match totals) at
  *    both gate scales;
  *  - SOUNDNESS: the two-tier keep set and match total equal the flat
  *    ones exactly (merged stats only widen bounds — manifest pruning
  *    never skips a manifest holding a keepable file);
  *  - the PAYOFF is real: two-tier reads strictly fewer metadata rows,
  *    and the manifest tier genuinely prunes (survivor manifests <
  *    all manifests — otherwise the hierarchy is dead weight).
  */
class ManifestPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + soundness + payoff ($dir)") {
      val docs = RefQueries.table(spark, dir, "documents")
        .select("source", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val got = ExtQueries.manifestPrune(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      spark.catalog.clearCache()

      val fd = ExtQueries.CompactionFileDocs
      val mf = ExtQueries.ManifestFiles
      val lo = ExtQueries.ManifestPruneIdLo
      val hi = ExtQueries.ManifestPruneIdHi
      val files = docs.groupBy { case (s, id) => (s, id / fd) }.map {
        case ((s, f), ds) =>
          val ids = ds.map(_._2)
          (s, f, ids.min, ids.max, ids.count(id => id >= lo && id < hi).toLong)
      }.toSeq
      def keep(mn: Long, mx: Long) = mx >= lo && mn < hi
      val flatKept = files.count(f => keep(f._3, f._4)).toLong
      val flatMatch = files.filter(f => keep(f._3, f._4)).map(_._5).sum
      val manifests = files.groupBy(f => (f._1, f._2 / mf)).map {
        case (k, fs) => k -> (fs.map(_._3).min, fs.map(_._4).max)
      }
      val surv = manifests.filter { case (_, (mn, mx)) => keep(mn, mx) }.keySet
      val tierFiles = files.filter(f => surv((f._1, f._2 / mf)))
      val want = Map(
        "flat" -> (files.size.toLong, flatKept, flatMatch),
        "two_tier" -> (manifests.size.toLong + tierFiles.size,
          tierFiles.count(f => keep(f._3, f._4)).toLong,
          tierFiles.filter(f => keep(f._3, f._4)).map(_._5).sum))
      assert(got == want, s"got $got want $want")

      assert(got("flat")._2 == got("two_tier")._2 &&
        got("flat")._3 == got("two_tier")._3,
        "keep set / match total must be tier-invariant (soundness)")
      assert(got("two_tier")._1 < got("flat")._1,
        "two-tier must read strictly fewer metadata rows")
      assert(surv.size < manifests.size,
        "the manifest tier must genuinely prune on this fixture")
    }
  }
}
