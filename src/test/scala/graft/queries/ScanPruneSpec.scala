package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_scan_prune` — two-layout file-skipping audit. Replays the whole
  * derivation sequentially (uid16/day16, morton key, file cuts, stats,
  * keep/skip, exact match counts) and pins the properties that make
  * data skipping trustworthy and worthwhile: a skipped file never
  * contains a match, both layouts see the same true matches, and the
  * z-order layout reads fewer rows for the pinned predicate. */
class ScanPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }

  test("pruning equals the sequential replay; skips are sound; z-order reads less") {
    val events = RefQueries.table(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val rows = events.flatMap { case (eid, uid, us) =>
      val uid16 = java.lang.Math.floorMod(uid, 65536L)
      val day16 = java.lang.Math.floorMod(us / 86400000000L, 65536L)
      val zkey = morton(uid16, day16, 16)
      val m = if (uid16 >= ExtQueries.ScanPruneUidLo && uid16 < ExtQueries.ScanPruneUidHi
        && day16 >= ExtQueries.ScanPruneDayLo && day16 < ExtQueries.ScanPruneDayHi) 1L else 0L
      Seq(("append", eid / ExtQueries.ScanPruneFileRows, uid16, day16, m),
        ("zorder", zkey / ExtQueries.ScanPruneTileStride, uid16, day16, m))
    }
    val want = rows.groupBy(r => (r._1, r._2)).map { case ((layout, fid), g) =>
      val (um, ux) = (g.map(_._3).min, g.map(_._3).max)
      val (dm, dx) = (g.map(_._4).min, g.map(_._4).max)
      val kept = if (ux >= ExtQueries.ScanPruneUidLo && um < ExtQueries.ScanPruneUidHi
        && dx >= ExtQueries.ScanPruneDayLo && dm < ExtQueries.ScanPruneDayHi) 1L else 0L
      (layout, fid) -> ((g.size.toLong, um, ux, dm, dx, kept, g.map(_._5).sum))
    }

    val got = ExtQueries.scanPrune(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8)))).toMap
    spark.catalog.clearCache()

    assert(got == want, "pruning audit must equal the sequential replay")
    assert(got.nonEmpty)
    // soundness: a skipped file NEVER contains a match (stats conservative)
    got.values.foreach { case (_, _, _, _, _, kept, nMatch) =>
      if (kept == 0L) assert(nMatch == 0L, "skipped file must hold no match")
    }
    // both layouts cover the same rows: identical total match counts
    def tot(layout: String)(f: ((Long, Long, Long, Long, Long, Long, Long)) => Long) =
      got.collect { case ((l, _), v) if l == layout => f(v) }.sum
    assert(tot("append")(_._7) == tot("zorder")(_._7))
    // the point of z-ordering: fewer rows read for the 2-D predicate
    def readRows(layout: String) =
      got.collect { case ((l, _), v) if l == layout && v._6 == 1L => v._1 }.sum
    assert(readRows("zorder") < readRows("append"),
      s"zorder must read fewer rows (${readRows("zorder")} vs ${readRows("append")})")
    // and the z-order layout actually skips on the fixture (at sf0.001 the
    // append layout has only two ~15-day files, both overlapping the
    // 7-day window — the coarse-layout limitation the operator exposes)
    assert(got.exists { case ((l, _), v) => l == "zorder" && v._6 == 0L },
      "zorder layout must skip at least one tile")
  }
}
