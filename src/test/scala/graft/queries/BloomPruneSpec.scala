package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_bloom_prune` — bloom-filter data skipping vs zone maps on a
  * composite needle lookup. The pins: a LOCAL replay of the whole
  * dataflow (md5 bits, per-file bloom, min-max hulls, exact matches); the
  * bloom's NO-FALSE-NEGATIVE guarantee; and the regime the operator
  * exists to show — the zone maps keep essentially everything (in-hull
  * probes) while the bloom both skips absent needles AND pays a measured
  * false-positive price. */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def h64(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
  test(s"verdicts equal the local replay; no false negatives; both regimes live ($dir)") {
    val m = ExtQueries.BloomBits
    val rows = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_id div 500 as f", "user_id % 65536 as uid",
        "(unix_micros(cast(ts as timestamp)) div 86400000000) % 65536 as day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val files = rows.map(_._1).distinct.sorted
    val bits = rows.groupBy(_._1).view.mapValues(_.flatMap { case (_, u, d) =>
      Seq(h64(s"bp1:$u:$d") % m, h64(s"bp2:$u:$d") % m)
    }.toSet).toMap
    val hulls = rows.groupBy(_._1).view.mapValues { fs =>
      val cks = fs.map { case (_, u, d) => u * 100000L + d }
      (cks.min, cks.max)
    }.toMap
    val present = rows.map { case (f, u, d) => ((f, u, d), 1) }
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap

    val got = ExtQueries.bloomPrune(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    spark.catalog.clearCache()
    assert(got.size == files.length * ExtQueries.BloomProbes.length)

    var fp = 0L; var trueSkips = 0L; var hits = 0L
    for ((u, d) <- ExtQueries.BloomProbes; f <- files) {
      val (km, kb, nm) = got((u, d, f))
      val ck = u * 100000L + d
      assert(km == (if (ck >= hulls(f)._1 && ck <= hulls(f)._2) 1L else 0L))
      val wantKb = bits(f)(h64(s"bp1:$u:$d") % m) && bits(f)(h64(s"bp2:$u:$d") % m)
      assert(kb == (if (wantKb) 1L else 0L), s"bloom verdict ($u,$d,$f)")
      assert(nm == present.getOrElse((f, u, d), 0L), s"match count ($u,$d,$f)")
      // the bloom guarantee: a skipped file never holds a match
      if (kb == 0L) assert(nm == 0L, "false negative!")
      if (nm > 0L) hits += 1
      else if (kb == 1L) fp += 1
      else trueSkips += 1
    }
    // the motivating regime: zone maps keep every in-hull probe (measured:
    // they keep the large majority), the bloom skips most absent needles
    // AND pays a visible false-positive price
    assert(hits > 0, "fixture must contain present probes")
    assert(trueSkips > 0, "bloom must skip absent needles")
    assert(fp > 0, "undersized bloom must show its false-positive price")
    val minmaxKept = got.values.count(_._1 == 1L)
    assert(minmaxKept > got.size / 2,
      "zone maps must keep the majority — the regime blooms exist for")
  }
}
