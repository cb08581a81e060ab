package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_vacuum_plan` — the retention dry-run over the time-travel history.
  * The pins: the no-op floor (v = 0) reclaims nothing; per-floor log
  * sizes and tombstone counts recompute from the change-class arithmetic
  * (an INDEPENDENT derivation — the operator counts the generated log,
  * this counts the mod-9 classes); live counts equal the graded AS-OF
  * slices; reclaimable is their difference and grows monotonically. */
class VacuumPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("floor pricing matches the change-class arithmetic and the AS-OF slices") {
    val mods = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0) % 9)
    def n(m: Long): Long = mods.count(_ == m).toLong
    val base = mods.length.toLong
    // per-batch entry/tombstone counts from the class rules
    // (timeTravelLog's scaladoc): batch v = deletes (class v; plus class 4
    // at v=3) + updates (classes 3+v and 7) + inserts (class 0)
    def dels(v: Int): Long = if (v == 3) n(3) + n(4) else n(v)
    def entries(v: Int): Long = dels(v) + n(3 + v) + n(7) + n(0)

    val rows = ExtQueries.vacuumPlan(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    spark.catalog.clearCache()
    assert(rows.keySet == (0L to ExtQueries.TimeTravelVersions.toLong).toSet)

    // live counts from the graded AS-OF table (the cross-certified key)
    val live = ExtQueries.timeTravel(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    spark.catalog.clearCache()

    var nLog = base
    var nTomb = 0L
    for (v <- 0 to ExtQueries.TimeTravelVersions) {
      if (v > 0) { nLog += entries(v); nTomb += dels(v) }
      val (gLog, gLive, gTomb, gRecl) = rows(v.toLong)
      assert(gLog == nLog, s"v=$v n_log")
      assert(gTomb == nTomb, s"v=$v n_tombstones")
      assert(gLive == live(v.toLong), s"v=$v n_live != AS-OF slice")
      assert(gRecl == gLog - gLive, s"v=$v n_reclaimable")
    }
    // the no-op floor reclaims nothing; pricing grows with the floor
    assert(rows(0L)._4 == 0L && rows(0L)._3 == 0L)
    val recl = (0L to ExtQueries.TimeTravelVersions.toLong).map(rows(_)._4)
    assert(recl.sliding(2).forall(p => p(0) <= p(1)),
      "reclaimable must be monotone in the floor")
    assert(recl.last > 0L, "full compaction must reclaim on this fixture")
  }
}
