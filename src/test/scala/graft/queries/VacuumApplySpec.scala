package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_vacuum_apply` — vacuum EXECUTION over the time-travel history. The
  * local pins close the loop `e_vacuum_plan` opened:
  *
  *  - READ PRESERVATION: every AS-OF read at or above the retain floor is
  *    byte-identical before and after the rewrite (both via the
  *    production-shaped single-version read and via the full audit read),
  *  - FAIL LOUD below the floor: a vacuumed version is gone, not silently
  *    reconstructed wrong,
  *  - the PLAN REALIZED: the rewrite reclaims exactly the `n_reclaimable`
  *    entries `e_vacuum_plan` priced at the floor, and the compacted log
  *    is exactly (AS-OF-floor live rows as the new base) + (post-floor
  *    entries carried over) — pinned at both gate scales so the floor
  *    constant is non-degenerate on each.
  */
class VacuumApplySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  private val floor = ExtQueries.VacuumRetainFloor
  private val top = ExtQueries.TimeTravelVersions

  private def snapMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(1) ->
      (r.getString(2), r.getString(3), r.getString(4), r.getLong(5))).toMap

  test("reads at or above the floor are preserved; the audit read matches") {
    val audit = ExtQueries.vacuumApply(spark, dir).collect()
      .groupBy(_.getLong(0))
    assert(audit.keySet == (floor to top).map(_.toLong).toSet,
      "the audit emits exactly the retained versions")
    for (v <- floor to top) {
      val before = snapMap(ExtQueries.snapshotAsOf(spark, dir, v))
      val after = snapMap(ExtQueries.vacuumedSnapshotAsOf(spark, dir, v))
      assert(after == before, s"AS OF $v changed across the vacuum rewrite")
      val auditV = audit(v.toLong).map(r => r.getLong(1) ->
        (r.getString(2), r.getString(3), r.getString(4), r.getLong(5))).toMap
      assert(auditV == before, s"audit block $v != the pre-vacuum read")
    }
  }

  test("reads below the floor fail loud") {
    val e = intercept[IllegalArgumentException] {
      ExtQueries.vacuumedSnapshotAsOf(spark, dir, floor - 1)
    }
    assert(e.getMessage.contains("retain floor"))
    intercept[IllegalArgumentException] {
      ExtQueries.vacuumedSnapshotAsOf(spark, dir, top + 1)
    }
  }

  test("the rewrite realizes the plan's n_reclaimable exactly, both scales") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val plan = ExtQueries.vacuumPlan(spark, d).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
        .toMap // version -> (n_log, n_live, n_reclaimable)
      val compacted = ExtQueries.vacuumCompactedLog(spark, d)
        .persist()
      val nAfter = compacted.count()
      val nBase = compacted.filter(
        org.apache.spark.sql.functions.col("ver") === floor.toLong &&
          org.apache.spark.sql.functions.col("op") === "B").count()
      val nTail = compacted.filter(
        org.apache.spark.sql.functions.col("ver") > floor.toLong).count()
      compacted.unpersist()
      val (nLogFloor, nLiveFloor, nReclaim) = plan(floor.toLong)
      val (nLogAll, _, _) = plan(top.toLong)
      assert(nBase == nLiveFloor, s"$d: rewritten base != AS-OF-floor live rows")
      assert(nTail == nLogAll - nLogFloor, s"$d: carried tail != post-floor entries")
      assert(nAfter == nBase + nTail, s"$d: compacted log has stray entries")
      assert(nLogAll - nAfter == nReclaim,
        s"$d: reclaimed entries != the plan's n_reclaimable at the floor")
      assert(nReclaim > 0, s"$d: degenerate fixture — nothing reclaimed")
      spark.catalog.clearCache()
    }
  }
}
