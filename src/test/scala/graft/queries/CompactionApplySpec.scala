package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_compaction_apply` — plan execution + re-audit, the full OPTIMIZE
  * loop. Pins the invariants a lakehouse OPTIMIZE job asserts before
  * swapping the manifest: bytes/docs conserved per source, the compacted
  * layout has exactly the plan's bin count, skipping stays SOUND on the
  * compacted files (a skipped bin never holds a match), the predicate's
  * match total is preserved across layouts, and the file count genuinely
  * drops (the operation did something). */
class CompactionApplySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private case class R(layout: String, source: String, fileId: Long,
    nFiles: Long, nDocs: Long, bytes: Long, idMin: Long, idMax: Long,
    kept: Long, nMatch: Long)

  test("apply executes the plan and the re-audit invariants hold") {
    val got = ExtQueries.compactionApply(spark, dir).collect().map(r =>
      R(r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))
    spark.catalog.clearCache()
    val (inp, comp) = (got.filter(_.layout == "input"), got.filter(_.layout == "compacted"))
    assert(inp.nonEmpty && comp.nonEmpty)

    // executing the plan: compacted group count per source == plan bins
    val plan = ExtQueries.compactionPlan(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(5), r.getLong(6))))
      .toMap
    assert(comp.map(c => (c.source, c.fileId)).toSet == plan.keySet,
      "compacted output groups must be exactly the plan's bins")
    comp.foreach { c =>
      val (nFiles, nDocs, binBytes) = plan((c.source, c.fileId))
      assert(c.nFiles == nFiles && c.nDocs == nDocs && c.bytes == binBytes,
        s"${c.source} bin ${c.fileId}: merged stats must equal the plan's")
    }

    // conservation: per source, bytes/docs/matches survive the rewrite
    def bySource(rs: Array[R]): Map[String, (Long, Long, Long)] =
      rs.groupBy(_.source).view.mapValues(g =>
        (g.map(_.bytes).sum, g.map(_.nDocs).sum, g.map(_.nMatch).sum)).toMap
    assert(bySource(inp) == bySource(comp),
      "bytes, docs and predicate matches must be conserved per source")

    // the operation did something: strictly fewer files after compaction
    assert(comp.length < inp.length,
      s"compaction must reduce the file count (${inp.length} -> ${comp.length})")

    // skipping soundness on BOTH layouts: a skipped file never holds a match
    got.foreach { r =>
      if (r.kept == 0L) assert(r.nMatch == 0L,
        s"${r.layout} ${r.source}/${r.fileId}: skipped file holds matches")
      assert(r.idMin <= r.idMax && r.nDocs >= 1L)
    }
    // the audit is non-degenerate: the predicate keeps some and skips some
    // compacted files, so the re-audit genuinely grades pruning
    assert(comp.exists(_.kept == 1L) && comp.exists(_.kept == 0L),
      "pinned predicate must split the compacted layout")

    // the efficiency story: rows read under the predicate never exceed the
    // input layout's by more than the merge widening, and the kept-file
    // count drops (fewer task launches at the same match total)
    assert(comp.count(_.kept == 1L) < inp.count(_.kept == 1L),
      "compaction must reduce the kept-file count under the predicate")
  }
}
