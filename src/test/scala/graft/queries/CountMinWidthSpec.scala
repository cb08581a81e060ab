package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The Count-Min `width` parameter is the sketch's error knob (total
  * overcount across probes shrinks as the grid widens, reaching 0 once
  * collisions vanish) while the one-sided guarantee holds at EVERY width
  * — the proof the knob is real code, not scaladoc prose
  * ([[SemanticCellsSpec]]'s philosophy applied to the sketch family). */
class CountMinWidthSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def overcounts(width: Int): Seq[Long] = {
    val rows = ExtQueries.countMinWidth(spark, dir, width).collect()
      .map(r => r.getLong(3))
    spark.catalog.clearCache()
    rows.toSeq
  }

  test("widening the grid monotonically shrinks total overcount; never-under holds at every width") {
    // 31-token vocabulary: width 4 forces heavy collisions, 64 fewer,
    // 4096 should separate every token in all four rows
    val w4 = overcounts(4)
    val w64 = overcounts(64)
    val w4096 = overcounts(4096)
    for (o <- w4 ++ w64 ++ w4096)
      assert(o >= 0L, "CMS undercounted — the one-sided guarantee broke")
    assert(w4.sum > w64.sum,
      s"width 4 (${w4.sum}) not worse than 64 (${w64.sum}) — knob inert")
    assert(w64.sum >= w4096.sum)
    assert(w4096.sum == 0L,
      s"4096 cells for ~31 tokens must separate fully, got ${w4096.sum}")
  }
}
