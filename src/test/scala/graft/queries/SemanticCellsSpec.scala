package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The `cells` parameter is the SemDeDup √N cost knob: in-cell work is
  * (N/cells)² per cell, so raising cells must strictly shrink the
  * candidate-pair volume the self-join compares, while the kept/dropped
  * decision stays consistent at matched θ (duplicate groups sit near one
  * point in embedding space, so they co-assign under any of these cell
  * counts). This spec measures both — the proof the knob is real code, not
  * scaladoc prose. */
class SemanticCellsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  /** Number of same-cell candidate pairs the in-cell self-join compares
    * BEFORE the θ filter — the quantity that is quadratic per cell. */
  private def candidatePairs(cells: Int): Long = {
    val a = ExtQueries.semanticAssigned(spark, dir, cells)
    val n = a.as("x")
      .join(a.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .count()
    a.unpersist()
    n
  }

  private def decisions(cells: Int): Map[Long, Boolean] = {
    val out = ExtQueries.semanticDedupCells(spark, dir, cells)
      .select("vec_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    spark.catalog.clearCache()
    out
  }

  test("candidate-pair volume shrinks strictly as cells grows") {
    val counts = Seq(2, 4, 8, 16).map(c => c -> candidatePairs(c))
    for (Seq((cLo, nLo), (cHi, nHi)) <- counts.sliding(2))
      assert(nHi < nLo,
        s"cells $cLo→$cHi must cut candidate pairs, got $nLo→$nHi")
  }

  test("matched θ: every drop is a true θ-duplicate; recall bounded vs brute force") {
    // "Consistent at matched θ" means exactly two things, and both are
    // relative to the ONE-cell run (= brute-force all-pairs, the ground
    // truth of the pairwise rule):
    //   soundness — cell partitioning only REMOVES candidate comparisons,
    //     so any drop at any cell count is backed by a genuinely θ-similar
    //     smaller-id vector: drops(cells) ⊆ drops(brute), with NO
    //     tolerance. (Between two partitionings ≠ 1 neither direction is
    //     monotone — re-assignment both splits pairs and co-locates new
    //     ones — which is why the comparison anchors at brute force.)
    //   recall — the cost of the (N/cells)² saving is missed cross-cell
    //     pairs; duplicate groups sit near one point in embedding space,
    //     so the loss must stay a boundary effect, not a collapse.
    val brute = decisions(1)
    val bruteDrops = brute.collect { case (v, false) => v }.toSet
    assert(bruteDrops.nonEmpty, "fixture must contain θ-duplicates")
    for (cells <- Seq(ExtQueries.IvfCells, 8, 16)) {
      val got = decisions(cells)
      assert(got.keySet === brute.keySet, s"cells=$cells changed the vector set")
      val drops = got.collect { case (v, false) => v }.toSet
      val invented = drops -- bruteDrops
      assert(invented.isEmpty,
        s"cells=$cells dropped vectors with NO θ-similar smaller neighbor: " +
          s"${invented.take(10).toSeq.sorted}")
      assert(drops.size * 10 >= bruteDrops.size * 7,
        s"cells=$cells recall collapsed: ${drops.size}/${bruteDrops.size} drops")
    }
  }

  test("oracle entry point is exactly cells = IvfCells") {
    val viaDefault = ExtQueries.semanticDedup(spark, dir).collect().toSeq
    spark.catalog.clearCache()
    val viaParam =
      ExtQueries.semanticDedupCells(spark, dir, ExtQueries.IvfCells).collect().toSeq
    spark.catalog.clearCache()
    assert(viaDefault === viaParam)
  }
}
