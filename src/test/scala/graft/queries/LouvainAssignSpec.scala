package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_louvain_assign` — the hierarchy projection. Pins:
  *
  *  - PROJECTION ≡ HIERARCHY: per-community node counts equal the
  *    level-[[ExtQueries.LouvainLevels]] report's n_nodes exactly, and
  *    the community sets match — the node-level deliverable is the
  *    hierarchy, not a re-derivation that could drift;
  *  - COARSENING: nodes sharing a level-0 label never split across
  *    final communities (each label0 maps to exactly one community);
  *  - the projection genuinely contracts (fewer communities than
  *    level-0 labels) at both gate scales.
  */
class LouvainAssignSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"projection == hierarchy; coarsening ($dir)") {
      val asg = ExtQueries.louvainAssign(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      val top = ExtQueries.louvainLevels(spark, dir).collect()
        .filter(_.getLong(0) == ExtQueries.LouvainLevels.toLong)
        .map(r => r.getInt(1) -> r.getLong(2)).toMap
      spark.catalog.clearCache()

      val byComm = asg.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      assert(byComm == top,
        s"projection counts != level-${ExtQueries.LouvainLevels} report")
      val split = asg.groupBy(_._2).view.mapValues(_.map(_._3).distinct.size)
      assert(split.values.forall(_ == 1),
        "a level-0 label split across final communities — not a coarsening")
      assert(byComm.size < asg.map(_._2).distinct.length,
        "the projection must genuinely contract")
    }
  }
}
