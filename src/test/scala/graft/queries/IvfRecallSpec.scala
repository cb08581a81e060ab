package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Recall contract for the IVF ANN operator: probing more cells must not
  * lose neighbors, and probing EVERY cell degenerates to the exact
  * brute-force baseline (same scores, same pinned tie-break) — the property
  * that makes nprobe a true recall knob rather than a label.
  */
class IvfRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def topkPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("recall@10 is monotone in nprobe and exact at nprobe = cells") {
    val exact = topkPairs(ExtQueries.cosineTopk(spark, dir))
    assert(exact.nonEmpty)
    val recalls = Seq(1, 2, ExtQueries.IvfCells).map { np =>
      val pairs = topkPairs(ExtQueries.cosineTopkIvfNprobe(spark, dir, np))
      np -> (pairs & exact).size.toDouble / exact.size
    }
    val byProbe = recalls.toMap
    withClue(s"recall@10 by nprobe: $recalls") {
      assert(byProbe(1) <= byProbe(2), "nprobe=2 must not lose neighbors vs 1")
      assert(byProbe(2) <= byProbe(ExtQueries.IvfCells))
      assert(byProbe(ExtQueries.IvfCells) == 1.0,
        "probing every cell must reproduce the exact baseline's pair set")
      assert(byProbe(2) > byProbe(1),
        "on this corpus a second probe must recover real neighbors")
    }
  }

  test("e_ivf_nprobe IS the nprobe = IvfNprobeDefault serve and surfaces " +
      "cross-cell neighbors the single probe misses") {
    // the graded key binds the knob at the pinned operating point
    assert(ExtQueries.ivfNprobe(spark, dir).collect()
      === ExtQueries.cosineTopkIvfNprobe(spark, dir,
        ExtQueries.IvfNprobeDefault).collect())
    // the recall side of the dial, realized: nprobe = 2 returns top-k
    // members the single-cell probe structurally cannot see (a boundary
    // neighbor lives in the query's SECOND-nearest cell)
    val p1 = ExtQueries.cosineTopkIvfNprobe(spark, dir, 1)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = ExtQueries.ivfNprobe(spark, dir)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((p2 -- p1).nonEmpty,
      "the second probe must surface cross-cell candidates on this corpus")
  }

  test("nprobe = cells reproduces the exact baseline rows bit-for-bit") {
    val exact = ExtQueries.cosineTopk(spark, dir).collect()
    val full = ExtQueries.cosineTopkIvfNprobe(spark, dir, ExtQueries.IvfCells).collect()
    assert(full === exact)
  }

  test("nprobe outside [1, cells] fails fast") {
    intercept[IllegalArgumentException](
      ExtQueries.cosineTopkIvfNprobe(spark, dir, 0))
    intercept[IllegalArgumentException](
      ExtQueries.cosineTopkIvfNprobe(spark, dir, ExtQueries.IvfCells + 1))
  }
}
