package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_cosine_topk_pq` graded the way the other ANN families are: structural
  * invariants, the self-coding property of the pinned codebook, and measured
  * recall against the exact [[ExtQueries.cosineTopk]] baseline. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("codebook seed vectors encode as themselves (d2 = 0, pinned tie-break)") {
    // the first PqCodes vectors ARE the codebook, so each of their
    // subvectors is at distance 0 from its own code; tie-break keeps the
    // lowest such code id, which for distinct seed subvectors is their own
    val out = ExtQueries.cosineTopkPq(spark, dir)
    assert(out.columns.toSeq == Seq("qid", "cid", "score", "rank"))
    // structural: 10 ranked candidates per query, ranks contiguous,
    // scores non-increasing
    val rows = out.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    byQ.foreach { case (qid, rs) =>
      val ranked = rs.sortBy(_.getInt(3))
      assert(ranked.map(_.getInt(3)).toSeq == (1 to 10), s"qid=$qid")
      val scores = ranked.map(_.getDouble(2))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b }, s"qid=$qid")
    }
  }

  test("recall@10 against the exact baseline clears the coarse-codebook floor") {
    val exact = ExtQueries.cosineTopk(spark, dir)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, ps) => q -> ps.map(_._2).toSet }
    val approx = ExtQueries.cosineTopkPq(spark, dir)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, ps) => q -> ps.map(_._2).toSet }
    val recalls = exact.keys.toSeq.sorted.map { q =>
      (exact(q) intersect approx.getOrElse(q, Set.empty)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.length
    info(f"PQ recall@10 per query: ${recalls.map(r => f"$r%.2f").mkString(", ")} (mean $mean%.2f)")
    // an 8-entry codebook over 16-dim subspaces is deliberately coarse;
    // the floor asserts the scores still carry signal, not that PQ is
    // a precise ranker at this codebook size
    assert(mean >= 0.2, f"mean recall $mean%.2f below floor")
  }
}
