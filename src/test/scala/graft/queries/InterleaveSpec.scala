package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_interleave` — balanced interleaving of the sparse (BM25) and dense
  * (exact cosine) rankers. Checked against a driver-side replay of the
  * min-position rule over the two source lists, plus the structural
  * guarantees interleaving exists to provide. */
class InterleaveSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def sourceLists: (Map[(Long, Long), Long], Map[(Long, Long), Long]) = {
    val sparse = ExtQueries.bm25Topk(spark, dir).collect()
      .map(r => ((r.getInt(0).toLong, r.getLong(1)), r.getInt(3).toLong)).toMap
    val dense = ExtQueries.cosineTopk(spark, dir)
      .filter(col("qid") < ExtQueries.Bm25Queries.size).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(3).toLong)).toMap
    (sparse, dense)
  }

  test("interleave equals the min-position replay, team credit included") {
    val (sparse, dense) = sourceLists
    val want = (sparse.keys ++ dense.keys).map(_._1).toSeq.distinct.sorted.flatMap { qid =>
      val occ = sparse.collect { case ((q, c), r) if q == qid => (c, 2 * r - 1) } ++
        dense.collect { case ((q, c), r) if q == qid => (c, 2 * r) }
      occ.groupBy(_._1).map { case (c, os) => (c, os.map(_._2).min) }
        .toSeq.sortBy(_._2).take(ExtQueries.InterleaveK).zipWithIndex
        .map { case ((c, pos), i) =>
          (qid, i + 1, c, if (pos % 2 == 1) "sparse" else "dense")
        }
    }
    val got = ExtQueries.interleave(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == want)
  }

  test("blend preserves each ranker's internal order; sparse top-1 leads") {
    val (sparse, dense) = sourceLists
    val got = ExtQueries.interleave(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val ordered = rows.sortBy(_._2).toSeq
      // pos 1 is globally minimal, so the sparse #1 doc always leads
      assert(ordered.head._4 == "sparse" &&
        sparse((qid, ordered.head._3)) == 1L, s"qid=$qid")
      // docs credited to the same team appear in that team's own rank order
      for (team <- Seq("sparse", "dense")) {
        val src = if (team == "sparse") sparse else dense
        val ranks = ordered.filter(_._4 == team).map(t => src((qid, t._3)))
        assert(ranks == ranks.sorted, s"qid=$qid team=$team")
      }
      // exactly K rows and no duplicate documents
      assert(ordered.length == ExtQueries.InterleaveK, s"qid=$qid")
      assert(ordered.map(_._3).distinct.length == ordered.length, s"qid=$qid")
    }
  }
}
