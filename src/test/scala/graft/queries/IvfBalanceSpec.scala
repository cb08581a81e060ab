package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_ivf_balance` — quantizer-health cell audit. Replays the assignment
  * sequentially and pins the report's identities: member counts sum to
  * the corpus, shares to 1, balance factors average 1, and the dominant
  * label matches the replay under the (count, label)-max tie-break. */
class IvfBalanceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def norm(v: Array[Float]): Double =
    math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)

  test("audit equals the sequential assignment replay; identities hold") {
    val rows = RefQueries.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val nCells = ExtQueries.IvfCells
    val cents = rows.filter(_._1 < nCells).map { case (id, e, _) => (id, e, norm(e)) }
    val assigned = rows.map { case (id, e, l) =>
      val nrm = norm(e)
      val cell = cents.map { case (cid, ce, nc) => (cid, dot(e, ce) / (nrm * nc)) }
        .sortBy { case (cid, s) => (-s, cid) }.head._1
      (id, l, cell)
    }
    val n = rows.length.toLong
    val want = assigned.groupBy(_._3).map { case (cell, members) =>
      val byLabel = members.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val (topLabel, topN) = byLabel.toSeq.maxBy { case (l, m) => (m, l) }
      cell -> ((members.length.toLong,
        members.length.toDouble / n.toDouble,
        members.length.toLong * nCells.toLong / n.toDouble,
        topLabel, topN))
    }

    val got = ExtQueries.ivfBalance(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getInt(4), r.getLong(5)))).toMap
    spark.catalog.clearCache()

    assert(got.keySet == want.keySet, "every non-empty cell appears")
    got.foreach { case (cell, (nv, share, bal, topL, topN)) =>
      val (wNv, wShare, wBal, wTopL, wTopN) = want(cell)
      assert(nv == wNv, s"cell $cell count")
      assert(share == wShare, s"cell $cell share")
      assert(bal == (nv * nCells).toDouble / n.toDouble && bal == wBal,
        s"cell $cell balance factor")
      assert(topL == wTopL && topN == wTopN, s"cell $cell dominant label")
    }
    assert(got.values.map(_._1).sum == n, "cells partition the corpus")
    // the audit must be non-trivial on the fixture: some imbalance exists
    assert(got.values.map(_._3).max > 1.0 || got.size < nCells,
      "fixture must show measurable imbalance")
  }
}
