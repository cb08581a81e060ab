package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_rank_metrics` — MRR@10 / NDCG@10 harness. Recomputes both metrics
  * sequentially from the collected rank lists under the exact-rational
  * definitions (scale 2520 = lcm(1..10), reciprocal-rank discount) and
  * pins the scale constants themselves, so a drifted literal cannot
  * silently re-weight the metric. */
class RankMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("scale constants: 2520 is divisible by every rank; idcg numerator is their sum") {
    (1 to 10).foreach(r => assert(ExtQueries.RankMetricScale % r == 0,
      s"scale must make 1/$r exact"))
    assert((1 to 10).map(ExtQueries.RankMetricScale / _).sum ==
      ExtQueries.RankMetricIdcgNum)
  }

  test("metric rows equal the sequential recomputation from the collected lists") {
    def ranked(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Int)]] = {
      val m = df.select("qid", "cid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
      spark.catalog.clearCache()
      m
    }
    val truth = ranked(ExtQueries.cosineTopk(spark, dir)).view
      .mapValues(_.map(_._1).toSet).toMap
    val fams = Map(
      "ivfpq" -> ranked(ExtQueries.cosineTopkIvfPq(spark, dir)),
      "ivfpqr" -> ranked(ExtQueries.ivfPqRerank(spark, dir)),
      "sq" -> ranked(ExtQueries.sqTopk(spark, dir)),
      "sqr" -> ranked(ExtQueries.sqRerank(spark, dir)))
    val scale = ExtQueries.RankMetricScale
    val want = fams.map { case (tag, lists) =>
      val perQ = truth.keys.toSeq.map { qid =>
        val hits = lists.getOrElse(qid, Nil)
          .filter { case (cid, _) => truth(qid)(cid) }
        val rr = if (hits.isEmpty) 0L else scale / hits.map(_._2).min
        val dcg = hits.map { case (_, r) => scale / r }.sum
        (rr, dcg)
      }
      val nQ = truth.size.toLong
      val rrNum = perQ.map(_._1).sum
      val dcgNum = perQ.map(_._2).sum
      tag -> ((nQ, rrNum, rrNum.toDouble / (nQ * scale).toDouble,
        dcgNum, dcgNum.toDouble / (nQ * ExtQueries.RankMetricIdcgNum).toDouble))
    }

    val got = ExtQueries.rankMetrics(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))).toMap
    spark.catalog.clearCache()

    assert(got == want, "metric rows must equal the sequential recomputation")
    assert(got.keySet == fams.keySet)
    got.values.foreach { case (nQ, _, mrr, _, ndcg) =>
      assert(nQ == 8L)
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
    }
    // the metrics must rank-discriminate on this fixture: at least one
    // family is imperfect (else the harness grades nothing) and at least
    // one has a hit (else the lists are broken)
    assert(got.values.exists(_._5 < 1.0), "some family must lose ranking mass")
    assert(got.values.exists(_._3 > 0.0), "some family must place a hit")
  }
}
