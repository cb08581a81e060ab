package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_sq_topk` / `e_sq_rerank` — the SQ8 compressed-scan serving pair.
  * Pins the three properties that make coarse→refine serving trustworthy:
  * the integer scoring matches a sequential driver-side replay of the
  * quantizer, the refine stage can only improve recall (never lose a truth
  * hit the shortlist caught), and every score the refine stage emits is the
  * EXACT full-precision cosine (bit-identical to `e_cosine_topk`'s). */
class SqServeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairsByQ(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("sq scores equal a sequential int8-quantize-then-cosine replay") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def codes(v: Array[Float]): Array[Long] = {
      val s = v.map(x => math.abs(x.toDouble)).max / 127.0
      v.map(x => math.floor(x.toDouble / s + 0.5).toLong)
    }
    val coded = emb.view.mapValues(codes).toMap
    def sqScore(q: Long, c: Long): Double = {
      val (qc, cc) = (coded(q), coded(c))
      var d = 0L; var nq = 0L; var nc = 0L
      for (i <- qc.indices) { d += qc(i) * cc(i); nq += qc(i) * qc(i); nc += cc(i) * cc(i) }
      d.toDouble / (math.sqrt(nq.toDouble) * math.sqrt(nc.toDouble))
    }
    val got = ExtQueries.sqTopk(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getDouble(2) == sqScore(r.getLong(0), r.getLong(1)),
        s"qid ${r.getLong(0)} cid ${r.getLong(1)}: operator score must equal replay")
    }
  }

  test("refine guarantee: rerank hits >= plain-sq hits per query vs exact truth") {
    val truth = pairsByQ(ExtQueries.cosineTopk(spark, dir))
    val sq = pairsByQ(ExtQueries.sqTopk(spark, dir))
    val sqr = pairsByQ(ExtQueries.sqRerank(spark, dir))
    assert(truth.keySet == sqr.keySet)
    truth.foreach { case (qid, t) =>
      val hSq = (t & sq.getOrElse(qid, Set.empty)).size
      val hSqr = (t & sqr.getOrElse(qid, Set.empty)).size
      assert(hSqr >= hSq,
        s"qid $qid: exact refine of a superset shortlist cannot lose hits ($hSqr < $hSq)")
    }
  }

  test("rerank emits exact full-precision scores (bit-identical to e_cosine_topk)") {
    val exact = ExtQueries.cosineTopk(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val rr = ExtQueries.sqRerank(spark, dir).collect()
    val overlap = rr.filter(r => exact.contains((r.getLong(0), r.getLong(1))))
    assert(overlap.nonEmpty, "some rerank rows must overlap the exact top-k")
    overlap.foreach { r =>
      assert(r.getDouble(2) == exact((r.getLong(0), r.getLong(1))),
        s"(${r.getLong(0)}, ${r.getLong(1)}): refine score must be the exact cosine, bitwise")
    }
  }

  test("plan: corpus side never sort-merge-joins; refine joins are broadcasts") {
    val plan = ExtQueries.sqRerank(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"),
      "shortlist and query sides must broadcast onto the corpus scan:\n" + plan.take(800))
  }
}
