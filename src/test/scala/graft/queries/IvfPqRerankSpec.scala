package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_ivfpq_rerank` — the IVF-PQ + exact-refine composite (the FAISS
  * `IndexIVFPQ` + `IndexRefineFlat` operating point). Pins the refine
  * discipline's three properties over the composite index's shortlist:
  * the shortlist IS the ADC serve at depth R (coarse and refined stages
  * share one scoring body), the refine stage can only improve recall
  * (never lose a truth hit the shortlist caught), and every refined score
  * is the EXACT full-precision cosine. */
class IvfPqRerankSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairsByQ(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
    val m = df.select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    spark.catalog.clearCache() // the ADC serve persists the residual frame
    m
  }

  test("refined output is the exact-cosine top-10 of the ADC shortlist") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(q: Long, c: Long): Double = {
      val (a, b) = (emb(q), emb(c))
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // the shortlist via the SAME body the composite serves from — depth R
    // instead of 10 is the only difference (cosineTopkIvfPq is the k = 10
    // cut of the identical ADC ranking, so its rows must prefix-match)
    val serve = ExtQueries.cosineTopkIvfPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val got = ExtQueries.ivfPqRerank(spark, dir).collect()
    spark.catalog.clearCache()
    assert(got.nonEmpty)
    // exact scores, bitwise: the sequential dot/norm replay IS the fold
    // contract on this fixture
    got.foreach { r =>
      assert(r.getDouble(2) == cos(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)}): refined score must be exact cosine")
    }
    // per query: ranks are 1..n under (score DESC, cid ASC)
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to rows.length),
        s"qid $qid: contiguous ranks")
      val resorted = rows.map(r => (r.getLong(1), r.getDouble(2)))
        .sortBy { case (c, s) => (-s, c) }.map(_._1).toSeq
      assert(sorted.map(_.getLong(1)).toSeq == resorted,
        s"qid $qid: refined order must be the exact-score total order")
    }
    // shortlist ⊇ the depth-10 serve: anything the plain composite returns
    // was available to the refine stage
    val rerankByQ = got.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(serve.groupBy(_._1).forall { case (q, rows) => rows.nonEmpty },
      "serve must be non-empty")
    assert(rerankByQ.keySet == serve.map(_._1),
      "refined list covers exactly the served queries")
  }

  test("refine guarantee: rerank hits >= plain-ivfpq hits per query vs exact truth") {
    val truth = pairsByQ(ExtQueries.cosineTopk(spark, dir))
    val ivfpq = pairsByQ(ExtQueries.cosineTopkIvfPq(spark, dir))
    val rr = pairsByQ(ExtQueries.ivfPqRerank(spark, dir))
    assert(truth.keySet == rr.keySet)
    truth.foreach { case (qid, t) =>
      val hPq = (t & ivfpq.getOrElse(qid, Set.empty)).size
      val hRr = (t & rr.getOrElse(qid, Set.empty)).size
      assert(hRr >= hPq,
        s"qid $qid: exact refine of a superset shortlist cannot lose hits ($hRr < $hPq)")
    }
  }

  test("plan: refine joins are broadcasts; corpus never sort-merge-joins") {
    val plan = ExtQueries.ivfPqRerank(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    spark.catalog.clearCache()
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"),
      "shortlist and query sides must broadcast onto the corpus scan:\n" + plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }
}
