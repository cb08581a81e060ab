package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_ann_filter` — filtered vector search: pre-filter exact truth vs
  * post-filter-of-shortlist annotation. Replays the brute force
  * sequentially (same fold order, bitwise scores) and pins the
  * annotation's definition: `in_postfilter` = the truth row is among the
  * first k predicate-matching rows of the unfiltered top-R. */
class AnnFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("filtered truth and post-filter annotation equal the brute-force replay") {
    val rows = RefQueries.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))

    def norm(v: Array[Float]): Double =
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)

    val queries = rows.filter(_._1 < 8)
    val k = ExtQueries.AnnFilterK
    val want = queries.flatMap { case (qid, qe, ql) =>
      val tgt = (ql + 1) % ExtQueries.AnnFilterLabels
      val nq = norm(qe)
      val scored = rows.filter(_._1 != qid).map { case (cid, ce, cl) =>
        (cid, cl, dot(qe, ce) / (nq * norm(ce)))
      }
      val truth = scored.filter(_._2 == tgt)
        .sortBy { case (cid, _, s) => (-s, cid) }.take(k)
      val short = scored.sortBy { case (cid, _, s) => (-s, cid) }
        .take(ExtQueries.AnnFilterShortlistR)
      val postf = short.filter(_._2 == tgt).take(k).map(_._1).toSet
      truth.zipWithIndex.map { case ((cid, _, s), i) =>
        (qid, i + 1) -> ((cid, s, if (postf(cid)) 1L else 0L))
      }
    }.toMap

    val got = ExtQueries.annFilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    spark.catalog.clearCache()

    assert(got == want, "filtered search must equal the brute-force replay")
    assert(got.nonEmpty)
    // every query emits exactly k truth rows (fixture has ≥ k per class)
    got.keySet.groupBy(_._1).foreach { case (_, ks) =>
      assert(ks.size == k)
    }
    // the annotation is non-trivial on the fixture: post-filtering at R
    // loses at least one truth hit somewhere (the reason pre-filter wins)
    assert(got.values.exists(_._3 == 0L),
      "fixture should exhibit a post-filter miss")
    assert(got.values.exists(_._3 == 1L),
      "fixture should exhibit a post-filter hit")
  }
}
