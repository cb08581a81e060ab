package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_ann_recall` against overlap counts recomputed directly from the four
  * collected rank lists — the evaluation must report exactly the set
  * intersections of what the family operators actually return. */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-family hit counts equal the recomputed rank-list intersections") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex = pairs(ExtQueries.cosineTopk(spark, dir))
    val fams = Map(
      "n_lsh" -> pairs(ExtQueries.cosineTopkLsh(spark, dir)),
      "n_ivf" -> pairs(ExtQueries.cosineTopkIvf(spark, dir)),
      "n_pq" -> pairs(ExtQueries.cosineTopkPq(spark, dir)))
    val got = ExtQueries.annRecall(spark, dir).collect()
    spark.catalog.clearCache() // the family pipelines persist intermediates
    assert(got.length == 8)
    got.foreach { r =>
      val qid = r.getLong(0)
      assert(r.getLong(1) == 10, s"qid $qid: exact baseline must be full k")
      for ((colName, fam) <- fams) {
        val want = ex.count { case (q, c) => q == qid && fam.contains((q, c)) }
        assert(r.getAs[Long](colName) == want.toLong, s"qid $qid $colName")
        assert(r.getAs[Double]("recall" + colName.stripPrefix("n")) ==
          want.toDouble / 10.0, s"qid $qid recall for $colName")
      }
    }
  }
}
