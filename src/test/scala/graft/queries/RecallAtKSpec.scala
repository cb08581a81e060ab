package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_recall_at_k` — the reported (family, k) rows must be exactly the
  * truncated-list intersections of what the graded operators return. */
class RecallAtKSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-depth hit counts equal recomputed truncated-list intersections") {
    def ranked(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Int] =
      df.select("qid", "cid", "rank").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val ex = ranked(ExtQueries.cosineTopk(spark, dir))
    val fams = Map(
      "ivfpq" -> ranked(ExtQueries.cosineTopkIvfPq(spark, dir)),
      "ivfpqr" -> ranked(ExtQueries.ivfPqRerank(spark, dir)),
      "sq" -> ranked(ExtQueries.sqTopk(spark, dir)))
    spark.catalog.clearCache()

    val got = ExtQueries.recallAtK(spark, dir).collect()
    spark.catalog.clearCache()
    assert(got.length == fams.size * ExtQueries.RecallKs.size)
    got.foreach { r =>
      val (fam, k) = (r.getString(0), r.getInt(1))
      val truth = ex.filter(_._2 <= k).keySet
      val approx = fams(fam).filter(_._2 <= k).keySet
      assert(r.getLong(2) == truth.size.toLong, s"$fam@$k n_truth")
      assert(r.getLong(2) == 8L * k, s"$fam@$k truth is |queries|*k")
      assert(r.getLong(3) == (truth & approx).size.toLong, s"$fam@$k n_hit")
      assert(r.getDouble(4) ==
        (truth & approx).size.toDouble / truth.size.toDouble, s"$fam@$k recall")
    }
  }
}
