package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_count_min` — the sketch must replay exactly from the token stream
  * (same salted md5 buckets, same cell sums, min-over-rows estimate), the
  * estimate must obey the one-sided CMS guarantee (never under the true
  * count), and the sketch state must stay inside the d×w grid no matter
  * the vocabulary. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def h64(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("estimates replay the d-row min over exact cell counts and never undercount") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.flatMap(_._2.trim.split("\\s+"))
    // sequential sketch replay: cell (r, b) += 1 per token occurrence
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (t <- toks; r <- 0 until ExtQueries.CmDepth) {
      val b = h64(s"cm$r:$t") % ExtQueries.CmWidth
      cells((r, b)) = cells.getOrElse((r, b), 0L) + 1L
    }
    val probe = docs.filter(_._1 < ExtQueries.CmProbeDocs)
      .flatMap(_._2.trim.split("\\s+")).distinct
    val exact = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = probe.map { t =>
      val est = (0 until ExtQueries.CmDepth)
        .map(r => cells((r, h64(s"cm$r:$t") % ExtQueries.CmWidth))).min
      t -> (exact(t), est)
    }.toMap

    val got = ExtQueries.countMin(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map { case (t, (ex, est, _)) => t -> (ex, est) }.toMap == want)
    assert(got.map(_._1).toSet == probe.toSet)
    for ((t, (ex, est, over)) <- got) {
      assert(est >= ex, s"CMS undercounted '$t': est $est < exact $ex")
      assert(over == est - ex)
    }
    // the sketch's reducer state is the grid, never the vocabulary
    assert(cells.size <= ExtQueries.CmDepth * ExtQueries.CmWidth)
  }
}
