package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_table_stats` — the ANALYZE-style column profile. The pin is a
  * local recomputation over the collected table: exact row/null/NDV
  * counts per column and TYPED min/max (numeric order for numeric
  * columns, not lexicographic — the statistic a zone map actually
  * stores). */
class TableStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-column stats equal a local recomputation; min/max are typed") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
    val longs = Map(
      "doc_id" -> rows.map(_.getLong(0)),
      "n_chars" -> rows.map(_.getLong(4)))
    val strs = Map(
      "text" -> rows.map(_.getString(1)),
      "lang" -> rows.map(_.getString(2)),
      "source" -> rows.map(_.getString(3)))

    val got = ExtQueries.tableStats(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    spark.catalog.clearCache()
    assert(got.keySet == (longs.keySet ++ strs.keySet))
    for ((c, vs) <- longs) {
      val (n, nn, nd, mn, mx) = got(c)
      assert(n == rows.length.toLong && nn == 0L)
      assert(nd == vs.distinct.length.toLong, s"$c ndv")
      // typed min/max: numeric order, rendered as the number's string form
      assert(mn == vs.min.toString && mx == vs.max.toString, s"$c min/max")
    }
    for ((c, vs) <- strs) {
      val (n, nn, nd, mn, mx) = got(c)
      assert(n == rows.length.toLong && nn == 0L)
      assert(nd == vs.distinct.length.toLong, s"$c ndv")
      assert(mn == vs.min && mx == vs.max, s"$c min/max")
    }
    // the numeric column's min/max would differ under lexicographic order
    // on this fixture (doc_id spans magnitudes), so the typed pin is live
    val ids = longs("doc_id").map(_.toString)
    assert(ids.min != longs("doc_id").min.toString ||
      ids.max != longs("doc_id").max.toString,
      "fixture must distinguish typed from lexicographic order")
  }
}
