package graft.agg

import java.sql.{Date, Timestamp}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.schema.TrendingVideo

/** A3–A5/F4 semantics on controlled inputs: half-even mean rounding at exact
  * .xx5 boundaries, ratio guard, pinned mode tie-break. */
class DailyInsightsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val d = Date.valueOf("2025-10-06")
  private val ts = Timestamp.valueOf("2025-10-05 10:00:00")

  private def video(region: String, id: String, likes: Long, views: Long = 1L,
                    cat: String = "1"): TrendingVideo =
    TrendingVideo(id, d, cat, "c", 0L, likes, views, 60L, "t", ts, region)

  test("means round HALF-EVEN at exact .xx5 (Python round parity)") {
    import spark.implicits._
    // X: likes sum 1 over 8 rows = 0.125 -> 0.12 (down to even)
    // Y: likes sum 3 over 8 rows = 0.375 -> 0.38 (up to even)
    val vids = (
      video("X", "x1", 1L) +: (2 to 8).map(i => video("X", s"x$i", 0L))
    ) ++ (
      video("Y", "y1", 3L) +: (2 to 8).map(i => video("Y", s"y$i", 0L))
    )
    val out = DailyInsights.compute(vids.toDS()).collect()
      .map(i => i.region -> i).toMap
    assert(out("X").average_likes === 0.12)
    assert(out("Y").average_likes === 0.38)
  }

  test("mode tie breaks toward lowest category id") {
    import spark.implicits._
    val vids = Seq(
      video("R", "a", 1L, cat = "7"),
      video("R", "b", 1L, cat = "5"),
      video("R", "c", 1L, cat = "9"))
    val out = DailyInsights.compute(vids.toDS()).collect()(0)
    assert(out.top_category_id === 5L)
  }

  test("null/non-numeric categories count in metrics but get no mode vote") {
    import spark.implicits._
    // two uncategorizable videos + one real category: metrics include all
    // three rows, the mode ignores the nulls, nothing crashes the encoder
    val vids = Seq(
      video("N", "a", 4L, cat = null),
      video("N", "b", 2L, cat = "oops"),
      video("N", "c", 6L, cat = "9"))
    val out = DailyInsights.compute(vids.toDS()).collect()(0)
    assert(out.total_likes === 12L)
    assert(out.average_likes === 4.0)
    assert(out.top_category_id === 9L)
    // a region-day with NO categorized videos degrades to -1, not a crash
    val allNull = Seq(video("M", "x", 1L, cat = null), video("M", "y", 2L, cat = "n/a"))
    val out2 = DailyInsights.compute(allNull.toDS()).collect()(0)
    assert(out2.top_category_id === -1L)
    assert(out2.total_likes === 3L)
  }

  test("zero total views -> engagement ratio 0, averages still defined") {
    import spark.implicits._
    val vids = Seq(video("Z", "z1", 5L, views = 0L), video("Z", "z2", 3L, views = 0L))
    val out = DailyInsights.compute(vids.toDS()).collect()(0)
    assert(out.engagement_ratio === 0.0)
    assert(out.total_views === 0L)
    assert(out.average_likes === 4.0)
  }
}
