package graft.agg

import java.sql.Date
import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.schema.DailyInsight

/** J2/A7/F6 weekly-report semantics: weekly winner mode, conditional
  * aggregates restricted to the winning category, thousands formatting,
  * 2-dp half-even ratio mean, HTML render. */
class WeeklyReportSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val end = LocalDate.parse("2025-10-06")

  private def insight(region: String, day: Int, cat: Long, views: Long,
                      likes: Long, ratio: Double): DailyInsight =
    DailyInsight(region, Date.valueOf(end.minusDays(6 - day)), views, 0.0, views,
      likes, 0.0, likes, 0L, 0.0, 0L, ratio, cat)

  test("weekly winner, conditional sums, formatting, half-even ratio mean") {
    import spark.implicits._
    // QA: category 24 wins 4 of 7 days; its days have ratios averaging 0.025
    val qa = Seq(
      insight("QA", 0, 10L, 500L,      5L, 9.9),
      insight("QA", 1, 10L, 500L,      5L, 9.9),
      insight("QA", 2, 24L, 1000000L, 10L, 0.01),
      insight("QA", 3, 24L, 1000000L, 10L, 0.02),
      insight("QA", 4, 24L, 1000000L, 10L, 0.02),
      insight("QA", 5, 24L, 1000000L, 10L, 0.05),
      insight("QA", 6, 10L, 500L,      5L, 9.9))
    // US: single category all week
    val us = (0 to 6).map(i => insight("US", i, 7L, 100L, 1L, 2.0))
    val rows = WeeklyReport.computeRows((qa ++ us).toDS(), end)
    val byRegion = rows.map(r => r.region -> r).toMap

    assert(byRegion("QA").top_category === 24L)
    assert(byRegion("QA").total_views_for_top_category === "4,000,000")
    assert(byRegion("QA").total_likes_for_top_category === "40")
    // mean(0.01, 0.02, 0.02, 0.05) = 0.025 -> half-even 2dp -> 0.02
    assert(byRegion("QA").average_engagement_ratio === 0.02)
    assert(byRegion("US").top_category === 7L)
    assert(byRegion("US").total_views_for_top_category === "700")
    assert(byRegion("US").average_engagement_ratio === 2.0)

    val html = WeeklyReport.renderHtml(rows)
    assert(html.contains("<table"))
    assert(html.contains("<td>QA</td>"))
    assert(html.contains("<td>4,000,000</td>"))
    assert(WeeklyReport.subject(end) === "Weekly Insights - 06 Oct 2025")
  }

  test("rows outside the 7-day window are excluded (inclusive BETWEEN)") {
    import spark.implicits._
    val in = insight("R", 0, 1L, 10L, 1L, 1.0)                 // end - 6: included
    val out = DailyInsight("R", Date.valueOf(end.minusDays(7)), 999L, 0.0, 999L,
      999L, 0.0, 999L, 0L, 0.0, 0L, 9.0, 2L)                   // end - 7: excluded
    val rows = WeeklyReport.computeRows(Seq(in, out).toDS(), end)
    assert(rows.size === 1)
    assert(rows.head.top_category === 1L)
    assert(rows.head.total_views_for_top_category === "10")
  }
}
