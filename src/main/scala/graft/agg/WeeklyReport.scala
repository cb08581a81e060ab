package graft.agg

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.util.Locale
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions.avg2
import graft.schema.{DailyInsight, ReportRow}

/** P5 + J2 + A7 + F6 + S7: the weekly report (reference:
  * dags/weekly_report.py:23-79). Per region over the trailing 7 days:
  * the modal `top_category_id`, then sums and mean RESTRICTED to the days
  * that category won — the reference's two nested loops become one ranking
  * window plus one conditionally-filtered aggregate. Only the final
  * ≤|regions|-row frame is collected for the HTML render (S7 is a driver-side
  * sink by design).
  */
object WeeklyReport {

  /** The report rows for the week ending `endDate` (inclusive, 7 days —
    * start = end − 6, reference :24-27). */
  def compute(insights: Dataset[DailyInsight], endDate: LocalDate): DataFrame = {
    val end = lit(java.sql.Date.valueOf(endDate))
    val week = insights.toDF()
      .filter(col("date").between(date_sub(end, 6), end))

    // weekly winner per region: mode of the daily winners, ties → lowest id
    val w = Window.partitionBy(col("region"))
      .orderBy(col("cnt").desc, col("top_category_id").asc)
    val wins = week.groupBy(col("region"), col("top_category_id"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("region"), col("top_category_id").as("top_category"))

    // conditional aggregates over ONLY the winning category's days (A7) —
    // the semi-join filter form; `wins` is ≤|regions| rows, broadcast.
    week.join(broadcast(wins), Seq("region"))
      .filter(col("top_category_id") === col("top_category"))
      .groupBy(col("region"), col("top_category"))
      .agg(
        format_number(sum(col("total_views")), 0).as("total_views_for_top_category"),
        format_number(sum(col("total_likes")), 0).as("total_likes_for_top_category"),
        avg2(col("engagement_ratio")).as("average_engagement_ratio"))
      .orderBy("region")
  }

  def computeRows(insights: Dataset[DailyInsight], endDate: LocalDate): Seq[ReportRow] = {
    val spark = insights.sparkSession
    import spark.implicits._
    compute(insights, endDate).as[ReportRow].collect().toSeq
  }

  /** The e-mail subject: "Weekly Insights - dd MMM yyyy" (reference :96). */
  def subject(endDate: LocalDate): String =
    "Weekly Insights - " + endDate.format(
      DateTimeFormatter.ofPattern("dd MMM yyyy", Locale.ENGLISH))

  /** Driver-side HTML render of the collected rows (reference :52-79). The
    * table shape matches the reference's e-mail: one row per region with the
    * winning category and its formatted totals. */
  def renderHtml(rows: Seq[ReportRow], recipient: String = "Mr. Alex"): String = {
    val sb = new StringBuilder
    sb ++= s"<h3>Dear $recipient</h3>\n"
    sb ++= "<p>I hope this email finds you well. The following are the weekly insights for the past week:</p>\n"
    sb ++= "<table border='1' cellpadding='5' cellspacing='0' style='border-collapse: collapse;'>\n"
    sb ++= "<tr><th>Region</th><th>Top Category</th><th>Total Views</th><th>Total Likes</th><th>Avg Engagement Ratio</th></tr>\n"
    rows.foreach { r =>
      sb ++= s"<tr><td>${r.region}</td><td>${r.top_category}</td>" +
        s"<td>${r.total_views_for_top_category}</td>" +
        s"<td>${r.total_likes_for_top_category}</td>" +
        s"<td>${r.average_engagement_ratio}</td></tr>\n"
    }
    sb ++= "</table>\n<p>Best Regards</p>"
    sb.result()
  }
}
