package graft.agg

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.schema.{DailyInsight, TrendingVideo}

/** A3–A6 + W1 + F4–F5: the daily per-region insight aggregate (reference:
  * dags/trending_daily_aggregates.py:52-93). The reference's per-region
  * Python loop (`:62`) becomes ONE hash aggregate plus one ranking window
  * over already-aggregated counts — partial/final split and map-side combine
  * for free, and region count never bounds parallelism.
  *
  * Semantics pinned to the reference:
  *   - means rounded 2-dp HALF-EVEN (Python `round(mean, 2)`, :69,72,75) —
  *     rounded while still exact decimal (see RefQueries.dailyAggRounded for
  *     why rounding the double diverges);
  *   - engagement ratio UNROUNDED, 0 when total_views = 0 (:79-84);
  *   - top category = mode of `category_id` cast to long (:87-88), ties →
  *     LOWEST id (pandas' tie order is insertion-dependent; SURVEY §7.6 #2).
  */
object DailyInsights {

  /** 2-dp half-even mean: exact decimal sum / count, bround while decimal. */
  private def avg2(c: Column): Column =
    bround(sum(c.cast("decimal(28,6)")) / count(lit(1)), 2).cast("double")

  def compute(videos: Dataset[TrendingVideo]): Dataset[DailyInsight] = {
    val spark = videos.sparkSession
    import spark.implicits._

    val metrics = videos.toDF()
      .groupBy(col("region"), col("date"))
      .agg(
        sum(col("views_count")).as("total_views"),
        avg2(col("views_count")).as("average_views"),
        max(col("views_count")).as("highest_views"),
        sum(col("likes_count")).as("total_likes"),
        avg2(col("likes_count")).as("average_likes"),
        max(col("likes_count")).as("highest_likes"),
        sum(col("comments_count")).as("total_comments"),
        avg2(col("comments_count")).as("average_comments"),
        max(col("comments_count")).as("highest_comments"))
      .withColumn("engagement_ratio",
        when(col("total_views") > 0,
          (col("total_likes") + lit(2) * col("total_comments"))
            .cast("double") / col("total_views") * lit(1000))
          .otherwise(lit(0.0)))

    // Mode of category per (region, date): heavy groupBy is on the full key
    // (partial-aggregatable); the window only ranks the tiny count frame.
    val w = Window.partitionBy(col("region"), col("date"))
      .orderBy(col("cnt").desc, col("cat").asc)
    val topCat = videos.toDF()
      .groupBy(col("region"), col("date"), col("category_id").cast("long").as("cat"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("region"), col("date"), col("cat").as("top_category_id"))

    metrics.join(topCat, Seq("region", "date"))
      .select(
        col("region"), col("date"),
        col("total_views"), col("average_views"), col("highest_views"),
        col("total_likes"), col("average_likes"), col("highest_likes"),
        col("total_comments"), col("average_comments"), col("highest_comments"),
        col("engagement_ratio"), col("top_category_id"))
      .as[DailyInsight]
  }
}
