package graft.schema

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.types._

/** Declared schemas for the YouTube-trending data model — the single biggest
  * semantic hardening vs the reference, which has no DDL anywhere and relies
  * on pandas→BigQuery autodetection (reference:
  * dags/trending_daily_ingestion.py:194-197). Graft declares the nested raw
  * shape explicitly (schema-on-read, FIXTURES.md A1) so a missing
  * `statistics.likeCount` yields null → coalesce → 0 exactly like the
  * reference's `.get(key, 0)`, and fixes the three curated tables as case
  * classes (schema-on-write).
  */
object Schemas {

  /** One video item of a `videoListResponse` (shape documented from the
    * reference's captured day, assets/2025-10-06.json:6-83). Only the fields
    * the pipeline reads are declared — schema-on-read projection drops the
    * rest at the parser, which at 100 TB is the column-pruning win. */
  val videoSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("etag", StringType),
    StructField("id", StringType),
    StructField("snippet", StructType(Seq(
      StructField("publishedAt", StringType),
      StructField("channelId", StringType),
      StructField("title", StringType),
      StructField("description", StringType),
      StructField("thumbnails", MapType(StringType, StructType(Seq(
        StructField("url", StringType),
        StructField("width", IntegerType),
        StructField("height", IntegerType))))),
      StructField("channelTitle", StringType),
      StructField("tags", ArrayType(StringType)),          // optional per item
      StructField("categoryId", StringType),               // numeric-as-string
      StructField("liveBroadcastContent", StringType)))),
    StructField("contentDetails", StructType(Seq(
      StructField("duration", StringType),                 // ISO-8601, e.g. PT3M59S
      StructField("dimension", StringType),
      StructField("definition", StringType),
      StructField("caption", StringType),
      StructField("licensedContent", BooleanType),
      StructField("regionRestriction", StructType(Seq(     // optional per item
        StructField("blocked", ArrayType(StringType)))))))),
    StructField("statistics", StructType(Seq(              // counts are STRINGS
      StructField("viewCount", StringType),
      StructField("likeCount", StringType),                // optional per item
      StructField("favoriteCount", StringType),
      StructField("commentCount", StringType))))))         // optional per item

  /** One region's `videoListResponse` (assets/2025-10-06.json:3-5,5332-5334). */
  val responseSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("etag", StringType),
    StructField("nextPageToken", StringType),
    StructField("pageInfo", StructType(Seq(
      StructField("totalResults", IntegerType),
      StructField("resultsPerPage", IntegerType)))),
    StructField("items", ArrayType(videoSchema))))

  /** The day file: one JSON object keyed by region code — the key set is the
    * job's region parameter, so the schema is built per run. A region in the
    * params but absent from the file reads as null (skip-if-absent, reference
    * trending_daily_ingestion.py:155). */
  def rawDaySchema(regions: Seq[String]): StructType =
    StructType(regions.map(r => StructField(r, responseSchema, nullable = true)))

  /** Channel-API response shape (channels().list, reference
    * trending_daily_ingestion.py:96-107) — fixture-backed in graft (S2 is an
    * external REST source by design). */
  val channelResponseSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("snippet", StructType(Seq(
      StructField("title", StringType),
      StructField("country", StringType),                  // optional
      StructField("publishedAt", StringType)))),
    StructField("status", StructType(Seq(
      StructField("madeForKids", BooleanType)))),          // optional
    StructField("statistics", StructType(Seq(
      StructField("subscriberCount", StringType),          // optional, numeric-as-string
      StructField("viewCount", StringType),
      StructField("videoCount", StringType)))),
    StructField("brandingSettings", StructType(Seq(
      StructField("keywords", StringType))))))             // optional
}

/** `daily_trending_videos` row (reference trending_daily_ingestion.py:166-176). */
case class TrendingVideo(
    id: String,
    date: Date,
    category_id: String,   // kept as string; cast to long only downstream (reference :168 vs aggregates :87)
    channel_id: String,
    comments_count: Long,
    likes_count: Long,
    views_count: Long,
    duration: Long,        // seconds
    title: String,
    publish_date: Timestamp, // naive-UTC (Z stripped)
    region: String)

/** `channels` row (reference trending_daily_ingestion.py:99-107). */
case class Channel(
    id: String,
    channel_name: String,
    country: String,       // default "Unkown" [sic] — reference :101
    creation_date: Timestamp,
    made_for_kids: Boolean,
    subscribers_count: Long,
    views_count: Long,
    videos_count: Long,
    keywords: String)

/** `daily_insights` row (reference trending_daily_aggregates.py:65-88). */
case class DailyInsight(
    region: String,
    date: Date,
    total_views: Long,
    average_views: Double,   // 2-dp half-even
    highest_views: Long,
    total_likes: Long,
    average_likes: Double,
    highest_likes: Long,
    total_comments: Long,
    average_comments: Double,
    highest_comments: Long,
    engagement_ratio: Double, // (ΣL + 2ΣC)/ΣV × 1000, 0 when ΣV = 0 — unrounded
    top_category_id: Long)    // mode; ties → lowest id (pinned, SURVEY §7.6 #2)

/** One region's weekly-report row (reference weekly_report.py:35-44). */
case class ReportRow(
    region: String,
    top_category: Long,
    total_views_for_top_category: String,  // "{:,}"-formatted
    total_likes_for_top_category: String,
    average_engagement_ratio: Double)      // 2-dp half-even
