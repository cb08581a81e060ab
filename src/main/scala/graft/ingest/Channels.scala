package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.schema.{Channel, TrendingVideo}

/** J1 + S2: channel-dimension enrichment. The reference probes a Python set
  * per video row and calls the channels API per miss
  * (trending_daily_ingestion.py:135-138, 161-164) — row-at-a-time. Graft is
  * set-oriented: ONE broadcast hash anti-join finds all unseen channels for
  * the day, then one batched lookup (fixture-backed — the REST source is an
  * external side effect by design, SURVEY §2.1 S2) appends them. Same result
  * set, O(1) passes instead of O(rows) probes.
  */
object Channels {

  /** Channel ids present in today's videos but absent from the dimension —
    * the broadcast anti-join form of the reference's set probe. The videos
    * side is deduplicated BEFORE the join so the join input is ≤ |channels
    * on trend today| (≤ 60·regions in the reference workload), then the
    * known-ids dim broadcasts. */
  def newChannelIds(videos: Dataset[TrendingVideo], knownIds: DataFrame): DataFrame =
    videos.select(col("channel_id").as("id")).distinct()
      .join(broadcast(knownIds.select(col("id"))), Seq("id"), "left_anti")

  /** Map channel-API-shaped rows ([[graft.schema.Schemas.channelResponseSchema]])
    * to curated [[Channel]] rows with the reference's `.get(…, default)`
    * coalescing — including its literal "Unkown" [sic] country default
    * (trending_daily_ingestion.py:99-107). */
  def mkChannels(channelApi: DataFrame): Dataset[Channel] = {
    val spark = channelApi.sparkSession
    import spark.implicits._
    channelApi.select(
        col("id"),
        col("snippet.title").as("channel_name"),
        coalesce(col("snippet.country"), lit("Unkown")).as("country"),
        to_timestamp(regexp_replace(col("snippet.publishedAt"), "Z$", "")).as("creation_date"),
        coalesce(col("status.madeForKids"), lit(false)).as("made_for_kids"),
        coalesce(col("statistics.subscriberCount").cast("long"), lit(0L)).as("subscribers_count"),
        coalesce(col("statistics.viewCount").cast("long"), lit(0L)).as("views_count"),
        coalesce(col("statistics.videoCount").cast("long"), lit(0L)).as("videos_count"),
        coalesce(col("brandingSettings.keywords"), lit("")).as("keywords"))
      .as[Channel]
  }

  /** J3 (declared capability): enrich videos with channel attributes via a
    * broadcast left join — the analysis the reference fetches channels FOR
    * but never executes (README.md:63-64). */
  def enrich(videos: Dataset[TrendingVideo], channels: Dataset[Channel]): DataFrame =
    videos.join(
      broadcast(channels.toDF()).withColumnRenamed("id", "channel_id")
        .withColumnRenamed("views_count", "channel_views_count"),
      Seq("channel_id"), "left")
}
