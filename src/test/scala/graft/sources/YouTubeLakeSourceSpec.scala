package graft.sources

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.ingest.{Flatten, Lake}
import graft.schema.Schemas

/** S1 stretch gate: the `graft-youtube` DataSourceV2 source — format
  * registration, per-day partition planning, skip-if-absent, and parity of
  * the from_json downstream parse with the Flatten path. */
class YouTubeLakeSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val regions = Seq("QA", "US")

  private def dayJson(vid: String, region2: String = "US"): String =
    s"""{"QA": {"kind": "youtube#videoListResponse", "items": [
       |  {"id": "$vid", "snippet": {"publishedAt": "2025-10-05T10:00:00Z",
       |   "channelId": "c1", "title": "t", "categoryId": "10"},
       |   "contentDetails": {"duration": "PT3M59S"},
       |   "statistics": {"viewCount": "100", "likeCount": "10", "commentCount": "5"}}]},
       | "$region2": {"kind": "youtube#videoListResponse", "items": [
       |  {"id": "${vid}b", "snippet": {"publishedAt": "2025-10-05T11:00:00Z",
       |   "channelId": "c2", "title": "u", "categoryId": "24"},
       |   "contentDetails": {"duration": "PT45S"},
       |   "statistics": {"viewCount": "50"}}]}}""".stripMargin

  test("registered format reads the lake: one partition per day, row per region") {
    val lake = Files.createTempDirectory("graft-dsv2-lake").toString
    Lake.writeRawDayText(spark, dayJson("v1"), lake, LocalDate.parse("2025-10-06"))
    Lake.writeRawDayText(spark, dayJson("w1"), lake, LocalDate.parse("2025-10-07"))

    val df = spark.read.format("graft-youtube").load(lake)
    assert(df.schema.fieldNames.toSeq === Seq("ingest_date", "region", "payload"))
    assert(df.rdd.getNumPartitions === 2) // one InputPartition per day file

    val rows = df.collect()
    assert(rows.length === 4) // 2 days x 2 regions present
    assert(rows.map(_.getAs[java.sql.Date]("ingest_date")).distinct.sorted ===
      Array(java.sql.Date.valueOf("2025-10-06"), java.sql.Date.valueOf("2025-10-07")))
    assert(rows.map(_.getAs[String]("region")).toSet === Set("QA", "US"))
  }

  test("from_json downstream parse matches the Flatten ingest path") {
    val lake = Files.createTempDirectory("graft-dsv2-parity").toString
    val runDate = LocalDate.parse("2025-10-06")
    Lake.writeRawDayText(spark, dayJson("v1"), lake, runDate)

    // source → declared-schema parse in Catalyst → items explode
    val viaSource = spark.read.format("graft-youtube").load(lake)
      .filter(col("ingest_date") === lit(java.sql.Date.valueOf(runDate)))
      .select(col("region"),
        from_json(col("payload"), Schemas.responseSchema).as("resp"))
      .select(col("region"), explode(col("resp.items")).as("v"))
      .select(col("region"), col("v.id").as("id"),
        col("v.statistics.viewCount").cast("long").as("views"))
      .orderBy("id").collect().toSeq

    val viaFlatten = Flatten
      .flatten(Lake.readRawDay(spark, lake, runDate, regions), regions, runDate)
      .toDF()
      .select(col("region"), col("id"), col("views_count").as("views"))
      .orderBy("id").collect().toSeq
    assert(viaSource === viaFlatten)
  }

  test("skip-if-absent: a region missing from the day object emits no row") {
    val lake = Files.createTempDirectory("graft-dsv2-absent").toString
    Lake.writeRawDayText(spark, dayJson("v1", region2 = "DE"), lake,
      LocalDate.parse("2025-10-06"))
    val regionsRead = spark.read.format("graft-youtube").load(lake)
      .select("region").collect().map(_.getString(0)).toSet
    assert(regionsRead === Set("QA", "DE")) // US never fetched that day
  }
}
