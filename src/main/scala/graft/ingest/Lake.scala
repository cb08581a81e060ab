package graft.ingest

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3: the date-keyed raw JSON lake — the reference uploads each day's raw
  * API payload to `{raw_bucket}/{prefix}/{YYYY-MM-DD}.json` BEFORE any
  * flattening (dags/trending_daily_ingestion.py:83-91), so the lake is the
  * replayable source of truth. Graft's equivalent is a `date=YYYY-MM-DD`
  * directory per day under the lake root (the Spark-native layout: readers
  * partition-prune on the path, and a day is one atomic overwrite).
  *
  * Two write forms:
  *   - [[writeRawDayText]]: the payload EXACTLY as fetched (a driver-side
  *     string from the REST source, like the reference's `json.dumps`
  *     upload) — byte-faithful, schema applied only on read;
  *   - [[writeRawDay]]: an already-parsed raw day frame re-serialized with
  *     `df.write.json` — the form a Spark-side repair/backfill job uses.
  *
  * Both `coalesce(1)`: a day is ONE region-keyed object by construction
  * (bounded — |regions| map entries), so single-file output mirrors the
  * reference's one-object-per-day layout; `overwrite` per day-directory =
  * the reference's fixed object name (re-fetching a day replaces it).
  */
object Lake {

  /** The day's directory under the lake root. */
  def rawDayDir(lakeRoot: String, runDate: LocalDate): String =
    s"$lakeRoot/date=$runDate"

  /** Write the raw payload string byte-faithfully to the day's lake path.
    * @return the day directory (feed it to [[readRawDay]] / the Runner). */
  def writeRawDayText(spark: SparkSession, payload: String,
                      lakeRoot: String, runDate: LocalDate): String = {
    import spark.implicits._
    val dir = rawDayDir(lakeRoot, runDate)
    spark.createDataset(Seq(payload)).coalesce(1)
      .write.mode("overwrite").text(dir)
    dir
  }

  /** Write a parsed raw day frame as the day's lake JSON object. */
  def writeRawDay(raw: DataFrame, lakeRoot: String, runDate: LocalDate): String = {
    val dir = rawDayDir(lakeRoot, runDate)
    raw.coalesce(1).write.mode("overwrite").json(dir)
    dir
  }

  /** Read a day back from the lake with the declared schema (FAILFAST —
    * see [[Flatten.readRawDay]]). */
  def readRawDay(spark: SparkSession, lakeRoot: String, runDate: LocalDate,
                 regions: Seq[String]): DataFrame =
    Flatten.readRawDay(spark, rawDayDir(lakeRoot, runDate), regions)
}
