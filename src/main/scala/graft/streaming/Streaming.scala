package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.functions.GraftFunctions.dsum

/** §2.9: the reference's cron-driven daily batches re-expressed as Structured
  * Streaming (SURVEY.md §2.9 mapping). The reference has no streaming engine —
  * its cadence is cron (trending_daily_ingestion.py:223) and its exactly-once
  * guarantee is the skip-if-present branch (:47-55). Here:
  *
  *   - the daily ingest becomes a checkpointed file-source stream with
  *     `Trigger.AvailableNow()` — the checkpoint IS the idempotence guard
  *     (re-running processes nothing; new files process exactly once), and
  *     AvailableNow gives the scheduled-batch cadence without a long-lived
  *     cluster;
  *   - the daily aggregate becomes a watermarked 1-day tumbling window,
  *     replacing the existence-check branch with late-data semantics.
  *
  * At scale: the file source lists incrementally (maxFilesPerTrigger bounds
  * a catch-up run), state is per (window × group) — bounded by design — and
  * the watermark caps state retention.
  */
object Streaming {

  /** Checkpointed exactly-once ingest: files dropped into `inDir` append to
    * the curated table once, across any number of restarts. */
  def ingestAvailableNow(spark: SparkSession, inDir: String, outDir: String,
                         checkpointDir: String, schema: StructType): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(inDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Watermarked tumbling 1-day aggregate over an event stream — the
    * streaming form of the daily-insights scan (reference
    * trending_daily_aggregates.py:52-93). Late rows within 1 hour of the
    * watermark still land in their day; later ones are dropped instead of
    * corrupting an already-published day (the reference simply never
    * reprocesses a day). Partial aggregation still applies map-side; state
    * is one row per (day × group). */
  def dailyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(
        to_date(col("w.start")).as("date"),
        col("event_type"), col("n"), col("total_value"))

  /** One event of a user's stream, for the stateful sessionizer. */
  case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp)
  /** One closed session. */
  case class Session(user_id: Long, session_id: Long,
                     session_start: Timestamp, session_end: Timestamp, n_events: Long)
  /** Carry-over state between micro-batches: the user's open session. */
  case class SessionState(nextId: Long, start: Timestamp, end: Timestamp, n: Long)

  /** Custom stateful sessionization via `flatMapGroupsWithState` — the
    * KeyValueGroupedDataset surface the windowed built-ins can't express
    * (session boundaries depend on inter-event GAPS, not fixed windows).
    * Events within a micro-batch arrive unordered per key, so each batch
    * sorts its group slice; the open session carries across batches in
    * [[SessionState]] and closes when a >30-minute gap (or the next batch's
    * first event) proves it ended. Parity with the batch window formulation
    * ([[graft.queries.RefQueries.sessionize]]) is test-pinned.
    *
    * At scale: state is ONE small record per active user, and the shuffle
    * carries events grouped by user — the same partitioning the batch form
    * needs for its window. */
  def sessionize(events: Dataset[SessionEvent]): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = it.toVector.sortBy(e => (e.ts.getTime, e.event_id))
          var closed = Vector.empty[Session]
          var cur = state.getOption
          for (e <- sorted) {
            cur = cur match {
              case None => Some(SessionState(1L, e.ts, e.ts, 1L))
              case Some(s) if e.ts.getTime / 1000 - s.end.getTime / 1000 > 1800 =>
                closed :+= Session(user, s.nextId, s.start, s.end, s.n)
                Some(SessionState(s.nextId + 1, e.ts, e.ts, 1L))
              case Some(s) =>
                Some(s.copy(end = e.ts, n = s.n + 1))
            }
          }
          // the final open session closes with the stream (AvailableNow) —
          // emit it and keep state so a further batch could reopen/continue
          cur.foreach(state.update)
          closed.iterator ++ cur.map(s => Session(user, s.nextId, s.start, s.end, s.n)).iterator
      }
  }
}
