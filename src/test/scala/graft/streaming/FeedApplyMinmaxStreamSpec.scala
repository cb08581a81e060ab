package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `Streaming.startFeedApplyMinmax` — streaming lazy-extremum MV
  * maintenance (test-gated per SURVEY §5). Pins:
  *
  *  - PER-VERSION PARITY with the batch key: feeding `e_change_feed`'s
  *    version slices as micro-batches, each trigger's emitted state
  *    equals `e_feed_apply_minmax`'s rows for that version EXACTLY —
  *    including the `rescans` bill (same fold, same trigger — one
  *    definition via the shared minmaxFold);
  *  - the re-scan reads the gate's own maintained table state (the
  *    fallback never leaves the state store), certified by the parity
  *    itself: a drifted table would rescan to wrong extrema;
  *  - a checkpointed restart with no new feed is a no-op (exactly-once
  *    on both stores).
  */
class FeedApplyMinmaxStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  private val NVersions = 3

  test("streamed lazy-extremum fold == e_feed_apply_minmax; restart no-op") {
    import graft.queries.ExtQueries
    val in = Files.createTempDirectory("graft-famm-in").toString
    val state = Files.createTempDirectory("graft-famm-state").toString
    val ckpt = Files.createTempDirectory("graft-famm-ckpt").toString

    val feed = ExtQueries.changeFeed(spark, dir)
      .select("version", "change_type", "doc_id", "lang", "source", "n_chars")
      .persist()
    for (v <- 1 to NVersions)
      feed.filter(col("version") === v).drop("version")
        .coalesce(1).write.mode("append").parquet(in)
    feed.unpersist()
    val base = spark.read.parquet(s"$dir/documents.parquet")
    val initTable = base.select("doc_id", "lang", "source", "n_chars")
    val initAgg = base.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("n_chars")).as("max_chars"),
        min(col("n_chars")).as("min_chars"))

    type State = Map[(String, String), (Long, Long, Long, Long)]
    def stateOf(rows: Array[org.apache.spark.sql.Row]): State =
      rows.map { r =>
        (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      }.toMap
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[State]
    def run(): Unit = Streaming.startFeedApplyMinmax(
      spark.readStream
        .schema(spark.read.parquet(in).schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      initTable, initAgg, state, ckpt) { view =>
      perBatch += stateOf(view
        .select("lang", "source", "n_docs", "max_chars", "min_chars",
          "rescans").collect())
    }.awaitTermination()
    run()
    spark.catalog.clearCache()
    assert(perBatch.length == NVersions,
      s"micro-batch count: ${perBatch.length}")

    val want = ExtQueries.feedApplyMinmax(spark, dir).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(rows => rows.map { r =>
        (r.getString(1), r.getString(2)) ->
          (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      }.toMap).toMap
    spark.catalog.clearCache()
    for (v <- 1 to NVersions)
      assert(perBatch(v - 1) == want(v.toLong), s"version $v state")
    // rescans genuinely crossed the stream (the fixture forces them)
    assert(perBatch.exists(_.values.exists(_._4 > 0)),
      "no rescan fired through the stream — degenerate")

    val n = perBatch.length
    run()
    spark.catalog.clearCache()
    assert(perBatch.length == n, "restart must not re-emit")
  }
}
