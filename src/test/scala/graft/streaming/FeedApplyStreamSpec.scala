package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `Streaming.startFeedApply` — streaming materialized-view maintenance
  * over a change feed (test-gated per SURVEY §5). Pins:
  *
  *  - PER-VERSION PARITY with the batch key: feeding `e_change_feed`'s
  *    version slices as micro-batches, each trigger's emitted view equals
  *    `e_feed_apply`'s rows for that version exactly (same monoid, same
  *    sign rule — one definition);
  *  - the state stores partials and the emit finalizes (mean appears only
  *    in the emitted view);
  *  - a checkpointed restart with no new feed is a no-op (exactly-once).
  */
class FeedApplyStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  // ExtQueries.TimeTravelVersions (private to graft.queries)
  private val NVersions = 3

  test("streamed fold == e_feed_apply at every version; restart is a no-op") {
    import graft.queries.ExtQueries
    val in = Files.createTempDirectory("graft-fas-in").toString
    val state = Files.createTempDirectory("graft-fas-state").toString
    val ckpt = Files.createTempDirectory("graft-fas-ckpt").toString

    // the graded feed, one file per version in version order
    val feed = ExtQueries.changeFeed(spark, dir)
      .select("version", "change_type", "lang", "source", "n_chars")
      .persist()
    for (v <- 1 to NVersions)
      feed.filter(col("version") === v).drop("version")
        .coalesce(1).write.mode("append").parquet(in)
    val init = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    feed.unpersist()

    type State = Map[(String, String), (Long, Long, Double)]
    def stateOf(rows: Array[org.apache.spark.sql.Row]): State =
      rows.map { r =>
        (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))
      }.toMap
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[State]
    def run(): Unit = Streaming.startFeedApply(
      spark.readStream
        .schema(spark.read.parquet(in).schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      init, state, ckpt) { view =>
      perBatch += stateOf(view
        .select("lang", "source", "n_docs", "sum_chars", "avg_chars")
        .collect())
    }.awaitTermination()
    run()
    spark.catalog.clearCache()
    assert(perBatch.length == NVersions,
      s"micro-batch count: ${perBatch.length}")

    // per-version parity with the batch key (hash-gated vs DuckDB itself)
    val want = ExtQueries.feedApply(spark, dir).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(rows => stateOf(rows.map(r =>
        org.apache.spark.sql.Row(r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))))).toMap
    spark.catalog.clearCache()
    for (v <- 1 to NVersions)
      assert(perBatch(v - 1) == want(v.toLong), s"version $v view")

    // restart with nothing new: checkpointed AvailableNow is a no-op
    val n = perBatch.length
    run()
    spark.catalog.clearCache()
    assert(perBatch.length == n, "restart must not re-emit")
  }
}
