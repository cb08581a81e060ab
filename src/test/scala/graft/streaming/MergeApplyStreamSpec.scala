package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `Streaming.startMergeApply` — continuous CDC MERGE apply. Pins the
  * per-batch snapshot evolution against hand-applied merge semantics,
  * stream/batch parity through the shared `mergeWinners` core, and
  * checkpointed exactly-once on restart. */
class MergeApplyStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("streamed merges evolve the snapshot exactly; restart emits nothing new") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-ma-in").toString
    val snap = Files.createTempDirectory("graft-ma-snap").toString
    val ckpt = Files.createTempDirectory("graft-ma-ckpt").toString

    val cols = Seq("op", "doc_id", "text", "lang", "source", "n_chars")
    // batch 1: pure inserts build the initial snapshot
    val b1: Seq[(String, Long, String, String, String, Long)] =
      (0L until 10L).map(i => ("I", i, s"doc $i", "en", "web", 5L))
    // batch 2: delete 3, update 5, insert 10 and 11
    val b2: Seq[(String, Long, String, String, String, Long)] = Seq(
      ("D", 3L, "doc 3", "en", "web", 5L),
      ("U", 5L, "doc 5 v2", "en", "web", 8L),
      ("I", 10L, "doc 10", "de", "web", 6L),
      ("I", 11L, "doc 11", "en", "cc", 6L))
    b1.toDF(cols: _*).coalesce(1).write.mode("append").parquet(in)
    b2.toDF(cols: _*).coalesce(1).write.mode("append").parquet(in)

    val snaps = scala.collection.mutable.ArrayBuffer.empty[Map[Long, (String, String, String, Long)]]
    def stream() = Streaming.startMergeApply(
      spark.readStream.schema(b1.toDF(cols: _*).schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      snap, ckpt) { s =>
      snaps += s.collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    }
    stream().awaitTermination()

    assert(snaps.length == 2)
    val want1 = b1.map { case (_, id, t, l, src, n) => id -> ((t, l, src, n)) }.toMap
    assert(snaps(0) == want1, "first batch of inserts IS the first snapshot")
    val want2 = (want1 - 3L) +
      (5L -> (("doc 5 v2", "en", "web", 8L))) +
      (10L -> (("doc 10", "de", "web", 6L))) +
      (11L -> (("doc 11", "en", "cc", 6L)))
    assert(snaps(1) == want2, "delete/update/insert must all apply")

    // stream/batch parity: the shared mergeWinners core applied statically
    // to (snapshot1 as base) ∪ (batch 2 changes) equals snapshot 2
    val baseRows = want1.toSeq.map { case (id, (t, l, src, n)) =>
      (0, "B", id, t, l, src, n)
    }
    val chgRows = b2.map { case (op, id, t, l, src, n) => (1, op, id, t, l, src, n) }
    val rows = (baseRows ++ chgRows)
      .toDF("src", "op", "doc_id", "text", "lang", "source", "n_chars")
    val batchMerge = graft.queries.ExtQueries.mergeWinners(rows).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    assert(snaps(1) == batchMerge)

    // restart with nothing new: the checkpoint suppresses re-emission
    stream().awaitTermination()
    assert(snaps.length == 2)
  }

  test("retention keeps the newest retainLast versions; the snapshot is unchanged") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-mar-in").toString
    val snap = Files.createTempDirectory("graft-mar-snap").toString
    val ckpt = Files.createTempDirectory("graft-mar-ckpt").toString

    val cols = Seq("op", "doc_id", "text", "lang", "source", "n_chars")
    val batches: Seq[Seq[(String, Long, String, String, String, Long)]] = Seq(
      (0L until 6L).map(i => ("I", i, s"doc $i", "en", "web", 5L)),
      Seq(("D", 1L, "doc 1", "en", "web", 5L),
        ("U", 2L, "doc 2 v2", "en", "web", 8L)),
      Seq(("I", 6L, "doc 6", "de", "cc", 5L),
        ("D", 4L, "doc 4", "en", "web", 5L)))
    batches.foreach(b =>
      b.toDF(cols: _*).coalesce(1).write.mode("append").parquet(in))

    var last: Map[Long, (String, String, String, Long)] = Map.empty
    Streaming.startMergeApply(
      spark.readStream.schema(batches.head.toDF(cols: _*).schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      snap, ckpt, retainLast = 2) { s =>
      last = s.collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    }.awaitTermination()

    // only the newest 2 version directories survive the vacuum
    val versions = new java.io.File(snap).list().toSeq
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).sorted
    assert(versions.length == 2, s"versions kept: $versions")
    assert(versions == versions.sorted.takeRight(2))

    // retention never changes the CURRENT snapshot — hand-fold the batches
    var want = Map.empty[Long, (String, String, String, Long)]
    for (b <- batches; (op, id, t, l, src, n) <- b) op match {
      case "D" => want -= id
      case _   => want += id -> ((t, l, src, n))
    }
    assert(last == want, "retained run must end at the same snapshot")

    // the floor requirement is enforced loudly, not silently clamped
    intercept[IllegalArgumentException] {
      Streaming.startMergeApply(
        spark.readStream.schema(batches.head.toDF(cols: _*).schema).parquet(in),
        snap, ckpt, retainLast = 1) { _ => () }
    }
  }
}
