package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Tombstone propagation into the standing stream-gate indexes — the
  * streaming half of the GDPR cascade (test-gated per SURVEY §5; the
  * batch half is oracle-gated via `e_index_delete`). Pins:
  *
  *  - NEAR-DUP GATE: after a mid-stream tombstone batch, verdicts equal
  *    restart-with-survivors (a fresh static gate over the survivor
  *    corpus), and a probe whose ONLY match was the deleted document
  *    stops matching — live, in the same stream, no restart;
  *  - KNN ATTACH GATE: after a tombstone batch, the attach output equals
  *    the full rebuild-over-survivors reference under the SAME quantizer
  *    (the `e_index_delete` repair ≡ rebuild theorem, re-pinned end to
  *    end through the gate), no emitted edge references a deleted id,
  *    and the fixture forces real promotions (a naive anti-join of the
  *    standing adjacency would be WRONG — the rescore is load-bearing);
  *  - deletes apply before the same batch's adds (the CDC convention).
  */
class StreamingDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("near-dup gate: tombstone == restart-with-survivors; unique match dies") {
    import spark.implicits._
    import graft.queries.ExtQueries
    val off = ExtQueries.VariantIdOffset
    val in = Files.createTempDirectory("graft-ndgd-in").toString
    val ckpt = Files.createTempDirectory("graft-ndgd-ckpt").toString
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val docs = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    val variants = docs.map { case (id, t) =>
      (id + off, t.trim.split("\\s+").drop(5).mkString(" "))
    }.sortBy(_._1)

    // ground truth from the graded batch detector: per variant, its
    // matching corpus ids
    val pairs = ExtQueries.crossDedup(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    val matchesOf = pairs.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // a probe whose ONLY match is one corpus doc — deleting that doc must
    // flip its verdict to clean
    val (probeId, onlyMatch) = matchesOf.collectFirst {
      case (b, as) if as.size == 1 => (b, as.head)
    }.getOrElse(fail("no unique-match probe on this fixture"))
    val probes = variants.filter { case (id, _) =>
      id == probeId || matchesOf.get(id).exists(_.contains(onlyMatch))
    }.take(8) ++ variants.filterNot { case (id, _) =>
      matchesOf.contains(id) }.take(2)

    def addDf(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => ("add", id, t) }.toDF("op", "doc_id", "text")
    // batch 1: probes against the full corpus; batch 2: tombstone the
    // matched doc (no adds); batch 3: the same probes again
    addDf(probes.toSeq).coalesce(1).write.mode("append").parquet(in)
    Seq(("delete", onlyMatch, "")).toDF("op", "doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    addDf(probes.toSeq).coalesce(1).write.mode("append").parquet(in)

    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Option[Long]]]
    Streaming.startNearDupGateWithDeletes(
      spark.readStream.schema(addDf(probes.take(1).toSeq).schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      corpus, ckpt) { verdicts =>
      perBatch += verdicts.collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    }.awaitTermination()
    spark.catalog.clearCache()
    assert(perBatch.length == 3, s"micro-batch count: ${perBatch.length}")
    assert(perBatch(1).isEmpty, "a pure tombstone batch emits no verdicts")

    // batch 1 = full-corpus truth; batch 3 = the same truth minus the
    // deleted doc (the local model of the repair)
    val want1 = probes.map { case (id, _) =>
      id -> matchesOf.get(id).map(_.min) }.toMap
    val want3 = probes.map { case (id, _) =>
      id -> matchesOf.get(id).map(_ - onlyMatch).filter(_.nonEmpty).map(_.min)
    }.toMap
    assert(perBatch(0) == want1, "pre-tombstone verdicts")
    assert(perBatch(2) == want3, "post-tombstone verdicts")
    assert(want1(probeId).contains(onlyMatch) && want3(probeId).isEmpty,
      "the unique-match probe must go clean after the tombstone")

    // restart-with-survivors parity: a FRESH static gate over the survivor
    // corpus must produce batch 3's verdicts exactly
    val in2 = Files.createTempDirectory("graft-ndgd-in2").toString
    val ckpt2 = Files.createTempDirectory("graft-ndgd-ckpt2").toString
    probes.toSeq.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in2)
    var restart = Map.empty[Long, Option[Long]]
    Streaming.startNearDupGate(
      spark.readStream.schema(probes.toSeq.toDF("doc_id", "text").schema)
        .parquet(in2),
      corpus.filter(col("doc_id") =!= onlyMatch), ckpt2) { verdicts =>
      restart = verdicts.collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    }.awaitTermination()
    spark.catalog.clearCache()
    assert(perBatch(2) == restart, "tombstone path == restart-with-survivors")
  }

  test("knn attach gate: tombstone repair == rebuild-over-survivors; rescore is load-bearing") {
    import graft.queries.ExtQueries
    val off = ExtQueries.VariantIdOffset
    val in = Files.createTempDirectory("graft-kagd-in").toString
    val ckpt = Files.createTempDirectory("graft-kagd-ckpt").toString
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val adds = corpus.filter(pmod(col("vec_id"), lit(10L)) === 0)
      .select((col("vec_id") + lit(off)).as("vec_id"), col("embedding"))
    val ids = adds.select("vec_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    val (a1, a2) = (adds.filter(col("vec_id") < cut),
      adds.filter(col("vec_id") >= cut))
    // the e_index_delete request rule (DeleteEveryMod = 13, private to
    // graft.queries — its spec pins deletions that change top-k answers)
    val dels = corpus.filter(pmod(col("vec_id"), lit(13L)) === 0)

    def withOp(df: org.apache.spark.sql.DataFrame, op: String) =
      df.select(lit(op).as("op"), col("vec_id"), col("embedding"))
    withOp(a1, "add").coalesce(1).write.mode("append").parquet(in)
    withOp(dels, "delete").coalesce(1).write.mode("append").parquet(in)
    withOp(a2, "add").coalesce(1).write.mode("append").parquet(in)

    type Edge = (Long, Long, Double, Int)
    def edges(rows: Array[org.apache.spark.sql.Row]): Set[Edge] =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[Edge]]
    Streaming.startKnnAttachGateWithDeletes(
      spark.readStream.schema(withOp(a1, "add").schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      corpus, ckpt) { adj => perBatch += edges(adj.collect()) }
      .awaitTermination()
    spark.catalog.clearCache()
    assert(perBatch.length == 3, s"micro-batch count: ${perBatch.length}")
    assert(perBatch(1).isEmpty, "a pure tombstone batch attaches nothing")

    // references under the SAME quantizer (quantizer retrain is
    // e_index_retrain's separate concern — a rebuild keeps assignments)
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cents = ExtQueries.seedCentroidsOf(corpus).persist()
    val assignedAll = ExtQueries.knnAssign(corpus, cents).persist(sl)
    val standingAll = ExtQueries.knnAdjacency(assignedAll).persist(sl)
    val delIds = dels.select("vec_id").collect().map(_.getLong(0)).toSet
    val survAssigned = assignedAll
      .filter(!col("vec_id").isin(delIds.toSeq: _*)).persist(sl)
    val survStanding = ExtQueries.knnAdjacency(survAssigned).persist(sl)

    val want1 = edges(ExtQueries.knnAttach(assignedAll, standingAll,
      ExtQueries.knnAssign(a1, cents)).collect())
    val want3 = edges(ExtQueries.knnAttach(survAssigned, survStanding,
      ExtQueries.knnAssign(a2, cents)).collect())
    assert(perBatch(0) == want1, "pre-tombstone attach parity")
    assert(perBatch(2) == want3,
      "post-tombstone attach must equal rebuild-over-survivors")
    assert(perBatch(2).forall { case (s, n, _, _) =>
      !delIds.contains(s) && !delIds.contains(n) },
      "no emitted edge may reference a deleted id")

    // the rescore is load-bearing: a naive anti-join of the standing
    // adjacency is NOT the survivor rebuild (deletions promote new
    // neighbors into vacated top-k slots on this fixture)
    val naive = edges(standingAll
      .filter(!col("src").isin(delIds.toSeq: _*) &&
        !col("nbr").isin(delIds.toSeq: _*)).collect())
    val rebuilt = edges(survStanding.collect())
    assert(naive != rebuilt,
      "fixture must force promotions — otherwise the repair proves nothing")
    Seq(cents, assignedAll, standingAll, survAssigned, survStanding)
      .foreach(_.unpersist())
    spark.catalog.clearCache()
  }
}
