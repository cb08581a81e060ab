package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_ivf_filter_trained` — filtered IVF serving from the TRAINED
  * quantizer. The pin is a LITERAL re-run: train the chain locally (the
  * shared [[TrainReplay]] recipe), assign the labeled corpus to the final
  * centroids, probe each query's nprobe nearest trained cells, apply the
  * label predicate BEFORE scoring, and recompute the pinned-ranking
  * top-k — the distributed serve must match exactly. Also measures the
  * trained-vs-seed filtered recall against `e_ann_filter`'s exact
  * pre-filter truth: the attribution number `e_filter_recall` grades as
  * its fourth strategy row. */
class IvfFilterTrainedSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("trained filtered serve matches a literal local re-run; recall measured vs seed") {
    import TrainReplay.{assign, cos, trainedCents}
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
      .sortBy(_._1)
    val emb = rows.map { case (id, v, _) => (id, v) }
    val cents = trainedCents(emb, ExtQueries.IvfCells, ExtQueries.KmeansIters)

    def probeCells(v: Array[Double], n: Int): Set[Long] =
      cents.map { case (cid, c) => (cid, cos(v, c)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(n).map(_._1).toSet

    val cellOf = emb.map { case (id, v) => id -> assign(v, cents) }.toMap
    val labelOf = rows.map { case (id, _, l) => id -> l }.toMap
    val k = ExtQueries.AnnFilterK
    val want = rows.filter(_._1 < 8).map { case (qid, qv, ql) =>
      val tgt = (ql + 1) % ExtQueries.AnnFilterLabels
      val probed = probeCells(qv, ExtQueries.IvfFilterNprobe)
      val top = emb
        .filter { case (cid, _) =>
          cid != qid && labelOf(cid) == tgt && probed(cellOf(cid))
        }
        .map { case (cid, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(k)
      qid -> top.zipWithIndex.map { case ((cid, _), i) => (cid, i + 1) }.toSet
    }.toMap

    val got = ExtQueries.ivfFilterTrained(spark, dir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getInt(3))).toSet).toMap
    spark.catalog.clearCache() // the training chain persists corpus + updates
    assert(got.keySet == want.keySet)
    for (q <- want.keys)
      assert(got(q) == want(q), s"qid $q: trained filtered serve != literal re-run")

    // the attribution number: trained-vs-seed recall against the exact
    // pre-filter truth (the e_filter_recall fourth-row semantics)
    val truth = ExtQueries.annFilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    spark.catalog.clearCache()
    val seed = ExtQueries.ivfFilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // .toSeq first — flatMap on a Map producing (q, c) pairs collapses by q
    val trained = got.toSeq.flatMap { case (q, s) => s.map { case (c, _) => (q, c) } }.toSet
    val rTr = truth.count(trained).toDouble / truth.size
    val rSe = truth.count(seed).toDouble / truth.size
    info(f"filtered recall@$k trained=$rTr%.2f seed=$rSe%.2f")
    assert(trained.nonEmpty && truth.nonEmpty)
  }
}
