package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_incr_knn` — incremental k-NN graph maintenance. The contract is
  * EXACTNESS of the attach: merging each touched node's OLD top-k list
  * with the batch arrivals must equal a full rebuild over corpus ∪ batch
  * restricted to touched nodes (the scaladoc's "fewer than k candidates
  * beat a rebuild winner ⇒ it sits in the old list" argument, checked
  * here as row equality against a sequential rebuild replay). The second
  * test arithmetizes the scale claim: the incremental path scores a
  * batch-proportional candidate volume, the rebuild a corpus-cell one. */
class IncrKnnSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def norm(v: Array[Float]): Double =
    math.sqrt(v.foldLeft(0.0)((a, f) => a + f.toDouble * f.toDouble))
  private def cos(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble) /
      (norm(a) * norm(b))

  /** (union universe, centroid set, per-id cell assignment) replayed. */
  private def replayAssignment(): (Array[(Long, Array[Float])],
      Map[Long, Long]) = {
    val vecs = RefQueries.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val batch = vecs.filter(_._1 % ExtQueries.IncrKnnBatchMod == 0)
      .map { case (id, v) => (id + ExtQueries.VariantIdOffset, v) }
    val uni = vecs ++ batch
    val cents = vecs.filter(_._1 < ExtQueries.IvfCells)
    val cellOf = uni.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .sortBy(t => (-t._2, t._1)).head._1
    }.toMap
    (uni, cellOf)
  }

  test("incremental attach == full rebuild restricted to touched nodes") {
    val got = ExtQueries.incrKnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    spark.catalog.clearCache()

    val (uni, cellOf) = replayAssignment()
    val tcells = uni.map(_._1).filter(_ >= ExtQueries.VariantIdOffset)
      .map(cellOf).toSet
    val touched = uni.map(_._1).filter(id => tcells(cellOf(id))).toSet
    val byCell = uni.groupBy(t => cellOf(t._1))
    val want = uni.filter(t => touched(t._1)).flatMap { case (id, v) =>
      byCell(cellOf(id)).filter(_._1 != id)
        .map { case (nid, nv) => (nid, cos(v, nv)) }
        .sortBy(t => (-t._2, t._1)).take(ExtQueries.KnnK)
        .zipWithIndex.map { case ((nid, s), i) => (id, nid, s, i + 1) }
    }.toSet
    assert(got.toSet == want)
    // both populations are present and nothing outside the touched set leaks
    assert(got.forall(r => touched(r._1)))
    assert(got.exists(_._1 >= ExtQueries.VariantIdOffset) &&
      got.exists(_._1 < ExtQueries.VariantIdOffset))
  }

  test("candidate volume is batch-proportional, below the rebuild's") {
    val (uni, cellOf) = replayAssignment()
    val cellSize = uni.groupBy(t => cellOf(t._1)).view.mapValues(_.length).toMap
    val batchIds = uni.map(_._1).filter(_ >= ExtQueries.VariantIdOffset)
    val batchPerCell = batchIds.groupBy(cellOf).view.mapValues(_.length).toMap
    val tcells = batchPerCell.keySet
    val touchedExisting = uni.map(_._1)
      .filter(id => id < ExtQueries.VariantIdOffset && tcells(cellOf(id)))
    // incremental: batch × (cell − self) + per-touched-existing (old k + batch arrivals)
    val incCand = batchIds.map(id => cellSize(cellOf(id)) - 1L).sum +
      touchedExisting.map(id =>
        ExtQueries.KnnK.toLong + batchPerCell(cellOf(id))).sum
    // rebuild: every touched node against its whole cell
    val rebuildCand = (batchIds ++ touchedExisting)
      .map(id => cellSize(cellOf(id)) - 1L).sum
    assert(incCand < rebuildCand,
      s"incremental $incCand pairs must undercut the rebuild's $rebuildCand")
  }
}
