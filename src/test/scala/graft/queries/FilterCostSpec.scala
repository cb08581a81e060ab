package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_filter_cost` — the cost/recall frontier of the filtered-serving
  * strategies. Recomputes every strategy's scored-work count from a
  * sequential replay of the assignment metadata and pins the frontier
  * facts that make the table actionable: post-filtering pays the whole
  * corpus per query, the index plans pay only their probed cells'
  * matching rows, and the exact plan's recall is 1 at selectivity·|corpus|
  * work. */
class FilterCostSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def norm(v: Array[Float]): Double =
    math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)

  test("frontier rows equal the sequential work replay joined to the recall harness") {
    val rows = RefQueries.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val nCells = ExtQueries.IvfCells
    val cents = rows.filter(_._1 < nCells).map { case (id, e, _) => (id, e, norm(e)) }
    def cellOrder(e: Array[Float], nrm: Double): Seq[Long] =
      cents.map { case (cid, ce, nc) => (cid, dot(e, ce) / (nrm * nc)) }
        .sortBy { case (cid, s) => (-s, cid) }.map(_._1).toSeq
    val assigned = rows.map { case (id, e, l) =>
      val nrm = norm(e); (id, l, cellOrder(e, nrm).head)
    }
    val cellCnt = assigned.groupBy(a => (a._3, a._2)).view
      .mapValues(_.length.toLong).toMap
    val queries = rows.filter(_._1 < 8)

    // per-strategy scored work, replayed
    var exact = 0L; var fixed = 0L; var adaptive = 0L
    queries.foreach { case (_, qe, ql) =>
      val nq = norm(qe)
      val tgt = (ql + 1) % ExtQueries.AnnFilterLabels
      val order = cellOrder(qe, nq)
      val ms = order.map(c => cellCnt.getOrElse((c, tgt), 0L))
      val cums = ms.scanLeft(0L)(_ + _).tail
      val total = cums.last
      exact += total
      fixed += ms.take(ExtQueries.IvfFilterNprobe).sum
      val effN =
        if (total <= ExtQueries.IvfAdaptiveSpillMax) nCells
        else cums.indexWhere(_ >= ExtQueries.IvfAdaptiveTargetK) match {
          case -1 => nCells; case i => i + 1
        }
      adaptive += ms.take(effN).sum
    }
    val post = queries.length.toLong * (rows.length.toLong - 1L)

    // the trained row's work: the same fixed-nprobe schedule over the
    // TRAINED assignment (the shared TrainReplay chain)
    val embD = rows.map { case (id, e, _) => (id, e.map(_.toDouble)) }
    val centsT = TrainReplay.trainedCents(embD, nCells, ExtQueries.KmeansIters)
    val cellOfT = embD.map { case (id, v) => id -> TrainReplay.assign(v, centsT) }.toMap
    val cellCntT = rows.groupBy { case (id, _, l) => (cellOfT(id), l) }.view
      .mapValues(_.length.toLong).toMap
    var fixedT = 0L
    queries.foreach { case (_, qe, ql) =>
      val tgt = (ql + 1) % ExtQueries.AnnFilterLabels
      val orderT = centsT.map { case (cid, c) => (cid, TrainReplay.cos(qe.map(_.toDouble), c)) }
        .sortBy { case (cid, s) => (-s, cid) }.map(_._1)
      fixedT += orderT.take(ExtQueries.IvfFilterNprobe)
        .map(c => cellCntT.getOrElse((c, tgt), 0L)).sum
    }

    val wantWork = Map("exact_prefilter" -> exact, "ivf_prefilter" -> fixed,
      "ivf_adaptive" -> adaptive, "ivf_trained" -> fixedT, "postfilter" -> post)

    val recall = ExtQueries.filterRecall(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    spark.catalog.clearCache()
    val got = ExtQueries.filterCost(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    spark.catalog.clearCache()

    assert(got.keySet == wantWork.keySet)
    got.foreach { case (s, (nT, nH, rc, nScored, perQ, perHit)) =>
      assert(nScored == wantWork(s), s"$s: scored-work count")
      assert(perQ == nScored.toDouble / queries.length.toDouble, s"$s: per-query")
      assert(perHit == nScored.toDouble / nH.toDouble, s"$s: per-hit")
      if (s == "exact_prefilter") {
        assert(rc == 1.0 && nH == nT, "exact plan is the truth")
      } else {
        val (wT, wH, wR) = recall(s)
        assert((nT, nH, rc) == ((wT, wH, wR)), s"$s: recall row must compose")
      }
    }
    // the frontier facts the table exists to show
    assert(got("postfilter")._4 > got("exact_prefilter")._4,
      "post-filtering must out-pay even the exact pre-filter at 1/|labels| selectivity")
    assert(got("ivf_adaptive")._4 <= got("exact_prefilter")._4,
      "the adaptive plan never scores more than the exact pre-filter")
    assert(got("ivf_prefilter")._4 <= got("exact_prefilter")._4)
    assert(got.values.forall(_._4 > 0L))
  }
}
