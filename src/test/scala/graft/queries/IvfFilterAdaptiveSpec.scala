package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_ivf_filter_adaptive` — guaranteed-k adaptive filtered IVF serving.
  * Replays the whole plan sequentially (probe schedule from the (cell,
  * label) counts, selectivity spill, filtered in-cell serve) and pins the
  * guarantee a fixed-nprobe serve cannot make: every query's scored
  * candidate set reaches the probe target or provably exhausts the cells.
  * The two knob corners (never-spill, always-spill) are driven through the
  * impl entry so both branches of the per-query decision are exercised on
  * a fixture whose pinned operating point takes only one of them. */
class IvfFilterAdaptiveSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def norm(v: Array[Float]): Double =
    math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)

  private val k = ExtQueries.AnnFilterK
  private val nCells = ExtQueries.IvfCells

  // (id, vec, norm, label, cell) for the full corpus, assigned sequentially
  private lazy val assigned: Array[(Long, Array[Float], Double, Int, Long)] = {
    val rows = RefQueries.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val cents = rows.filter(_._1 < nCells).map { case (id, e, _) => (id, e, norm(e)) }
    def cellsOf(e: Array[Float], nrm: Double): Seq[Long] =
      cents.map { case (cid, ce, nc) => (cid, dot(e, ce) / (nrm * nc)) }
        .sortBy { case (cid, s) => (-s, cid) }.map(_._1).toSeq
    rows.map { case (id, e, l) =>
      val nrm = norm(e)
      (id, e, nrm, l, cellsOf(e, nrm).head)
    }
  }

  private lazy val cents = assigned.filter(_._1 < nCells)
    .map { case (id, e, nrm, _, _) => (id, e, nrm) }

  private def cellOrder(e: Array[Float], nrm: Double): Seq[Long] =
    cents.map { case (cid, ce, nc) => (cid, dot(e, ce) / (nrm * nc)) }
      .sortBy { case (cid, s) => (-s, cid) }.map(_._1).toSeq

  /** Sequential replay: (qid, rank) → (cid, score, n_match_total,
    * eff_nprobe, spilled). */
  private def replay(targetK: Int, spillMax: Long)
      : Map[(Long, Int), (Long, Double, Long, Int, Long)] = {
    val cellCnt: Map[(Long, Int), Long] = assigned
      .groupBy(a => (a._5, a._4)).view.mapValues(_.length.toLong).toMap
    assigned.filter(_._1 < 8).flatMap { case (qid, qe, nq, ql, _) =>
      val tgt = (ql + 1) % ExtQueries.AnnFilterLabels
      val order = cellOrder(qe, nq)
      val cums = order.scanLeft(0L)((acc, c) =>
        acc + cellCnt.getOrElse((c, tgt), 0L)).tail
      val total = cums.last
      val effN =
        if (total <= spillMax) nCells
        else cums.indexWhere(_ >= targetK) match {
          case -1 => nCells
          case i  => i + 1
        }
      val spilled = if (total <= spillMax) 1L else 0L
      val probed = order.take(effN).toSet
      assigned
        .filter { case (cid, _, _, cl, cell) =>
          cid != qid && cl == tgt && probed(cell)
        }
        .map { case (cid, ce, nc, _, _) => (cid, dot(qe, ce) / (nq * nc)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(k).zipWithIndex
        .map { case ((cid, s), i) =>
          (qid, i + 1) -> ((cid, s, total, effN, spilled))
        }
    }.toMap
  }

  private def collectAdaptive(df: org.apache.spark.sql.DataFrame)
      : Map[(Long, Int), (Long, Double, Long, Int, Long)] = {
    val got = df.collect().map(r => (r.getLong(0), r.getInt(3)) ->
      ((r.getLong(1), r.getDouble(2), r.getLong(4), r.getInt(5), r.getLong(6)))).toMap
    spark.catalog.clearCache()
    got
  }

  test("pinned operating point equals the sequential replay") {
    val want = replay(ExtQueries.IvfAdaptiveTargetK, ExtQueries.IvfAdaptiveSpillMax)
    val got = collectAdaptive(ExtQueries.ivfFilterAdaptive(spark, dir))
    assert(got == want, "adaptive serve must equal the sequential replay")
    assert(got.nonEmpty)
  }

  test("never-spill corner: probe-until-target schedule, guarantee holds per query") {
    val target = ExtQueries.IvfAdaptiveTargetK
    val want = replay(target, spillMax = 0L)
    val got = collectAdaptive(
      ExtQueries.ivfFilterAdaptiveImpl(spark, dir, target, spillMax = 0L))
    assert(got == want, "never-spill serve must equal the sequential replay")
    assert(got.values.forall(_._5 == 0L), "spill bound 0 must never spill")
    // THE guarantee: each query's scored candidate set reaches the target
    // or the schedule provably exhausted the cells
    val cellCnt: Map[(Long, Int), Long] = assigned
      .groupBy(a => (a._5, a._4)).view.mapValues(_.length.toLong).toMap
    got.groupBy(_._1._1).foreach { case (qid, rows) =>
      val (_, _, total, effN, _) = rows.head._2
      val (_, qe, nq, ql, _) = assigned.find(_._1 == qid).get
      val tgt = (ql + 1) % ExtQueries.AnnFilterLabels
      val reachable = cellOrder(qe, nq).take(effN)
        .map(c => cellCnt.getOrElse((c, tgt), 0L)).sum
      assert(reachable >= math.min(target.toLong, total),
        s"query $qid: schedule reached $reachable of target $target (total $total)")
      if (reachable < target)
        assert(effN == nCells, s"query $qid: under-target schedule must exhaust cells")
    }
  }

  test("always-spill corner: output is exactly the brute-force pre-filter truth") {
    val got = collectAdaptive(ExtQueries.ivfFilterAdaptiveImpl(spark, dir,
      ExtQueries.IvfAdaptiveTargetK, spillMax = Long.MaxValue))
    assert(got.values.forall(t => t._5 == 1L && t._4 == nCells),
      "everything spills under an unbounded spill threshold")
    val truth = ExtQueries.annFilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache()
    assert(got.map { case (key, (cid, _, _, _, _)) => key -> cid } == truth,
      "spilled serving must equal the exact pre-filter truth: probing every " +
        "cell IS the brute-force plan, because each matching vector lives in " +
        "exactly one cell")
  }

  test("pinned knobs: fixture exercises the spill branch at the gate scale") {
    // 500 vectors / 10 labels ≈ 50 matching per query ≤ the spill bound —
    // the pinned operating point must take the spill branch here (the
    // never-spill corner above covers the other branch), so the harness
    // grades genuine spill behavior at the correctness gate
    val got = collectAdaptive(ExtQueries.ivfFilterAdaptive(spark, dir))
    assert(got.values.forall(_._5 == 1L),
      "at 500 corpus vectors every query's predicate leaves <= 100 matches")
  }
}
