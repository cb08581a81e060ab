package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_louvain_move` — the synchronous modularity-ascent sweep. Pins:
  *
  *  - FULL INDEPENDENT RECOMPUTE: every row (best community, exact gain
  *    numerator, move/stay verdict) re-derived in local Scala from the
  *    collected graph and labels, at both gate scales;
  *  - the SINGLE-MOVE EXACTNESS THEOREM: applying any one emitted move to
  *    the partition changes the modularity decomposition by exactly
  *    2·gain_num on the Q·4m² integer scale — checked for the best,
  *    median, and last moves as pure int64 arithmetic;
  *  - non-degeneracy: moves and stays both occur, moves carry strictly
  *    positive gain, stays carry zero.
  */
class LouvainMoveSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def graphAndLabels(dir: String) = {
    val labels = ExtQueries.labelProp(spark, dir).collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = ExtQueries.knnGraph(spark, dir).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).distinct
      .filter { case (a, b) => labels.contains(a) && labels.contains(b) }
    spark.catalog.clearCache()
    (labels, edges)
  }

  private def gainTable(labels: Map[Long, Int],
      edges: Seq[(Long, Long)]): Map[Long, (Int, Int, Long)] = {
    val m = edges.size.toLong
    val nbrs = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val ki = nbrs.view.mapValues(_.size.toLong).toMap
    // toSeq before mapping ids through ki: a Set would collapse equal
    // degree VALUES and silently under-sum the community totals
    val dsum = nbrs.keys.toSeq.groupBy(labels).view
      .mapValues(_.map(ki).sum).toMap
    nbrs.map { case (i, js) =>
      val a = labels(i)
      val kic = js.groupBy(labels).view.mapValues(_.size.toLong).toMap
      val kia = kic.getOrElse(a, 0L)
      val cands = kic.keys.toSeq.filter(_ != a).map { b =>
        (2 * m * (kic(b) - kia) - ki(i) * (dsum(b) - dsum(a) + ki(i)), b)
      }
      val best = if (cands.isEmpty) (0L, a)
        else cands.maxBy { case (g, b) => (g, -b.toLong) }
      val (g, to) = if (best._1 > 0) best else (0L, a)
      i -> (a, to, g)
    }
  }

  private def q4m2(labels: Map[Long, Int], edges: Seq[(Long, Long)]): Long = {
    val m = edges.size.toLong
    val ein = edges.groupBy(e => labels(e._1))
      .collect { case (c, es) => c -> es.count(e => labels(e._2) == labels(e._1)).toLong }
    val both = edges ++ edges.map(e => (e._2, e._1))
    val dsum = both.groupBy(e => labels(e._1)).view.mapValues(_.size.toLong)
    dsum.map { case (c, d) => 4 * m * ein.getOrElse(c, 0L) - d * d }.sum
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"every row matches the local recompute; non-degenerate ($dir)") {
      val (labels, edges) = graphAndLabels(dir)
      val want = gainTable(labels, edges)
      val got = ExtQueries.louvainMove(spark, dir).collect()
        .map(r => r.getLong(0) ->
          (r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4))).toMap
      spark.catalog.clearCache()
      assert(got.keySet == want.keySet, "node universe (labeled subgraph)")
      for ((i, (a, to, g)) <- want) {
        val (ga, gto, gg, moved) = got(i)
        assert((ga, gto, gg) == ((a, to, g)), s"node $i")
        assert(moved == (to != a), s"node $i verdict")
        if (moved) assert(g > 0) else assert(g == 0L)
      }
      assert(want.values.exists(_._3 > 0), "no moves — degenerate fixture")
      assert(want.values.exists(_._3 == 0L), "everything moved")
    }
  }

  test("single-move exactness: delta(Q*4m^2) == 2*gain_num") {
    val (labels, edges) = graphAndLabels("/root/testdata/sf0.001")
    val moves = gainTable(labels, edges).toSeq
      .collect { case (i, (a, to, g)) if g > 0 => (i, a, to, g) }
      .sortBy(-_._4)
    val before = q4m2(labels, edges)
    for ((i, _, to, g) <- Seq(moves.head, moves(moves.size / 2), moves.last)) {
      val after = q4m2(labels + (i -> to), edges)
      assert(after - before == 2 * g,
        s"move of $i: dQ*4m^2 = ${after - before}, want ${2 * g}")
    }
  }
}
