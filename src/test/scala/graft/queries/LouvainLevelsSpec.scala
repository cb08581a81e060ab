package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_louvain_levels` — the unrolled multi-level Blondel hierarchy. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE of every level from the graded
  *    `e_louvain_collapse` condensed graph: per transition the weighted
  *    sweep's best merges, the mutual-best matching, the relabel +
  *    re-condense, and each level's decomposition read off its condensed
  *    graph — all columns including the exact-double q_c, at both gate
  *    scales;
  *  - MASS CONSERVATION across contraction: Σ d_sum ≡ 2m and Σ n_nodes
  *    constant at every level;
  *  - total Q NON-DECREASING level-over-level, and STRICTLY increasing
  *    across transition 1 (≥1 merge commits at both gate scales — the
  *    hierarchy is real, not a fixpoint echo);
  *  - the community count strictly decreases across transition 1.
  */
class LouvainLevelsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** One local transition: mutual-best matching over the condensed graph,
    * then relabel + re-condense (the LouvainMergeSpec superTable device
    * chained). */
  private def transition(cg: Map[(Int, Int), Long],
      sizes: Map[Int, Long]): (Map[(Int, Int), Long], Map[Int, Long]) = {
    val m = cg.values.sum
    val deg = cg.toSeq.flatMap { case ((a, b), w) =>
      if (a == b) Seq(a -> 2 * w) else Seq(a -> w, b -> w)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val best = deg.keys.flatMap { c =>
      val cands = cg.toSeq.collect {
        case ((a, b), w) if a == c && b != c => (b, w)
        case ((a, b), w) if b == c && a != c => (a, w)
      }.map { case (p, w) => (2 * m * w - deg(c) * deg(p), p) }
      val top = if (cands.isEmpty) (0L, c)
        else cands.maxBy { case (g, p) => (g, -p.toLong) }
      if (top._1 > 0) Some(c -> top._2) else None
    }.toMap
    val toLo = best.toSeq.collect {
      case (c, p) if c < p && best.get(p).contains(c) => p -> c
    }.toMap
    def mp(c: Int) = toLo.getOrElse(c, c)
    val cg2 = cg.toSeq.map { case ((a, b), w) =>
      val (na, nb) = (mp(a), mp(b))
      (math.min(na, nb), math.max(na, nb)) -> w
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val sz2 = sizes.toSeq.map { case (c, n) => mp(c) -> n }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    (cg2, sz2)
  }

  /** The decomposition read off a condensed graph: (n_nodes, e_in, d_sum,
    * q_c) per community — the exact-int formula with one IEEE divide. */
  private def report(cg: Map[(Int, Int), Long], sizes: Map[Int, Long])
      : Map[Int, (Long, Long, Long, Double)] = {
    val m = cg.values.sum
    val deg = cg.toSeq.flatMap { case ((a, b), w) =>
      if (a == b) Seq(a -> 2 * w) else Seq(a -> w, b -> w)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    sizes.map { case (c, n) =>
      val e = cg.getOrElse((c, c), 0L)
      val d = deg.getOrElse(c, 0L)
      c -> (n, e, d, (4 * m * e - d * d).toDouble / (4 * m * m).toDouble)
    }
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + invariants ($dir)") {
      val cg0 = ExtQueries.louvainCollapse(spark, dir).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val rows = ExtQueries.louvainLevels(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      spark.catalog.clearCache()
      val byLevel = rows.groupBy(_._1._1).view
        .mapValues(_.map { case ((_, c), v) => c -> v }.toMap).toMap
      assert(byLevel.keySet == (0 to ExtQueries.LouvainLevels)
        .map(_.toLong).toSet)
      // level 0 sizes seed the local chain; everything else recomputes
      val sizes0 = byLevel(0L).map { case (c, (n, _, _, _)) => c -> n }
      var cg = cg0; var sizes = sizes0
      var prevQ = Double.NegativeInfinity
      val m = cg0.values.sum
      for (l <- 0 to ExtQueries.LouvainLevels) {
        if (l > 0) { val t = transition(cg, sizes); cg = t._1; sizes = t._2 }
        val want = report(cg, sizes)
        val got = byLevel(l.toLong)
        assert(got == want, s"level $l decomposition")
        assert(got.values.map(_._3).sum == 2 * m, s"level $l: Σ d_sum ≠ 2m")
        assert(got.values.map(_._1).sum == sizes0.values.sum,
          s"level $l: n_nodes not conserved")
        val q = got.values.map(_._4).sum
        assert(q >= prevQ, s"level $l: total Q decreased ($prevQ → $q)")
        if (l == 1) {
          assert(got.size < byLevel(0L).size,
            "transition 1 committed no merges — degenerate fixture")
          assert(q > byLevel(0L).values.map(_._4).sum,
            "transition 1 did not improve Q")
        }
        prevQ = q
      }
    }
  }
}
