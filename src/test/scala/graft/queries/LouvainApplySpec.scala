package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_louvain_apply` / `e_louvain_collapse` — committing the sweep's
  * moves and condensing the result. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE of both artifacts (moves → best
  *    pick per source community → simultaneous apply → exact integer
  *    decomposition / condensation) at both gate scales;
  *  - TOTAL Q NOT DECREASING on the committed conflict-free subset, as
  *    exact integers on the Q·4m² scale (simultaneous moves interact
  *    through Σtot, so this is the apply step's own obligation — the
  *    single-move theorem lives in LouvainMoveSpec);
  *  - MASS CONSERVATION: the condensed graph's Σweight ≡ m, and each
  *    self-loop ≡ the post-move community's internal edge count;
  *  - non-degeneracy: at least one move commits and some committed move
  *    changes a community's node count.
  */
class LouvainApplySpec extends AnyFunSuite {
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

  /** The LouvainMoveSpec gain table (same device — one rule, two specs). */
  private def gainTable(labels: Map[Long, Int],
      edges: Seq[(Long, Long)]): Map[Long, (Int, Int, Long)] = {
    val m = edges.size.toLong
    val nbrs = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val ki = nbrs.view.mapValues(_.size.toLong).toMap
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

  /** Best positive move per source community: gain DESC, node ASC. */
  private def pickedOf(gains: Map[Long, (Int, Int, Long)]): Map[Long, Int] =
    gains.toSeq.collect { case (i, (a, to, g)) if g > 0 => (a, i, to, g) }
      .groupBy(_._1).values
      .map(_.maxBy { case (_, i, _, g) => (g, -i) })
      .map { case (_, i, to, _) => i -> to }.toMap

  /** Exact decomposition: label → (n_nodes, e_in, d_sum, q·4m² term). */
  private def decomp(labels: Map[Long, Int], edges: Seq[(Long, Long)]):
      (Long, Map[Int, (Long, Long, Long, Long)]) = {
    val m = edges.size.toLong
    val ein = edges.groupBy(e => labels(e._1)).view
      .mapValues(es => es.count(e => labels(e._2) == labels(e._1)).toLong)
    val both = edges ++ edges.map(e => (e._2, e._1))
    val dsum = both.groupBy(e => labels(e._1)).view.mapValues(_.size.toLong)
    val nn = labels.values.groupBy(identity).view.mapValues(_.size.toLong)
    (m, nn.keys.map { c =>
      val (e, d, n) = (ein.getOrElse(c, 0L), dsum.getOrElse(c, 0L), nn(c))
      c -> (n, e, d, 4 * m * e - d * d)
    }.toMap)
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"apply: local recompute + total Q non-decreasing ($dir)") {
      val (labels, edges) = graphAndLabels(dir)
      val pick = pickedOf(gainTable(labels, edges))
      assert(pick.nonEmpty, "no committed moves — degenerate fixture")
      val after = labels ++ pick
      val (m, bdec) = decomp(labels, edges)
      val (_, adec) = decomp(after, edges)
      val affected = (pick.values.toSet ++ pick.keys.map(labels)).toSet
      val got = ExtQueries.louvainApply(spark, dir).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getDouble(8))).toMap
      spark.catalog.clearCache()
      assert(got.keySet == affected, "affected-community universe")
      for ((c, row) <- got) {
        val (bn, be, bd, _) = bdec.getOrElse(c, (0L, 0L, 0L, 0L))
        val (an, ae, ad, _) = adec.getOrElse(c, (0L, 0L, 0L, 0L))
        def q(e: Long, d: Long) =
          (4 * m * e - d * d).toDouble / (4 * m * m).toDouble
        assert(row == ((bn, be, bd, q(be, bd), an, ae, ad, q(ae, ad))),
          s"community $c")
      }
      val tb = bdec.values.map(_._4).sum
      val ta = adec.values.map(_._4).sum
      assert(ta >= tb, s"total Q*4m^2 decreased: $tb -> $ta")
      assert(got.exists { case (_, r) => r._1 != r._5 },
        "no committed move changed a community's node count")
    }

    test(s"collapse: local recompute + mass conservation ($dir)") {
      val (labels, edges) = graphAndLabels(dir)
      val after = labels ++ pickedOf(gainTable(labels, edges))
      val want = edges.groupBy { case (a, b) =>
        val (la, lb) = (after(a), after(b))
        (math.min(la, lb), math.max(la, lb))
      }.view.mapValues(_.size.toLong).toMap
      val got = ExtQueries.louvainCollapse(spark, dir).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      spark.catalog.clearCache()
      assert(got == want, "condensed edge table")
      assert(got.values.sum == edges.size.toLong, "mass conservation")
      val (_, adec) = decomp(after, edges)
      for (((a, b), w) <- got if a == b)
        assert(w == adec(a)._2, s"self-loop of $a must equal e_in")
    }
  }
}
