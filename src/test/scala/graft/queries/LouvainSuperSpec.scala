package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_louvain_super` — the weighted sweep over the condensed graph (the
  * Blondel recursion). Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE from the collected condensed
  *    graph (degrees, mass, merge gains, argmax) at both gate scales;
  *  - the MERGE-EXACTNESS theorem: applying any one emitted merge to the
  *    underlying post-move partition changes the modularity
  *    decomposition by exactly 2·gain_num on the Q·4m² integer scale —
  *    checked for best/median/last merges against the ORIGINAL graph
  *    (the condensed arithmetic and the node-level partition agree);
  *  - degree consistency: the condensed degree of every community equals
  *    its d_sum in the node-level decomposition;
  *  - non-degeneracy: merges and stays both occur, merges carry strictly
  *    positive gain.
  */
class LouvainSuperSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def condensed(dir: String): Map[(Int, Int), Long] = {
    val rows = ExtQueries.louvainCollapse(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache()
    rows
  }

  private def superTable(cg: Map[(Int, Int), Long]):
      (Long, Map[Int, Long], Map[Int, (Int, Long, Long)]) = {
    val m = cg.values.sum
    val deg = cg.toSeq.flatMap { case ((a, b), w) =>
      if (a == b) Seq(a -> 2 * w) else Seq(a -> w, b -> w)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val table = deg.keys.map { c =>
      val cands = cg.toSeq.collect {
        case ((a, b), w) if a == c && b != c => (b, w)
        case ((a, b), w) if b == c && a != c => (a, w)
      }.map { case (p, w) => (2 * m * w - deg(c) * deg(p), p, w) }
      val best = if (cands.isEmpty) (0L, c, 0L)
        else cands.maxBy { case (g, p, _) => (g, -p.toLong) }
      val (g, p, w) = if (best._1 > 0) best else (0L, c, 0L)
      c -> (p, w, g)
    }.toMap
    (m, deg, table)
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute; non-degenerate ($dir)") {
      val (_, _, want) = superTable(condensed(dir))
      val got = ExtQueries.louvainSuper(spark, dir).collect()
        .map(r => r.getInt(0) ->
          (r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      spark.catalog.clearCache()
      assert(got.keySet == want.keySet, "community universe")
      for ((c, (p, w, g)) <- want) {
        val (gp, gw, gg, merged) = got(c)
        assert((gp, gw, gg) == ((p, w, g)), s"community $c")
        assert(merged == (p != c), s"community $c verdict")
        if (merged) assert(g > 0) else assert(g == 0L)
      }
      assert(want.values.exists(_._3 > 0), "no merges — degenerate fixture")
      assert(want.values.exists(_._3 == 0L), "everything merged")
    }
  }

  test("merge exactness vs the node-level partition (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    // the post-move partition the condensed graph summarizes
    val labels = ExtQueries.labelProp(spark, dir).collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = ExtQueries.knnGraph(spark, dir).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).distinct
      .filter { case (a, b) => labels.contains(a) && labels.contains(b) }
    val moves = ExtQueries.louvainMove(spark, dir).collect()
      .filter(_.getBoolean(4))
      .map(r => (r.getInt(1), r.getLong(0), r.getInt(2), r.getLong(3)))
    spark.catalog.clearCache()
    val picked = moves.groupBy(_._1).values
      .map(_.maxBy { case (_, i, _, g) => (g, -i) })
      .map { case (_, i, to, _) => i -> to }.toMap
    val after = labels ++ picked

    def q4m2(lab: Map[Long, Int]): Long = {
      val m = edges.size.toLong
      val ein = edges.groupBy(e => lab(e._1)).view
        .mapValues(es => es.count(e => lab(e._2) == lab(e._1)).toLong)
      val both = edges ++ edges.map(e => (e._2, e._1))
      val dsum = both.groupBy(e => lab(e._1)).view.mapValues(_.size.toLong)
      dsum.map { case (c, d) => 4 * m * ein.getOrElse(c, 0L) - d * d }.sum
    }
    val cg = condensed(dir)
    val (_, deg, table) = superTable(cg)

    // degree consistency: condensed degree == node-level d_sum
    val both = edges ++ edges.map(e => (e._2, e._1))
    val dsum = both.groupBy(e => after(e._1)).view.mapValues(_.size.toLong).toMap
    assert(deg == dsum, "condensed degrees must equal node-level d_sum")

    val merges = table.toSeq.collect {
      case (c, (p, _, g)) if g > 0 => (c, p, g) }.sortBy(-_._3)
    val before = q4m2(after)
    for ((c, p, g) <- Seq(merges.head, merges(merges.size / 2), merges.last)) {
      val merged = after.view.mapValues(l => if (l == c) p else l).toMap
      assert(q4m2(merged) - before == 2 * g,
        s"merge $c->$p: realized ${q4m2(merged) - before}, want ${2 * g}")
    }
  }
}
