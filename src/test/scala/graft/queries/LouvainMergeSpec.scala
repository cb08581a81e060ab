package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_louvain_merge` — the mutual-best matching commit. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE (condensed graph → per-community
  *    best merges → mutual pairs → relabel → decomposition) at both gate
  *    scales;
  *  - PER-PAIR EXACTNESS: because a matching's merges are disjoint, each
  *    committed pair's realized Δ(Q·4m²) equals 2·gain_num EXACTLY (not
  *    merely non-decreasing — the property that separates this subset
  *    rule from `e_louvain_apply`'s), checked as pure int64 arithmetic
  *    from the artifact's own before/after integers;
  *  - the matching is genuinely a matching (accepted pairs disjoint) and
  *    non-empty at both scales;
  *  - the CC counterexample holds: collapsing the FULL best-merge graph
  *    by connected components would DECREASE total Q on this fixture —
  *    the wrong-subset trap the scaladoc warns about is real.
  */
class LouvainMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def superTable(cg: Map[(Int, Int), Long]):
      (Long, Map[Int, Long], Map[Int, (Int, Long)]) = {
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
      if (top._1 > 0) Some(c -> (top._2, top._1)) else None
    }.toMap
    (m, deg, best)
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + per-pair exactness ($dir)") {
      val cg = ExtQueries.louvainCollapse(spark, dir).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val got = ExtQueries.louvainMerge(spark, dir).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getDouble(8))).toMap
      spark.catalog.clearCache()
      val (m, _, best) = superTable(cg)
      val mutual = best.toSeq.collect {
        case (c, (p, g)) if c < p && best.get(p).exists(_._1 == c) =>
          (c, p, g)
      }
      assert(mutual.nonEmpty, "no mutual-best pairs — degenerate fixture")
      val touched = mutual.flatMap { case (a, b, _) => Seq(a, b) }
      assert(touched.distinct.size == touched.size, "not a matching")
      assert(got.keySet == touched.toSet, "affected-community universe")
      for ((lo, hi, g) <- mutual) {
        val (lN, lE, lD, _, laN, laE, laD, _) = got(lo)
        val (hN, hE, hD, _, haN, haE, haD, _) = got(hi)
        // absorbed community zeros out; survivor carries the union
        assert((haN, haE, haD) == ((0L, 0L, 0L)), s"absorbed $hi post-state")
        assert(laN == lN + hN && laD == lD + hD, s"merged sizes of ($lo,$hi)")
        val w = cg.getOrElse((lo, hi), 0L)
        assert(laE == lE + hE + w, s"merged e_in of ($lo,$hi)")
        // EXACT realized improvement on the Q·4m² scale
        val before = (4 * m * lE - lD * lD) + (4 * m * hE - hD * hD)
        val after = 4 * m * laE - laD * laD
        assert(after - before == 2 * g,
          s"pair ($lo,$hi): realized ${after - before}, want ${2 * g}")
      }
    }
  }

  test("the CC alternative decreases Q — the matching rule is load-bearing (sf0.001)") {
    val cg = ExtQueries.louvainCollapse(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache()
    val (m, deg, best) = superTable(cg)
    // union-find over ALL best-merge edges (the tempting wrong subset)
    val par = scala.collection.mutable.Map(deg.keys.map(c => c -> c).toSeq: _*)
    def find(x: Int): Int = if (par(x) == x) x else { par(x) = find(par(x)); par(x) }
    for ((c, (p, _)) <- best) {
      val (ra, rb) = (find(c), find(p))
      if (ra != rb) par(math.max(ra, rb)) = math.min(ra, rb)
    }
    val groups = deg.keys.groupBy(find).values.map(_.toSeq).filter(_.size > 1)
    val realized = groups.map { gs =>
      gs.combinations(2).map { case Seq(a, b) =>
        val w = cg.getOrElse((math.min(a, b), math.max(a, b)), 0L)
        2 * (2 * m * w - deg(a) * deg(b))
      }.sum
    }.sum
    assert(realized < 0,
      s"CC collapse should decrease Q on this fixture (got $realized) — " +
        "if this flips, the scaladoc's counterexample claim must be rechecked")
  }
}
