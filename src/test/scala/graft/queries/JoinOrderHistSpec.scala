package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_join_order_hist` — histogram-driven join ordering. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE of all six permutation rows
  *    (medians at exact ⌈n/2⌉ ranks, the B² grid's fixed-point estimate,
  *    all seven prefix counts, and both pricing formulas with the same
  *    left-associative IEEE operation order) at both gate scales;
  *  - the FLIP that makes the key non-vacuous: the independence pick is
  *    NOT the actually-cheapest order (it front-loads the correlated
  *    chars→tokens pair), the histogram pick IS, and the histogram
  *    pick's actual cost is strictly below the independence pick's —
  *    the multi-column statistic genuinely changes the decision, not
  *    just the numbers.
  */
class JoinOrderHistSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + decision flip ($dir)") {
      val rows = RefQueries.table(spark, dir, "documents")
        .select("n_chars", "text", "lang").collect()
        .map(r => (r.getLong(0),
          r.getString(1).trim.split("\\s+").length.toLong, r.getString(2)))
      val got = ExtQueries.joinOrderHist(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
          r.getLong(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
        .toMap
      spark.catalog.clearCache()

      val b = ExtQueries.RangeEstBuckets
      val sc = ExtQueries.RangeEstFpScale
      val n = rows.length
      val ach = rows.map(_._1).sorted
      val atk = rows.map(_._2).sorted
      val tc = ach(math.ceil(n * 0.5).toInt - 1)
      val tt = atk(math.ceil(n * 0.5).toInt - 1)
      val (loa, hia, lob, hib) = (ach.head, ach.last, atk.head, atk.last)
      val wa = (hia - loa + b) / b
      val wb = (hib - lob + b) / b
      val estFp = rows.groupBy { case (c, t, _) =>
        ((c - loa) / wa, (t - lob) / wb) }.map { case ((i, j), vs) =>
        val ova = math.max(0L,
          math.min(loa + (i + 1) * wa - 1, hia) - math.max(loa + i * wa, tc) + 1)
        val ovb = math.max(0L,
          math.min(lob + (j + 1) * wb - 1, hib) - math.max(lob + j * wb, tt) + 1)
        vs.size * ova * ovb * sc / (wa * wb)
      }.sum
      val g = estFp.toDouble / sc
      val excl = ExtQueries.JoinOrderHistLang
      def cnt(p: (Long, Long, String) => Boolean) = rows.count(p.tupled).toLong
      val c = Map(
        'c' -> cnt((ch, _, _) => ch >= tc),
        't' -> cnt((_, tk, _) => tk >= tt),
        'l' -> cnt((_, _, lg) => lg != excl))
      val pair = Map(
        "cl" -> cnt((ch, _, lg) => ch >= tc && lg != excl),
        "ct" -> cnt((ch, tk, _) => ch >= tc && tk >= tt),
        "lt" -> cnt((_, tk, lg) => tk >= tt && lg != excl))
      val cClt = cnt((ch, tk, lg) => ch >= tc && tk >= tt && lg != excl)

      val nD = n.toDouble
      def s(d: Char) = c(d).toDouble / nD
      val perms = ExtQueries.JoinOrderHistPerms
      val want = perms.map { p =>
        val e1 = nD * s(p(0)); val e2 = e1 * s(p(1))
        val ei = e1 + e2 + e2 * s(p(2))
        val e2h = if (Set(p(0), p(1)) == Set('c', 't')) g else e2
        val eh = e1 + e2h + g * s('l')
        val act = c(p(0)) + pair(p.take(2).sorted) + cClt
        p -> (ei, eh, act)
      }.toMap
      val (mi, mh, ma) = (want.values.map(_._1).min,
        want.values.map(_._2).min, want.values.map(_._3).min)
      for (p <- perms) {
        val (ei, eh, act) = want(p)
        assert(got(p) == ((ei, eh, act, ei == mi, eh == mh, act == ma)),
          s"perm $p: ${got(p)} vs ${(ei, eh, act, ei == mi, eh == mh, act == ma)}")
      }

      val indepPick = perms.find(p => got(p)._4).get
      val histPick = perms.find(p => got(p)._5).get
      val cheapest = perms.find(p => got(p)._6).get
      assert(histPick == cheapest, "histogram must pick the cheapest order")
      assert(indepPick != cheapest,
        "independence picked right — fixture no longer correlated, recheck")
      assert(got(histPick)._3 < got(indepPick)._3,
        "histogram pick must be strictly cheaper in actual cost")
    }
  }
}
