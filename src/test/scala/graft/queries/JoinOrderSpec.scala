package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_join_order` — the order-selection audit. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE: thresholds, per-dim
  *    selectivities, all seven prefix counts, and every permutation's
  *    estimated (left-associative IEEE products) and actual cost,
  *    re-derived from collected keys at both gate scales;
  *  - the MOTIVATING CLAIM: the estimate-chosen order IS the
  *    actually-cheapest order (exactly one row has each flag, and they
  *    coincide) — the decision the whole CBO family exists to make;
  *  - the estimates are TIGHT here (every permutation within 5% of its
  *    actual cost — uniform FK distributions are the regime where
  *    Selinger independence is correct, stated in the scaladoc);
  *  - the ranking is non-trivial: cheapest ≠ most expensive by > 1.5×.
  */
class JoinOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + chosen == cheapest ($dir)") {
      val part = RefQueries.table(spark, dir, "part")
        .select("p_partkey", "p_size").collect()
        .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue)
      val supp = RefQueries.table(spark, dir, "supplier")
        .select("s_suppkey", "s_nationkey").collect()
        .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue)
      val ords = RefQueries.table(spark, dir, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate)
      val li = RefQueries.table(spark, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val got = ExtQueries.joinOrder(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getDouble(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))
        .toMap
      spark.catalog.clearCache()

      val tp = part.map(_._2).min + (part.map(_._2).max - part.map(_._2).min + 1) / 5
      val tn = supp.map(_._2).min + (supp.map(_._2).max - supp.map(_._2).min + 1) / 3
      val (dlo, dhi) = (ords.map(_._2).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay)),
        ords.map(_._2).max(Ordering.by((d: java.time.LocalDate) => d.toEpochDay)))
      val td = dlo.plusDays((dhi.toEpochDay - dlo.toEpochDay) * 2 / 5)
      val pk = part.collect { case (k, v) if v <= tp => k }.toSet
      val sk = supp.collect { case (k, v) if v <= tn => k }.toSet
      val ok = ords.collect { case (k, d) if !d.isAfter(td) => k }.toSet
      val sel = Map('p' -> (pk.size.toDouble / part.length),
        's' -> (sk.size.toDouble / supp.length),
        'o' -> (ok.size.toDouble / ords.length))
      def flags(r: (Long, Long, Long)) =
        Map('p' -> pk(r._1), 's' -> sk(r._2), 'o' -> ok(r._3))
      def actPrefix(pre: String): Long =
        li.count(r => pre.forall(flags(r))).toLong
      val n = li.length.toDouble
      for (p <- Seq("pso", "pos", "spo", "sop", "ops", "osp")) {
        val Seq(r1, r2, r3) = p.map(sel).toSeq
        val est = n * r1 + n * r1 * r2 + n * r1 * r2 * r3
        val act = actPrefix(p.take(1)) + actPrefix(p.take(2)) + actPrefix(p)
        assert(got(p)._1 == est && got(p)._2 == act, s"perm $p")
        assert(math.abs(got(p)._1 / got(p)._2 - 1.0) < 0.05,
          s"perm $p estimate off by >5%: ${got(p)._1} vs ${got(p)._2}")
      }
      val chosen = got.filter(_._2._3).keys.toSeq
      val cheapest = got.filter(_._2._4).keys.toSeq
      assert(chosen.size == 1 && cheapest.size == 1 && chosen == cheapest,
        s"chosen $chosen vs cheapest $cheapest")
      val costs = got.values.map(_._2)
      assert(costs.max.toDouble / costs.min.toDouble > 1.5,
        "ranking is trivial — orders cost the same")
    }
  }
}
