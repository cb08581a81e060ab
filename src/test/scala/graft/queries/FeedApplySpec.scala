package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_feed_apply` — the change-feed consumer maintaining the (lang,
  * source) aggregate across versions. Pins:
  *
  *  - MAINTAINED ≡ RECOMPUTED at EVERY version: the folded state equals a
  *    direct group-by over the AS-OF snapshot (`snapshotAsOf`) for v =
  *    0..N at both gate scales — the invariant that makes a CDC-fed
  *    materialized view trustworthy (the driver's DuckDB gate re-proves
  *    this against the independent sequential replay);
  *  - the RETRACTION ALGEBRA is exercised, not just inserts: some group's
  *    count strictly drops across consecutive versions (a delete
  *    retracted) and some group's char sum changes while its count does
  *    not (an update's preimage ⊖ postimage ⊕ netting to zero docs);
  *  - version-0 state IS the base table's aggregate;
  *  - no zero-count groups survive (the state drops what the recompute's
  *    GROUP BY never sees).
  */
class FeedApplySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def collectState(dir: String): Map[(Long, String, String), (Long, Long, Double)] = {
    val rows = ExtQueries.feedApply(spark, dir).collect()
    spark.catalog.clearCache()
    rows.map(r => (r.getLong(0), r.getString(1), r.getString(2)) ->
      (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"maintained == recomputed-from-AS-OF at every version ($dir)") {
      val got = collectState(dir)
      val want = (0 to ExtQueries.TimeTravelVersions).flatMap { v =>
        val snap = ExtQueries.snapshotAsOf(spark, dir, v)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
          .collect()
        spark.catalog.clearCache()
        snap.map(r => (v.toLong, r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3)))
      }.toMap
      assert(got.keySet == want.keySet, "state key universe")
      for ((k, (n, s)) <- want) {
        val (gn, gs, ga) = got(k)
        assert((gn, gs) == ((n, s)), s"group $k")
        assert(ga == s.toDouble / n.toDouble, s"mean of $k")
        assert(gn > 0, s"zero-count group $k survived")
      }
    }

    test(s"retraction algebra is exercised ($dir)") {
      val got = collectState(dir)
      val byGroup = got.groupBy { case ((_, l, s), _) => (l, s) }
      val steps = for {
        ((l, s), m) <- byGroup.toSeq
        v <- 1L to ExtQueries.TimeTravelVersions.toLong
        prev <- m.get((v - 1, l, s)); cur <- m.get((v, l, s))
      } yield (prev, cur)
      assert(steps.exists { case (p, c) => c._1 < p._1 },
        "no group's count ever dropped — deletes never retracted")
      assert(steps.exists { case (p, c) => c._1 > p._1 },
        "no group's count ever grew — inserts never applied")
      assert(steps.exists { case (p, c) => c._1 == p._1 && c._2 != p._2 },
        "no update netted zero docs with a char delta — " +
          "preimage/postimage pair never exercised")
    }
  }

  test("version-0 state is the base aggregate (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = collectState(dir).collect { case ((0L, l, s), v) => (l, s) -> v }
    val base = RefQueries.table(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    spark.catalog.clearCache()
    assert(got.keySet == base.keySet)
    for ((k, (n, s)) <- base) assert((got(k)._1, got(k)._2) == ((n, s)), s"$k")
  }
}
