package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_incr_agg` — commutative-monoid partial-aggregate maintenance. The
  * DuckDB oracle states the spec (single-pass full recompute); this suite
  * pins the algebra that makes the incremental execution trust-worthy:
  * merge ≡ recompute, merge is split-shape-invariant (associativity), and
  * the fixture's batch slice genuinely overlaps the state's groups (so the
  * merge actually exercises ⊕, not a disjoint union). */
class IncrAggSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private type Key = (java.sql.Date, String)
  private case class P(n: Long, sum: Long, max: Long)

  /** Driver-side sequential partials of one slice. */
  private def partials(rows: Seq[(java.sql.Date, String, Long)]): Map[Key, P] =
    rows.groupBy(r => (r._1, r._2)).view.mapValues { g =>
      P(g.size.toLong, g.map(_._3).sum, g.map(_._3).max)
    }.toMap

  private def mergeP(a: Map[Key, P], b: Map[Key, P]): Map[Key, P] =
    (a.keySet ++ b.keySet).map { k =>
      val (x, y) = (a.get(k), b.get(k))
      k -> ((x, y) match {
        case (Some(p), Some(q)) => P(p.n + q.n, p.sum + q.sum, math.max(p.max, q.max))
        case (Some(p), None) => p
        case (None, Some(q)) => q
      })
    }.toMap

  private lazy val fixture: Seq[(Long, java.sql.Date, String, Long)] =
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), to_date(col("ts")).as("day"), col("event_type"),
        floor(col("value") * lit(ExtQueries.IncrAggScale.toDouble) + 0.5)
          .cast("long").as("vfp"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getString(2), r.getLong(3)))

  private lazy val got: Map[Key, (Long, Long, Long, Double)] =
    ExtQueries.incrAgg(spark, dir).collect()
      .map(r => ((r.getDate(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap

  test("merged state+batch equals the sequential full recompute, bytes and all") {
    val full = partials(fixture.map(t => (t._2, t._3, t._4)))
    assert(got.keySet == full.keySet)
    full.foreach { case (k, p) =>
      val (n, s, m, avg) = got(k)
      assert((n, s, m) == ((p.n, p.sum, p.max)), s"group $k partials")
      assert(avg == p.sum.toDouble / (p.n * ExtQueries.IncrAggScale).toDouble,
        s"group $k finalized mean must be the one pinned divide")
    }
  }

  test("merge is split-shape-invariant: any 3-way partition lands on the same state") {
    val slices = (0 until 3).map { i =>
      partials(fixture.filter(_._1 % 3 == i).map(t => (t._2, t._3, t._4)))
    }
    val leftFold = mergeP(mergeP(slices(0), slices(1)), slices(2))
    val rightFold = mergeP(slices(0), mergeP(slices(1), slices(2)))
    assert(leftFold == rightFold, "monoid associativity")
    leftFold.foreach { case (k, p) =>
      val (n, s, m, _) = got(k)
      assert((n, s, m) == ((p.n, p.sum, p.max)), s"group $k vs operator output")
    }
  }

  test("the fixture's batch slice overlaps the state's groups (merge exercises both sides)") {
    val stateKeys = partials(
      fixture.filter(t => t._1 % 10 < 8).map(t => (t._2, t._3, t._4))).keySet
    val batchKeys = partials(
      fixture.filter(t => t._1 % 10 >= 8).map(t => (t._2, t._3, t._4))).keySet
    val shared = stateKeys & batchKeys
    assert(shared.nonEmpty, "an orthogonal split must put partials of the same group on both sides")
    assert(shared.size * 2 > batchKeys.size, "most batch groups should also exist in state")
  }
}
