package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_interleave_sig` — the sign-test verdict over interleaved credits.
  * Recomputes the win/tie counts and z from the composed `e_interleave`
  * output and pins the degenerate all-ties experiment to z = NULL, not
  * an abort (driven through the factored credit-frame entry point). */
class InterleaveSigSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("verdict row equals the recomputation from the blended lists") {
    val credits = ExtQueries.interleave(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val perQ = credits.groupBy(_._1).view.mapValues { rows =>
      (rows.count(_._2 == "sparse").toLong, rows.count(_._2 == "dense").toLong)
    }.toMap
    val sw = perQ.values.count { case (s, d) => s > d }.toLong
    val dw = perQ.values.count { case (s, d) => d > s }.toLong
    val ties = perQ.values.count { case (s, d) => s == d }.toLong

    val row = ExtQueries.interleaveSig(spark, dir).collect()
    assert(row.length == 1)
    val r = row.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((perQ.size.toLong, sw, dw, ties)))
    if (sw + dw > 0) {
      assert(r.getDouble(4) == (sw - dw).toDouble / math.sqrt((sw + dw).toDouble))
      assert(sw + dw > 0L, "fixture must yield a non-degenerate verdict")
    } else assert(r.isNullAt(4))
  }

  test("all-ties degenerate experiment pins z = NULL, not an abort") {
    import spark.implicits._
    // two queries, each crediting both teams equally
    val blended = Seq(
      (0L, "sparse"), (0L, "dense"), (1L, "sparse"), (1L, "dense"))
      .toDF("qid", "team")
    val r = ExtQueries.interleaveSigOf(blended).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 0L, 0L, 2L)))
    assert(r.isNullAt(4), "all-ties must yield NULL z")
  }
}
