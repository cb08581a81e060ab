package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_modularity` — the per-cluster decomposition must replay exactly from
  * the collected labeled subgraph (integer counts, one final divide), and
  * the global identities must hold: Σ d_sum = 2m, Σ e_in ≤ m, Q ≤ 1. */
class ModularitySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("cluster rows replay the labeled-subgraph counts; identities hold") {
    val lp = ExtQueries.labelProp(spark, dir).collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getInt(1)).toMap
    val und = ExtQueries.knnGraph(spark, dir).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))))
      .distinct
      .filter { case (a, b) => lp.contains(a) && lp.contains(b) }
    val got = ExtQueries.modularity(spark, dir).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    spark.catalog.clearCache()

    val m = und.length.toLong
    val eIn = und.filter { case (a, b) => lp(a) == lp(b) }
      .groupBy(p => lp(p._1)).view.mapValues(_.length.toLong).toMap
    val dSum = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(lp).view.mapValues(_.length.toLong).toMap
    val nNodes = lp.values.groupBy(x => x).view.mapValues(_.size.toLong).toMap

    assert(got.map(_._1).toSet == nNodes.keySet)
    for ((label, (n, e, d, q)) <- got) {
      assert(n == nNodes(label))
      assert(e == eIn.getOrElse(label, 0L), s"cluster $label e_in")
      assert(d == dSum.getOrElse(label, 0L), s"cluster $label d_sum")
      assert(q == (4L * m * e - d * d).toDouble / (4L * m * m).toDouble)
    }
    assert(got.map(_._2._3).sum == 2 * m, "handshake: sum of degrees = 2m")
    assert(got.map(_._2._2).sum <= m)
    val qTotal = got.map(_._2._4).sum
    assert(qTotal <= 1.0, s"Q = $qTotal out of range")
  }
}
