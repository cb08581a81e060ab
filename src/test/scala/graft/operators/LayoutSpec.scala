package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.queries.ExtQueries

/** The z-order layout's REASON to exist, measured on the written files:
  * one clustered write whose per-file min-max ranges prune point
  * predicates on BOTH woven dimensions, where the arrival-order layout
  * serves at most its (time-correlated) leading dimension. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("z-order layout beats arrival order on two-dimensional pruning") {
    val z = ExtQueries.zorder(spark, dir) // event_id, uid16, day16, zkey
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    // event_id is arrival order (time-correlated): the status-quo layout
    Layout.clusteredWrite(z, "zkey", 8, s"$tmp/zord")
    Layout.clusteredWrite(z, "event_id", 8, s"$tmp/naive")

    def cost(path: String, dim: String): Double =
      Layout.avgMatchFraction(spark, path, dim)

    val (zUid, zDay) = (cost(s"$tmp/zord", "uid16"), cost(s"$tmp/zord", "day16"))
    val (nUid, nDay) = (cost(s"$tmp/naive", "uid16"), cost(s"$tmp/naive", "day16"))

    // arrival order cannot prune the user dimension at all — every file
    // sees every user; the z-order layout must prune it strictly
    assert(nUid >= 0.99, s"fixture invariant: naive uid cost $nUid")
    assert(zUid < nUid, s"z-order uid cost $zUid vs naive $nUid")
    // and summed over both dimensions the woven layout must win overall —
    // the "one layout, two predicate columns" claim
    assert(zUid + zDay < nUid + nDay,
      s"z-order total ${zUid + zDay} vs naive total ${nUid + nDay}")
  }

  test("clustered write yields disjoint per-file key ranges") {
    val z = ExtQueries.zorder(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout2").toString
    Layout.clusteredWrite(z, "zkey", 4, s"$tmp/zord")
    val bounds = Layout.fileBounds(spark, s"$tmp/zord", Seq("zkey"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(bounds.length >= 2)
    bounds.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file ranges overlap: max $hi vs next min $lo2")
      case _ =>
    }
  }
}
