package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_zorder` correctness against an independent Scala re-implementation of
  * the Morton interleave, plus the structural property that makes the key a
  * LAYOUT key: it is a bijection on the (uid16, day16) grid, so sorting by
  * it loses no dimension information. */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  /** Reference interleave, written independently of the Column formula:
    * x into odd bit positions, y into even. */
  private def morton(x: Long, y: Long): Long =
    (0 until ExtQueries.ZOrderBits).map { i =>
      (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }.sum

  test("zkey matches the reference interleave on every fixture row") {
    val rows = ExtQueries.zorder(spark, dir)
      .select("uid16", "day16", "zkey").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == morton(x, y), s"uid16=$x day16=$y: got $z, want ${morton(x, y)}")
    }
  }

  test("zkey is a bijection on the (uid16, day16) grid") {
    val rows = ExtQueries.zorder(spark, dir)
      .select("uid16", "day16", "zkey").distinct().collect()
    val dims = rows.map(r => (r.getLong(0), r.getLong(1))).distinct
    val keys = rows.map(_.getLong(2)).distinct
    assert(dims.length == keys.length,
      s"${dims.length} distinct dim pairs vs ${keys.length} distinct zkeys")
  }

  test("output is sorted by (zkey, event_id)") {
    val got = ExtQueries.zorder(spark, dir)
      .select("zkey", "event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(got.sortBy(identity)))
  }
}
