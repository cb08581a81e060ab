package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_epoch_mix` semantics: the repeat plan must actually rebalance —
  * integer repeats bracket the epoch weight, the dominant source stays at
  * exactly one epoch, and realized per-source repeat totals track w·n. */
class EpochMixSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    ExtQueries.epochMix(spark, dir)
      .select("doc_id", "source", "epochs", "n_repeats").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))

  test("repeat counts bracket the epoch weight; cap respected") {
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, w, k) =>
      assert(w >= 1.0 && w <= ExtQueries.EpochCap, s"doc $id epochs $w")
      assert(k == math.floor(w).toLong || k == math.floor(w).toLong + 1,
        s"doc $id: $k repeats for weight $w")
    }
  }

  test("the largest source runs exactly one epoch; others are upsampled toward it") {
    val bySource = rows.groupBy(_._2)
    val dominant = bySource.minBy { case (_, rs) => rs.head._3 } // epochs = 1.0
    assert(dominant._2.forall { case (_, _, w, k) => w == 1.0 && k == 1L })
    // realized repeats per source ≈ w · n (hash fate is uniform; the
    // fixture sources are large enough for a loose band)
    bySource.foreach { case (src, rs) =>
      val want = rs.head._3 * rs.length
      val got = rs.map(_._4).sum.toDouble
      assert(math.abs(got - want) <= math.max(4.0, 0.25 * want),
        s"$src: realized $got vs expected $want")
    }
  }
}
