package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_cosine_topk_agg` must be row-for-row identical to `e_cosine_topk` —
  * same query, different execution (bounded-state aggregate vs ranking
  * window). Bit-equality of the score doubles is part of the contract. */
class CosineTopkAggSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("aggregate execution is bit-identical to the window execution") {
    val window = ExtQueries.cosineTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val agg = ExtQueries.cosineTopkAgg(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(agg.toSeq == window.toSeq)
    // the sf0.001 corpus exceeds the aggregator's 4k compaction cap per
    // query, so this equality exercises the compaction path distributed
    assert(window.length == 80)
  }
}
