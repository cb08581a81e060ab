package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_shard_pack` — token-balanced snake shard assignment. Pins that `pos`
  * is the contiguous (n_tokens, doc_id) rank (so the length-segmented
  * two-level device produces EXACTLY the single-sort integers), that the
  * snake formula is applied, that shard CARDINALITIES are balanced to ±1,
  * and that shard TOKEN LOADS are balanced to within two maximum documents —
  * the property the operator exists to buy (a plain doc_id mod S dealer
  * fails the load bound on skewed lengths). */
class ShardPackSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  private val S = ExtQueries.PackShards

  private lazy val rows: Array[(Long, Long, Long, Long)] = {
    val r = ExtQueries.shardPack(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    spark.catalog.clearCache() // the counted frame persists
    r
  }

  test("pos is the contiguous (n_tokens, doc_id) rank; snake shard formula holds") {
    val n = rows.length
    assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq,
      "pos must be a contiguous 1..N permutation")
    val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _, _, _), i) => id -> (i + 1L) }.toMap
    for ((id, _, pos, shard) <- rows) {
      assert(pos == want(id), s"doc $id: two-level pos != single-sort pos")
      val p0 = pos - 1
      val expect = if ((p0 / S) % 2 == 0) p0 % S else S - 1 - p0 % S
      assert(shard == expect, s"doc $id: shard $shard != snake($p0) = $expect")
    }
  }

  test("shard counts balance to ±1 and token loads to within one max document") {
    val byShard = rows.groupBy(_._4)
    assert(byShard.keySet == (0L until S).toSet)
    val counts = byShard.view.mapValues(_.length).values
    assert(counts.max - counts.min <= 1,
      s"shard cardinalities must be dealt evenly: ${byShard.view.mapValues(_.length).toMap}")
    val loads = byShard.view.mapValues(_.map(_._2).sum).toMap
    val maxDoc = rows.map(_._2).max
    assert(loads.values.max - loads.values.min <= 2 * maxDoc,
      s"token loads spread ${loads.values.max - loads.values.min} exceeds two max docs ($maxDoc): $loads")
    // and the snake beats the naive doc_id deal on this data: the mod-S
    // dealer's spread must not be smaller (it ignores lengths entirely)
    val naive = rows.groupBy(_._1 % S).view.mapValues(_.map(_._2).sum).toMap
    assert(loads.values.max - loads.values.min <=
      naive.values.max - naive.values.min,
      "snake spread should not exceed the length-blind mod-S spread")
  }
}
