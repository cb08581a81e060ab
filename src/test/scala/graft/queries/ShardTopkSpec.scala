package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_shard_topk` — scatter-gather exact serving. The pins: (1) the
  * MERGEABILITY theorem — gathering per-shard bounded top-k lists equals
  * the unsharded exact serve row-for-row (modulo the shard routing
  * column); (2) the shard column is the pure cid hash; (3) the plan is
  * the serve shape that survives scale — queries broadcast, bounded-state
  * aggregates, no ranking window, no sort-merge join on the corpus. */
class ShardTopkSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("gathered per-shard top-k equals the unsharded exact serve") {
    val got = ExtQueries.shardTopk(spark, dir).collect()
    val want = ExtQueries.cosineTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    spark.catalog.clearCache()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getInt(3))).toSeq == want.toSeq,
      "scatter-gather must equal the exact serve (mergeability)")
    // the routing column is derived, never carried: cid mod ShardCount
    assert(got.forall(r =>
      r.getLong(4) == r.getLong(1) % ExtQueries.ShardCount))
    // non-vacuous sharding: winners come from more than one shard
    assert(got.map(_.getLong(4)).distinct.length > 1,
      "fixture must spread winners across shards")
  }

  test("plan: broadcast queries, bounded-state aggregates, window-free") {
    val plan = ExtQueries.shardTopk(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    spark.catalog.clearCache()
    assert(plan.contains("BroadcastExchange"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"),
      "corpus must never sort-merge-join in a serve")
    assert(!plan.contains("Window"),
      "both selection stages are bounded-state aggregates, not windows")
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
  }
}
