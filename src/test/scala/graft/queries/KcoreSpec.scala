package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_kcore` — fixed-round k-core peel over the knn substrate. The pins:
  * a LOCAL replay of the peel (undirected edges from the graded adjacency,
  * iterate delete-below-K) must match; the pinned round count must REACH
  * the peel's fixpoint on the fixture (so the emitted flag is true k-core
  * membership at the gate scale); the k-core property itself (induced
  * min-degree ≥ K over the survivors); and non-degeneracy. */
class KcoreSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
  test(s"peel matches the local replay and reaches its fixpoint in the pinned rounds ($dir)") {
    val adj = ExtQueries.knnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dir0 = adj.toSet
    // mutual graph: reciprocated directed edges only
    val und: Set[(Long, Long)] = dir0.filter { case (s, n) => dir0((n, s)) }
    def degrees(alive: Set[Long]): Map[Long, Int] =
      und.toSeq.filter { case (s, n) => alive(s) && alive(n) }
        .groupBy(_._1).view.mapValues(_.size).toMap
    def peel(alive: Set[Long]): Set[Long] =
      degrees(alive).collect {
        case (v, d) if d >= ExtQueries.KcoreK => v
      }.toSet

    val nodes0 = und.map(_._1)
    var alive = nodes0
    for (_ <- 1 to ExtQueries.KcoreRounds) alive = peel(alive)
    // fixpoint within the pinned rounds: one more peel changes nothing,
    // so the flag IS the true k-core membership at this scale
    assert(peel(alive) == alive,
      s"peel not converged after ${ExtQueries.KcoreRounds} rounds — raise KcoreRounds")
    // k-core property: the induced subgraph keeps min degree >= K
    val finalDeg = degrees(alive)
    assert(alive.forall(v => finalDeg.getOrElse(v, 0) >= ExtQueries.KcoreK))

    val got = ExtQueries.kcore(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    spark.catalog.clearCache()
    val deg0 = und.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val allIds = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    spark.catalog.clearCache()
    assert(got.keySet == allIds, "one verdict row per corpus vector")
    for ((v, (d0, core)) <- got) {
      assert(d0 == deg0.getOrElse(v, 0L), s"deg0 mismatch at $v")
      assert((core == 1L) == alive(v), s"in_core mismatch at $v")
    }
    // non-degenerate fixture: the peel removes some nodes and keeps some
    assert(alive.nonEmpty, "fixture must keep a core")
    assert(alive.size < nodes0.size, "fixture must peel something")
  }
}
