package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_rand_walk` — the walks must be a literal replay of the pinned-hash
  * hop rule over the collected knn edges, every hop must traverse a real
  * edge, and walks from dead-end nodes must END, not pad. */
class RandWalkSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("walks replay the hash-driven hop rule over the real edge list") {
    val edges = ExtQueries.knnGraph(spark, dir)
      .select("src", "nbr", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val deg = edges.keys.groupBy(_._1).map { case (s, ks) => s -> ks.map(_._2).max }
    val starts = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).sorted
    val got = ExtQueries.randWalk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    spark.catalog.clearCache()

    val L = ExtQueries.WalkSteps
    val P = graft.functions.GraftFunctions.IntModulus
    val want = starts.flatMap { w =>
      var node = w
      var alive = true
      (0 to L).flatMap { t =>
        if (t == 0) Seq((w, 0, w))
        else if (!alive) Nil
        else deg.get(node) match {
          case None => alive = false; Nil
          case Some(d) =>
            val h = (ExtQueries.WalkA * (w * (L + 1) + t) + ExtQueries.WalkB) % P
            val pick = (h % d).toInt + 1
            node = edges((node, pick))
            Seq((w, t, node))
        }
      }
    }.toSet
    assert(got.toSet == want)
    // every non-start row is a real edge traversal from the previous node
    val byWalk = got.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq)
    for ((_, path) <- byWalk; pair <- path.sliding(2) if pair.length == 2) {
      val (a, b) = (pair(0), pair(1))
      assert(edges.exists { case ((s, _), n) => s == a && n == b },
        s"hop $a -> $b is not a knn edge")
    }
  }
}
