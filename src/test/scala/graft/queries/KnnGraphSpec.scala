package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_knn_graph` is an ANN structure, so the spec grades it the way the IVF
  * spec grades search: at cells = 1 the in-cell join IS the brute-force
  * all-pairs graph and must match an independent Scala computation exactly;
  * at the oracle cell count the output must satisfy the graph invariants and
  * only ever lose recall (never invent better-than-exact neighbors). */
class KnnGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  /** (vec_id, embedding) collected once — the fixture corpus is tiny. */
  private lazy val vecs: Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x))
    val nb = math.sqrt(b.foldLeft(0.0)((s, x) => s + x * x))
    dot / (na * nb)
  }

  /** Brute-force top-k graph computed independently in Scala. */
  private def bruteGraph: Map[Long, Seq[Long]] =
    vecs.keys.map { v =>
      v -> vecs.keys.filter(_ != v).toSeq
        .map(u => (u, cos(vecs(v), vecs(u))))
        .sortBy { case (u, s) => (-s, u) }
        .take(ExtQueries.KnnK).map(_._1)
    }.toMap

  test("cells = 1 equals the brute-force exact k-NN graph") {
    val got = ExtQueries.knnGraphCells(spark, dir, cells = 1)
      .select("src", "nbr", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (s, rs) => s -> rs.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
    spark.catalog.clearCache()
    assert(got == bruteGraph)
  }

  test("oracle cell count: graph invariants hold and recall only loses") {
    val rows = ExtQueries.knnGraph(spark, dir)
      .select("src", "nbr", "score", "rank").collect()
    spark.catalog.clearCache()
    val bySrc = rows.groupBy(_.getLong(0))
    assert(bySrc.nonEmpty)
    val exact = bruteGraph
    bySrc.foreach { case (src, rs) =>
      val ranked = rs.sortBy(_.getInt(3))
      assert(ranked.map(_.getInt(3)).toSeq == (1 to ranked.length),
        s"src=$src ranks not contiguous")
      assert(ranked.length <= ExtQueries.KnnK)
      val scores = ranked.map(_.getDouble(2))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b },
        s"src=$src scores not non-increasing")
      // in-cell candidates are a subset of all candidates: the reported
      // rank-1 score can never EXCEED the exact rank-1 score
      val exactBest = cos(vecs(src), vecs(exact(src).head))
      assert(scores.head <= exactBest + 1e-12,
        s"src=$src in-cell best ${scores.head} beats exact best $exactBest")
    }
  }
}
