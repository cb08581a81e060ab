package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_triangles` — per-node triangle counts and clustering coefficients
  * over the knn similarity graph, checked against a driver-side brute-force
  * triad enumeration of the same symmetrized edge set. */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-node counts match the brute-force triad enumeration") {
    val knn = ExtQueries.knnGraph(spark, dir)
      .select(col("src"), col("nbr")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    val und = (knn ++ knn.map(_.swap)).distinct
    val adj = und.groupBy(_._1).map { case (v, es) => (v, es.map(_._2).toSet) }
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val edges = und.filter(e => e._1 < e._2)
    for ((a, b) <- edges; c <- adj(a) if b < c && adj(b).contains(c)) {
      triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
    }
    val got = ExtQueries.triangles(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(got.map(_._1).toSet == adj.keySet)
    got.foreach { case (v, deg, t, coeff) =>
      assert(deg == adj(v).size.toLong, s"v=$v")
      assert(t == triCount(v), s"v=$v")
      val want = if (deg >= 2) 2.0 * t / (deg * (deg - 1)) else 0.0
      assert(coeff == want, s"v=$v")
      assert(coeff >= 0.0 && coeff <= 1.0, s"v=$v")
    }
    // the knn graph is built in-cell over similar vectors: triangles must
    // actually exist, or the operator is vacuous on its own substrate
    assert(got.map(_._3).sum > 0L)
  }
}
