package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_graph_recall` — the report must replay exactly from a sequential
  * brute-force truth (same fold order, same pinned ties) intersected with
  * the collected graph edges, and must be NON-VACUOUS: on the cell-built
  * graph at least one sampled node misses a cross-cell true neighbor. */
class GraphRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("recall rows replay brute-force truth vs the collected graph edges") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    // sequential replay of the fold cosine: 0.0-seeded left fold in array
    // order — the exact arithmetic the operator and oracle share
    def nrm(v: Array[Float]): Double =
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    val norms = emb.map { case (id, v) => id -> nrm(v) }.toMap
    val vecs = emb.toMap
    def cos(a: Long, b: Long): Double =
      vecs(a).zip(vecs(b)).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      } / (norms(a) * norms(b))
    val sample = emb.map(_._1).filter(_ < ExtQueries.GraphRecallSample)
    val truth = sample.map { q =>
      q -> emb.map(_._1).filter(_ != q)
        .map(c => (c, cos(q, c)))
        .sortBy { case (c, s) => (-s, c) }
        .take(ExtQueries.KnnK).map(_._1).toSet
    }.toMap

    val edges = ExtQueries.knnGraph(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._1 < ExtQueries.GraphRecallSample)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = ExtQueries.graphRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()

    assert(got.map(_._1).toSet == sample.toSet)
    for ((q, nTrue, nHit, recall) <- got) {
      assert(nTrue == ExtQueries.KnnK.toLong)
      val wantHit = truth(q).intersect(edges.getOrElse(q, Set.empty)).size.toLong
      assert(nHit == wantHit, s"node $q: $nHit vs replay $wantHit")
      assert(recall == nHit.toDouble / nTrue.toDouble)
    }
    // the in-cell build must actually miss something on this fixture, or
    // the report is vacuous and the grading claim untested
    assert(got.exists(_._3 < ExtQueries.KnnK),
      "every sampled node had perfect recall — fixture cannot exercise the miss path")
  }
}
