package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_maxsim` — late-interaction multi-vector retrieval. Replays the
  * Σ_i max_j cos(q_i, d_j) scoring literally (same fold order, same
  * subvector slices) and pins the distributed top-10 lists to exact
  * equality — ids, ranks, AND score bits. */
class MaxsimSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  private val m = ExtQueries.PqSubspaces
  private val d = ExtQueries.PqSubDim

  private def subNorms(v: Array[Float]): Array[Double] =
    Array.tabulate(m)(s => math.sqrt(
      v.slice(s * d, s * d + d).foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))

  private def score(qe: Array[Float], qn: Array[Double],
                    ce: Array[Float], cn: Array[Double]): Double =
    (0 until m).foldLeft(0.0) { (acc, i) =>
      val best = (0 until m).map { j =>
        val dot = (0 until d).foldLeft(0.0)((a, t) =>
          a + qe(i * d + t).toDouble * ce(j * d + t).toDouble)
        dot / (qn(i) * cn(j))
      }.max
      acc + best
    }

  test("distributed maxsim top-10 equals the sequential replay, bit for bit") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val norms = emb.map { case (id, v) => id -> subNorms(v) }.toMap
    val vecs = emb.toMap
    val queries = emb.filter(_._1 < 8)
    val want = queries.flatMap { case (qid, qe) =>
      emb.filter(_._1 != qid)
        .map { case (cid, ce) => (cid, score(qe, norms(qid), ce, norms(cid))) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(10).zipWithIndex
        .map { case ((cid, s), i) => (qid, cid, s, i + 1) }
    }.toSet

    val got = ExtQueries.maxsimTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == want, "maxsim lists must match the sequential replay exactly")
    // sanity on the scoring range: each of the m best-matches is a cosine
    for ((_, _, s, _) <- got) assert(s <= m + 1e-9 && s >= -m - 1e-9)
    assert(vecs.nonEmpty)
  }
}
