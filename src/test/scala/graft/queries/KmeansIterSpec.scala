package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_kmeans_iter` — one spherical Lloyd step. Pins the property that makes
  * it a TRAINER and not just an aggregate: the cosine objective
  * Σ cos(v, centroid(assign(v))) never decreases across the step
  * (update-step optimality of the spherical centroid + reassignment
  * optimality), up to the 2⁻²⁰ fixed-point quantization the cross-engine
  * exactness device introduces. */
class KmeansIterSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("one Lloyd step: exact fixed-point sums, and the cosine objective never decreases") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val seeds = emb.filter(_._1 < ExtQueries.IvfCells).map(_._2)
    val vecs = emb.map(_._2).filter(v => v.exists(_ != 0.0))
    val dim = seeds.head.length

    // reference assignment: max cosine, ties to the lower centroid id
    def assign(v: Array[Double], cents: Array[Array[Double]]): Int =
      cents.zipWithIndex.maxBy { case (c, i) => (cos(v, c), -i) }._2
    val a0 = vecs.map(v => assign(v, seeds))

    val got = ExtQueries.kmeansIter(spark, dir).collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1))).distinct.length == got.length)

    // c_fp must equal the locally recomputed quantized unit-member sums —
    // the distributed integer sum is exact, not approximately right
    val wantFp = Array.ofDim[Long](ExtQueries.IvfCells, dim)
    val wantN = Array.ofDim[Long](ExtQueries.IvfCells)
    for ((v, c) <- vecs.zip(a0)) {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      wantN(c) += 1
      for (d <- 0 until dim)
        wantFp(c)(d) += math.floor(v(d) / nrm * 1048576.0 + 0.5).toLong
    }
    got.foreach { r =>
      val (cell, d) = (r.getLong(0).toInt, r.getInt(1))
      assert(r.getLong(3) == wantFp(cell)(d), s"c_fp cell $cell dim $d")
      assert(r.getLong(2) == wantN(cell), s"n_members cell $cell")
      assert(r.getDouble(4) == r.getLong(3).toDouble / (1048576.0 * wantN(cell)))
    }

    // monotonicity: J0 (seed centroids, seed assignment) ≤ J1 (new
    // centroids, old assignment) ≤ J2 (new centroids, re-assigned) —
    // cosine is scale-invariant so c_fp serves as the centroid direction
    val cNew = Array.tabulate(ExtQueries.IvfCells, dim)((c, d) => wantFp(c)(d).toDouble)
    val j0 = vecs.zip(a0).map { case (v, c) => cos(v, seeds(c)) }.sum
    val j1 = vecs.zip(a0).map { case (v, c) => cos(v, cNew(c)) }.sum
    val j2 = vecs.map(v => cos(v, cNew(assign(v, cNew)))).sum
    val eps = 1e-5 * vecs.length
    assert(j1 >= j0 - eps, s"update step decreased the objective: $j0 -> $j1")
    assert(j2 >= j1, s"reassignment decreased the objective: $j1 -> $j2")
  }
}
