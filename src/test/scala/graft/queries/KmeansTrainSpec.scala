package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_kmeans_train` — chained spherical Lloyd steps. Pins the three facts
  * that make the chain a trainer: (a) iteration 1 is EXACTLY the single
  * [[ExtQueries.kmeansIter]] step (shared `lloydUpdate` — train and
  * single-step cannot drift); (b) every iteration's `c_fp` equals a local
  * re-run of the whole chain (the fed-back integer centroids keep the chain
  * deterministic end-to-end, not just per step); (c) the cosine objective
  * is non-decreasing across iterations up to the per-step 2⁻²⁰ quantization
  * epsilon. */
class KmeansTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("chained steps: iter 1 = single step, exact c_fp per iteration, objective non-decreasing") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val vecs = emb.map(_._2).filter(v => v.exists(_ != 0.0))
    val dim = emb.head._2.length

    def assign(v: Array[Double], cents: Seq[(Long, Array[Double])]): Long =
      cents.maxBy { case (id, c) => (cos(v, c), -id) }._1

    // local re-run of the chain: integer c_fp vectors fed back as centroids
    var cents: Seq[(Long, Array[Double])] =
      emb.filter(_._1 < ExtQueries.IvfCells).map { case (id, v) => (id, v) }
    val localIters = (1 to ExtQueries.KmeansIters).map { _ =>
      val asg = vecs.map(v => assign(v, cents) -> v)
      val fp = collection.mutable.Map.empty[Long, Array[Long]]
      val n = collection.mutable.Map.empty[Long, Long]
      for ((c, v) <- asg) {
        val nrm = math.sqrt(v.map(x => x * x).sum)
        val acc = fp.getOrElseUpdate(c, Array.ofDim[Long](dim))
        n(c) = n.getOrElse(c, 0L) + 1
        for (d <- 0 until dim)
          acc(d) += math.floor(v(d) / nrm * 1048576.0 + 0.5).toLong
      }
      cents = fp.toSeq.sortBy(_._1)
        .map { case (c, a) => (c, a.map(_.toDouble)) }
        .filter { case (_, a) => a.exists(_ != 0.0) }
      (fp.toMap, n.toMap)
    }

    val got = ExtQueries.kmeansTrain(spark, dir).collect()
      .groupBy(_.getInt(0))
    val single = ExtQueries.kmeansIter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    spark.catalog.clearCache() // the trainer persists the corpus + updates

    assert(got.keySet == (1 to ExtQueries.KmeansIters).toSet)
    // (a) iteration 1 IS the single step
    val iter1 = got(1)
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(iter1.toSet == single.toSet, "iter 1 must equal kmeansIter")
    // (b) every iteration matches the local chain exactly
    for (t <- 1 to ExtQueries.KmeansIters) {
      val (fp, n) = localIters(t - 1)
      val rows = got(t)
      assert(rows.map(_.getLong(1)).toSet == fp.keySet, s"iter $t cells")
      rows.foreach { r =>
        val (cell, d) = (r.getLong(1), r.getInt(2))
        assert(r.getLong(4) == fp(cell)(d), s"iter $t c_fp cell $cell dim $d")
        assert(r.getLong(3) == n(cell), s"iter $t n_members cell $cell")
      }
    }
    // (c) objective J_t = Σ max-cos at iteration t's INPUT centroids is
    // non-decreasing: update-step optimality (up to quantization eps) then
    // exact reassignment optimality, chained
    var obj = List.empty[Double]
    var cs: Seq[(Long, Array[Double])] =
      emb.filter(_._1 < ExtQueries.IvfCells).map { case (id, v) => (id, v) }
    for (t <- 1 to ExtQueries.KmeansIters) {
      obj ::= vecs.map(v => cs.map(c => cos(v, c._2)).max).sum
      cs = localIters(t - 1)._1.toSeq.sortBy(_._1)
        .map { case (c, a) => (c, a.map(_.toDouble)) }
        .filter { case (_, a) => a.exists(_ != 0.0) }
    }
    obj ::= vecs.map(v => cs.map(c => cos(v, c._2)).max).sum
    val js = obj.reverse
    val eps = 1e-5 * vecs.length
    for (t <- 1 until js.size)
      assert(js(t) >= js(t - 1) - eps,
        s"objective decreased at step $t: ${js(t - 1)} -> ${js(t)}")
  }
}
