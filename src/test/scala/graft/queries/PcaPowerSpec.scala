package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_pca_power` claims (1) the distributed fixed-point Gram accumulation
  * equals a local single-threaded one EXACTLY (the partition-invariance
  * device), and (2) the returned vector/λ actually behave like a dominant
  * eigenpair of that Gram matrix — checked against an independent local
  * replica of the iteration plus spectral sanity bounds, not just parity. */
class PcaPowerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  private val D = ExtQueries.PcaDim

  private def localGramAndIter(steps: Int = ExtQueries.PcaSteps)
      : (Array[Array[Long]], Array[Double], Double) = {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val g = Array.ofDim[Long](D, D)
    for (e <- rows; i <- 0 until D; j <- i until D) {
      val p = math.floor(e(i).toDouble * e(j).toDouble * ExtQueries.PcaScale).toLong
      g(i)(j) += p
      if (i != j) g(j)(i) += p
    }
    var v = Array.fill(D)(0.125)
    var lambda = 0.0
    for (_ <- 1 to steps) {
      // same sequential fold order as the operator: j ascending, then a
      // j-ascending fold for the norm
      val w = Array.tabulate(D) { i =>
        var acc = 0.0
        var j = 0
        while (j < D) { acc += (g(i)(j).toDouble / ExtQueries.PcaScale) * v(j); j += 1 }
        acc
      }
      var n2 = 0.0
      var j = 0
      while (j < D) { n2 += w(j) * w(j); j += 1 }
      lambda = math.sqrt(n2)
      v = w.map(_ / lambda)
    }
    (g, v, lambda)
  }

  test("distributed Gram + iteration equals the exact local replica") {
    val got = ExtQueries.pcaPower(spark, dir).collect()
    spark.catalog.clearCache()
    val (g, v, lambda) = localGramAndIter()
    assert(got.length == D)
    for (r <- got) {
      val d = r.getInt(0)
      assert(r.getLong(1) == g(d)(d), s"G diag mismatch at $d")
      // bit-identical: same fold order, same fixed-point longs
      assert(r.getDouble(2) == v(d), s"v mismatch at $d")
      assert(r.getDouble(3) == lambda)
    }
  }

  test("pca_project: screen equals local projections; extreme-k is correct") {
    val got = ExtQueries.pcaProject(spark, dir).collect()
    spark.catalog.clearCache()
    val (_, v, _) = localGramAndIter()
    val projs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        var acc = 0.0
        var j = 0
        while (j < D) { acc += v(j) * e(j).toDouble; j += 1 }
        r.getLong(0) -> acc
      }
    val want = projs.sortBy { case (id, p) => (-math.abs(p), id) }
      .take(ExtQueries.PcaScreenK).toMap
    assert(got.length == ExtQueries.PcaScreenK)
    for (r <- got) {
      val id = r.getLong(0)
      assert(want.contains(id), s"vec $id not in the local extreme-k set")
      assert(r.getDouble(1) == want(id), s"proj mismatch for $id")
    }
  }

  test("the returned pair is spectrally sane: residual shrinks, bounds hold") {
    def relResid(steps: Int): (Double, Double) = {
      val (g, v, lambda) = localGramAndIter(steps)
      val gd = g.map(_.map(_.toDouble / ExtQueries.PcaScale))
      val gv = Array.tabulate(D)(i => (0 until D).map(j => gd(i)(j) * v(j)).sum)
      val resid = math.sqrt((0 until D).map(i => {
        val r = gv(i) - lambda * v(i); r * r
      }).sum)
      (resid / lambda, lambda)
    }
    // power iteration's actual guarantee is CONVERGENCE toward the
    // dominant eigenvector at rate (lambda2/lambda1)^r — on this fixture
    // the gap is small (~0.96/step), so grade the shrink plus a loose
    // absolute bound rather than demanding full convergence in 12 steps
    val (r2, _) = relResid(2)
    val (rFinal, lambda) = relResid(ExtQueries.PcaSteps)
    assert(rFinal < r2 * 0.8,
      s"residual not shrinking: $rFinal after ${ExtQueries.PcaSteps} vs $r2 after 2")
    assert(rFinal < 0.1, s"not near a dominant eigenpair: $rFinal")
    // PSD spectral bounds: max diagonal <= lambda_1 <= trace
    val (g, _, _) = localGramAndIter(1)
    val gd = g.map(_.map(_.toDouble / ExtQueries.PcaScale))
    val trace = (0 until D).map(i => gd(i)(i)).sum
    assert(lambda <= trace * 1.000001, s"lambda $lambda above trace $trace")
    assert(lambda >= gd.zipWithIndex.map { case (row, i) => row(i) }.max * 0.999,
      s"lambda $lambda below max diagonal")
  }
}
