package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_pq_train` / `e_pq_trained` — the PQ codebook trainer and the serve
  * from its output, graded like [[KmeansTrainSpec]]: bookkeeping invariants
  * on the emitted update rows, the Lloyd monotonicity property (trained
  * codebook does not increase quantization distortion over the seed one,
  * modulo the 2⁻²⁰ fixed-point epsilon), and structural checks on the
  * trained serve. */
class PqTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private val M = ExtQueries.PqSubspaces
  private val SubDim = ExtQueries.PqSubDim

  /** (vec_id, embedding as doubles), collected once — sf0.001 is tiny. */
  private lazy val corpus: Array[(Long, Array[Double])] = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
  }

  private def subvec(v: Array[Double], sub: Int): Array[Double] =
    v.slice(sub * SubDim, (sub + 1) * SubDim)

  /** Total corpus quantization distortion: Σ over (vector, subspace) of the
    * min squared-L2 to any codebook entry of that subspace. */
  private def distortion(codebook: Map[(Int, Long), Array[Double]]): Double =
    corpus.iterator.flatMap { case (_, v) =>
      (0 until M).map { sub =>
        val sv = subvec(v, sub)
        codebook.collect { case ((s, _), cv) if s == sub =>
          sv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
        }.min
      }
    }.sum

  test("e_pq_train bookkeeping: every (iter, sub) partitions the corpus") {
    val out = ExtQueries.pqTrain(spark, dir)
    assert(out.columns.toSeq ==
      Seq("iter", "sub", "code_id", "dim", "n_members", "c_fp", "c_new"))
    val rows = out.collect()
    val n = corpus.length
    val iters = rows.map(_.getInt(0)).distinct.sorted
    assert(iters.toSeq == (1 to ExtQueries.PqTrainIters))
    for (it <- iters; sub <- 0 until M) {
      // dim 0 carries one row per surviving code; members must sum to N
      val members = rows.filter(r =>
        r.getInt(0) == it && r.getInt(1) == sub && r.getInt(3) == 0)
      assert(members.map(_.getLong(4)).sum == n, s"iter=$it sub=$sub")
      // every surviving code reports all SubDim dims, n_members constant
      val byCode = rows.filter(r => r.getInt(0) == it && r.getInt(1) == sub)
        .groupBy(_.getLong(2))
      byCode.foreach { case (code, rs) =>
        assert(rs.map(_.getInt(3)).sorted.toSeq == (0 until SubDim),
          s"iter=$it sub=$sub code=$code")
        assert(rs.map(_.getLong(4)).distinct.length == 1,
          s"iter=$it sub=$sub code=$code")
      }
    }
  }

  test("trained codebook does not increase quantization distortion vs seed") {
    val seed: Map[(Int, Long), Array[Double]] = (for {
      (id, v) <- corpus.take(ExtQueries.PqCodes)
      sub <- 0 until M
    } yield (sub, id) -> subvec(v, sub)).toMap
    val last = ExtQueries.pqTrain(spark, dir).collect()
      .filter(_.getInt(0) == ExtQueries.PqTrainIters)
    val trained: Map[(Int, Long), Array[Double]] = last
      .groupBy(r => (r.getInt(1), r.getLong(2)))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getInt(3)).map(_.getDouble(6))
      }
    val dSeed = distortion(seed)
    val dTrained = distortion(trained)
    info(f"distortion: seed $dSeed%.4f -> trained $dTrained%.4f")
    // Lloyd monotonicity with a fixed-point slack: each quantized mean sits
    // within 2^-21 per element of the true mean, so the bound is loose
    assert(dTrained <= dSeed + 1e-6 * corpus.length)
  }

  test("e_pq_trained serve is structurally sound and differs only by codebook") {
    val out = ExtQueries.cosineTopkPqTrained(spark, dir)
    assert(out.columns.toSeq == Seq("qid", "cid", "score", "rank"))
    val rows = out.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    byQ.foreach { case (qid, rs) =>
      val ranked = rs.sortBy(_.getInt(3))
      assert(ranked.map(_.getInt(3)).toSeq == (1 to 10), s"qid=$qid")
      val scores = ranked.map(_.getDouble(2))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b }, s"qid=$qid")
    }
  }
}
