package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_mmr` is a greedy argmax loop, so the spec re-runs the greedy locally
  * from collected embeddings and requires the SAME picks in the SAME order,
  * then checks the diversity property that justifies the operator: the MMR
  * list's average pairwise similarity never exceeds the plain top-k's. */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val vecs: Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  /** Sequential left-fold cosine — same addition order as the operator. */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x))
    val nb = math.sqrt(b.foldLeft(0.0)((s, x) => s + x * x))
    dot / (na * nb)
  }

  private def localMmr(qid: Long): Seq[Long] = {
    val pool = vecs.keys.filter(_ != qid).toSeq
      .map(c => (c, cos(vecs(qid), vecs(c))))
      .sortBy { case (c, r) => (-r, c) }.take(ExtQueries.MmrPoolC)
    val rel = pool.toMap
    var selected = Vector.empty[Long]
    var remaining = pool.map(_._1)
    (1 to ExtQueries.MmrK).foreach { _ =>
      val pick = remaining.map { c =>
        val ms = if (selected.isEmpty) 0.0
          else selected.map(s => cos(vecs(c), vecs(s))).max
        (c, 0.5 * rel(c) - 0.5 * ms)
      }.minBy { case (c, m) => (-m, c) }._1
      selected :+= pick
      remaining = remaining.filterNot(_ == pick)
    }
    selected
  }

  test("greedy picks match an independent local MMR run, in order") {
    val got = ExtQueries.mmrSelect(spark, dir)
      .select("qid", "cid", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
    spark.catalog.clearCache()
    assert(got.keySet == (0L until 8L).toSet)
    got.foreach { case (q, picks) =>
      assert(picks == localMmr(q), s"qid=$q diverged from local greedy")
    }
  }

  test("MMR list is never more redundant than plain top-k") {
    def avgPairSim(ids: Seq[Long]): Double = {
      val ps = for { a <- ids; b <- ids if a < b } yield cos(vecs(a), vecs(b))
      ps.sum / ps.size
    }
    (0L until 8L).foreach { q =>
      val mmr = localMmr(q)
      val topk = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, r) => (-r, c) }.take(ExtQueries.MmrK).map(_._1)
      assert(avgPairSim(mmr) <= avgPairSim(topk) + 1e-12,
        s"qid=$q: MMR selection more redundant than top-k")
    }
  }
}
