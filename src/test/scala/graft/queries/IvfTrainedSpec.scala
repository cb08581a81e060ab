package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_ivf_trained` — IVF serving from the trained quantizer. The pin is a
  * LITERAL re-run: train the chain locally (same fixed-point feedback as
  * [[KmeansTrainSpec]]), assign the corpus to the final centroids, and
  * recompute each query's in-cell top-10 — the distributed serve must match
  * exactly, which subsumes "candidates share the query's trained cell" and
  * "ranking is cosine-descending with the pinned tie-break". Also measures
  * recall@10 of trained vs seed cells against the exact baseline — the
  * comparison that justifies running the trainer at all. */
class IvfTrainedSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("trained serve matches a literal local re-run; recall measured vs seed cells") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val dim = emb.head._2.length

    def assign(v: Array[Double], cents: Seq[(Long, Array[Double])]): Long =
      cents.maxBy { case (id, c) => (cos(v, c), -id) }._1

    // local training chain (the KmeansTrainSpec recipe)
    var cents: Seq[(Long, Array[Double])] =
      emb.filter(_._1 < ExtQueries.IvfCells).map { case (id, v) => (id, v) }
    for (_ <- 1 to ExtQueries.KmeansIters) {
      val fp = collection.mutable.Map.empty[Long, Array[Long]]
      for ((_, v) <- emb) {
        val c = assign(v, cents)
        val nrm = math.sqrt(v.map(x => x * x).sum)
        val acc = fp.getOrElseUpdate(c, Array.ofDim[Long](dim))
        for (d <- 0 until dim)
          acc(d) += math.floor(v(d) / nrm * 1048576.0 + 0.5).toLong
      }
      cents = fp.toSeq.sortBy(_._1)
        .map { case (c, a) => (c, a.map(_.toDouble)) }
        .filter { case (_, a) => a.exists(_ != 0.0) }
    }

    // local serve: assign everyone to the trained cells, per-query in-cell top-10
    val cellOf = emb.map { case (id, v) => id -> assign(v, cents) }.toMap
    val want = emb.filter(_._1 < 8).map { case (qid, qv) =>
      val top = emb
        .filter { case (cid, _) => cid != qid && cellOf(cid) == cellOf(qid) }
        .map { case (cid, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(10)
      qid -> top.zipWithIndex.map { case ((cid, _), i) => (cid, i + 1) }.toSet
    }.toMap

    val got = ExtQueries.cosineTopkIvfTrained(spark, dir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getInt(3))).toSet).toMap
    spark.catalog.clearCache() // the training chain persists corpus + updates
    assert(got.keySet == want.keySet)
    for (q <- want.keys)
      assert(got(q) == want(q), s"qid $q: trained serve != literal re-run")

    // measured: recall@10 vs the exact baseline, trained cells vs seed cells
    def recall(res: Map[Long, Set[(Long, Int)]]): Double = {
      val hits = res.keys.map { qid =>
        val qv = emb(qid.toInt)._2
        val exact = emb.filter(_._1 != qid)
          .map { case (cid, cv) => (cid, cos(qv, cv)) }
          .sortBy { case (cid, s) => (-s, cid) }.take(10).map(_._1).toSet
        (res(qid).map(_._1) intersect exact).size
      }.sum
      hits.toDouble / (res.size * 10)
    }
    val seed = ExtQueries.cosineTopkIvf(spark, dir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getInt(3))).toSet).toMap
    info(f"recall@10 trained=${recall(got)}%.2f seed=${recall(seed)}%.2f")
  }
}
