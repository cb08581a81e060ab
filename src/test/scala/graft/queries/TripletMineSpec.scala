package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_triplet_mine` against an independent in-memory argmax over the
  * collected vectors: hardest same-label positive, top-k different-label
  * negatives, pinned tie-break (score desc, cid asc). */
class TripletMineSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  private val K = ExtQueries.TripletNegK

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("positives and negatives match the brute-force argmax with pinned ties") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).toArray))
    val got = ExtQueries.tripletMine(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    spark.catalog.clearCache() // tripletMine persists its ranked frame
    val byId = vecs.map(v => v._1 -> v).toMap
    for ((qid, _, qe) <- vecs.filter(_._1 < 8)) {
      val qlabel = byId(qid)._2
      val scored = vecs.filter(_._1 != qid)
        .map { case (cid, cl, ce) => (cid, cl, cosine(qe, ce)) }
        .sortBy { case (cid, _, s) => (-s, cid) }
      val wantPos = scored.filter(_._2 == qlabel).head._1
      val wantNegs = scored.filter(_._2 != qlabel).take(K).map(_._1).toSeq
      val mine = got.filter(_._1 == qid).sortBy(_._4)
      assert(mine.length == K, s"qid $qid: expected $K triplet rows")
      assert(mine.forall(_._2 == wantPos), s"qid $qid: positive mismatch")
      assert(mine.map(_._3).toSeq == wantNegs, s"qid $qid: negative set mismatch")
    }
  }

  test("margins are exactly pos_score - neg_score and ranks are 1..K") {
    val rows = ExtQueries.tripletMine(spark, dir).collect()
    spark.catalog.clearCache()
    rows.foreach { r =>
      assert(r.getDouble(6) == r.getDouble(4) - r.getDouble(5))
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(3)).sorted.toSeq == (1 to K))
    }
  }
}
