package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_mrl_rerank` — Matryoshka prefix coarse pass + exact refine. Replays
  * the whole serve sequentially (prefix cosine shortlist at R, exact
  * full-precision refine to top-10) and pins the discriminating facts:
  * refined scores are the exact cosine bitwise, the prefix ordering
  * genuinely differs from the full ordering on the fixture (the coarse
  * pass approximates — it is not a disguised exact scan), and the refine
  * guarantee holds vs the exact baseline. */
class MrlRerankSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until d) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("serve equals the sequential prefix-shortlist + exact-refine replay") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val ids = emb.keys.toSeq.sorted
    val want = (0L until 8L).flatMap { qid =>
      val short = ids.filter(_ != qid)
        .map(c => (c, cos(emb(qid), emb(c), ExtQueries.MrlDims)))
        .sortBy { case (c, s) => (-s, c) }.take(ExtQueries.MrlRerankR).map(_._1)
      short.map(c => (c, cos(emb(qid), emb(c), emb(qid).length)))
        .sortBy { case (c, s) => (-s, c) }.take(10).zipWithIndex
        .map { case ((c, s), i) => (qid, i + 1) -> ((c, s)) }
    }.toMap
    val got = ExtQueries.mrlRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got == want, "MRL serve must equal the sequential replay")
    assert(got.nonEmpty)

    // non-vacuous approximation: the prefix ordering must differ from the
    // exact ordering somewhere, and the refined top-10 must still lose
    // something vs exact on this isotropic fixture (prefix halves carry
    // ~half the signal of independent coordinates)
    val exact = ExtQueries.cosineTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val gotPairs = got.map { case ((q, _), (c, _)) => (q, c) }.toSet
    assert(gotPairs != exact, "prefix pass must genuinely approximate")
    assert((gotPairs & exact).nonEmpty, "prefix pass must catch some truth")
  }

  test("refine guarantee: a truth hit in the shortlist survives the re-rank") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val ids = emb.keys.toSeq.sorted
    val truth = ExtQueries.cosineTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    spark.catalog.clearCache()
    val rr = ExtQueries.mrlRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0L until 8L).foreach { qid =>
      val short = ids.filter(_ != qid)
        .map(c => (c, cos(emb(qid), emb(c), ExtQueries.MrlDims)))
        .sortBy { case (c, s) => (-s, c) }.take(ExtQueries.MrlRerankR)
        .map(_._1).toSet
      val caught = truth(qid) & short
      assert(caught.subsetOf(rr(qid)),
        s"qid $qid: truth hits caught by the shortlist must survive the refine")
    }
  }
}
