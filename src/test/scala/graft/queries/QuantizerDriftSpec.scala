package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_quantizer_drift` — the seed→trained cell-churn matrix. The pin is
  * a LITERAL local re-run: train the chain (the shared [[TrainReplay]]
  * recipe), assign every vector against the seed AND the trained centroid
  * tables under the pinned argmax-cosine/cent_id tie-break, and compare
  * the (from, to) flow counts — plus the mass-conservation and
  * non-degeneracy facts that make the matrix a real reindex bill. */
class QuantizerDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("churn matrix equals the local seed/trained assignment replay") {
    import TrainReplay.{assign, trainedCents}
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val nCells = ExtQueries.IvfCells
    val seedCents = emb.filter(_._1 < nCells).toSeq
    val centsT = trainedCents(emb, nCells, ExtQueries.KmeansIters)
    val want = emb
      .map { case (_, v) => (assign(v, seedCents), assign(v, centsT)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

    val got = ExtQueries.quantizerDrift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache() // the training chain persists corpus + updates
    assert(got == want, "flow matrix != local replay")

    // mass conservation: every vector sits in exactly one flow
    assert(got.values.sum == emb.length.toLong)
    // the fixture exercises BOTH verdicts — vectors that move cells (real
    // reindex work) and vectors that stay (incremental reindexing possible)
    val moved = got.collect { case ((f, t), n) if f != t => n }.sum
    assert(moved > 0, "fixture must show churn")
    assert(moved < emb.length, "fixture must keep some diagonal mass")
  }
}
