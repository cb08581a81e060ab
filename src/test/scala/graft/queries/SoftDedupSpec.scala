package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_soft_dedup` claims: full-universe coverage (every doc + variant gets
  * a weight), agreement with the `e_dup_clusters` multiplicities it
  * composes, and the conservation property that makes soft dedup sound —
  * each cluster's weights sum to one document's worth of signal. */
class SoftDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("covers the universe; weights agree with cluster sizes and conserve mass") {
    import spark.implicits._
    val rows = ExtQueries.softDedup(spark, dir)
      .as[(Long, Long, Double)].collect()
    spark.catalog.clearCache()
    val clusterRows = ExtQueries.dupClusters(spark, dir)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    spark.catalog.clearCache()
    val clusters = clusterRows.map(r => r._1 -> r._3).toMap

    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == 2 * nDocs, "one weight row per universe document")
    assert(rows.map(_._1).distinct.length == rows.length)

    rows.foreach { case (id, nDups, w) =>
      val expected = clusters.getOrElse(id, 1L)
      assert(nDups == expected, s"doc $id: n_dups $nDups != cluster size $expected")
      assert(w == 1.0 / nDups, s"doc $id: weight $w != 1/$nDups")
      assert(w > 0.0 && w <= 1.0)
    }

    // conservation: each cluster's weights sum to 1.0 (n members × 1/n),
    // so the clustered mass equals the cluster count — soft dedup's whole
    // point: a duplicate cluster contributes ONE document's worth of signal
    val clustered = rows.filter(r => clusters.contains(r._1))
    val nClusters = clusterRows.map(_._2).distinct.length
    val weightSum = clustered.map(_._3).sum
    assert(math.abs(weightSum - nClusters) < 1e-6 * nClusters,
      s"cluster weight mass $weightSum != cluster count $nClusters")
  }
}
