package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Structural invariants of the connected-components dedup operator that the
  * row-level oracle cannot express: cluster ids are component minima, every
  * cluster is internally connected through the pair stream, and the
  * keep-one-per-cluster filter yields exactly |clusters| survivors.
  */
class DupClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("cluster ids are member minima and sizes are consistent") {
    val out = ExtQueries.dupClusters(spark, dir)
      .groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("min_member"),
        count(lit(1)).as("n_members"),
        max(col("cluster_size")).as("sz_max"),
        min(col("cluster_size")).as("sz_min"))
      .collect()
    spark.catalog.clearCache()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (clusterId, minMember, nMembers, szMax, szMin) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(clusterId == minMember, s"cluster_id must be the min member: $r")
      assert(nMembers >= 2, s"singletons must not appear: $r")
      assert(szMax == szMin && szMax == nMembers,
        s"cluster_size must be uniform and equal the member count: $r")
    }
  }

  test("every doc pairs only with members of its own cluster") {
    val clusters = ExtQueries.dupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val pairs = ExtQueries.minhashDedup(spark, dir).select(col("doc_a"), col("doc_b"))
    val crossCluster = pairs
      .join(clusters.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("cluster_id", "ca"), Seq("doc_a"))
      .join(clusters.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("cluster_id", "cb"), Seq("doc_b"))
      .filter(col("ca") =!= col("cb"))
      .count()
    spark.catalog.clearCache()
    assert(crossCluster == 0, "a verified pair must never straddle two clusters")
  }
}
