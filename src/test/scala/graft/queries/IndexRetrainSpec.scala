package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_index_retrain` — the retrain hook closing `e_index_delete`'s honest
  * quantizer residual. Pins, at both gate scales:
  *
  *  - ZERO RESIDUAL: `n_refs_after` is 0 on EVERY artifact — including
  *    `quantizer_params`, the row `e_index_delete` deliberately leaves
  *    non-zero (the linkage test reads both keys, so the residual is
  *    observed to be real before it is observed to be closed);
  *  - a MEASURED drift row: `serve_drift.overlap_at_10` is strictly
  *    inside (0, 1) — the retrain visibly churns answers without
  *    reshuffling every result, and both serve lists are full
  *    (10 · |surviving queries| rows);
  *  - count structure: the assignment rows equal the survivor count
  *    recomputed locally from the request rule.
  */
class IndexRetrainSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def rows(dir: String) =
    ExtQueries.indexRetrain(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"zero residual on every artifact and a measured drift row ($dir)") {
      val byArtifact = rows(dir)
      assert(byArtifact.keySet == Set("ivf_assignment", "knn_adjacency",
        "quantizer_params", "serve_drift"))
      for ((name, r) <- byArtifact)
        assert(r.getLong(3) == 0L, s"$name still references a deleted id")

      // survivor count recomputed from the request rule
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val nSurv = emb.filter(
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.lit(ExtQueries.DeleteEveryMod))
          =!= 0).count()
      val ivf = byArtifact("ivf_assignment")
      assert(ivf.getLong(1) == nSurv && ivf.getLong(2) == nSurv)

      // quantizer: the retrained table keeps at most the seeded cell count
      val qp = byArtifact("quantizer_params")
      assert(qp.getLong(1) == ExtQueries.IvfCells.toLong)
      assert(qp.getLong(2) > 0L && qp.getLong(2) <= ExtQueries.IvfCells.toLong)

      // drift: full lists, measured churn strictly inside (0, 1)
      val sd = byArtifact("serve_drift")
      val nQ = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
        .filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.lit(ExtQueries.DeleteEveryMod)) =!= 0)
        .count()
      assert(sd.getLong(1) == nQ * 10 && sd.getLong(2) == nQ * 10,
        "both serve lists must be full (10 per surviving query)")
      val overlap = sd.getDouble(5)
      assert(overlap > 0.0 && overlap < 1.0,
        s"drift must be measured, not degenerate: overlap=$overlap")
      spark.catalog.clearCache()
    }
  }

  test("the residual e_index_retrain closes is real in e_index_delete") {
    val del = ExtQueries.indexDelete(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(del("quantizer_params").getLong(3) > 0L,
      "e_index_delete's quantizer row must carry the non-zero residual " +
        "this key exists to close")
    spark.catalog.clearCache()
  }
}
