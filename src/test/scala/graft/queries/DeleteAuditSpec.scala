package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_delete_audit` — deletion-propagation sizing report. Recomputes each
  * artifact's reference count from the composed operators' own collected
  * outputs (variant ids resolved to base ids) and pins that the audit is
  * non-vacuous: every artifact references some requested id on the
  * fixture (a deletion job has work to do everywhere), and the fingerprint
  * artifact references exactly the requested set's own rows. */
class DeleteAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("audit equals recomputation from the composed artifacts") {
    val dels = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
      .filter(_ % ExtQueries.DeleteEveryMod == 0).toSet
    assert(dels.nonEmpty)

    def base(id: Long): Long =
      if (id >= ExtQueries.VariantIdOffset) id - ExtQueries.VariantIdOffset else id
    def idsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val v = df.select("doc_id").collect().map(r => base(r.getLong(0))).toSeq
      spark.catalog.clearCache()
      v
    }
    val artifacts = Map(
      "chunk_dedup" -> idsOf(ExtQueries.chunkDedup(spark, dir)),
      "dup_clusters" -> idsOf(ExtQueries.dupClusters(spark, dir)),
      "fingerprint" -> idsOf(ExtQueries.fingerprint(spark, dir)),
      "split" -> idsOf(ExtQueries.corpusSplit(spark, dir)))
    val want = artifacts.map { case (name, ids) =>
      val refs = ids.count(dels.contains).toLong
      name -> ((ids.length.toLong, refs, refs.toDouble / ids.length.toDouble))
    }

    val got = ExtQueries.deleteAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    spark.catalog.clearCache()

    assert(got == want, "audit rows must equal the recomputation")
    // non-vacuous: a deletion batch has work in EVERY artifact
    got.foreach { case (name, (nRows, nRefs, share)) =>
      assert(nRows > 0L && nRefs > 0L, s"$name: fixture must exercise the audit")
      assert(share > 0.0 && share < 1.0, s"$name: share sane")
    }
    // fingerprint is per-document: its references are exactly the request set
    assert(got("fingerprint")._2 == dels.size.toLong)
    assert(got("split")._2 == dels.size.toLong)
  }
}
