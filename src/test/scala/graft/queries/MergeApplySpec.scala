package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_merge_apply` — CDC MERGE INTO semantics (delete / update / insert
  * applied to a snapshot in one keyed pass). Replays the merge
  * sequentially from the base table and pins exact equality, plus the
  * structural guarantees: no deleted key survives, every update carries
  * its new version, every insert lands on a collision-free key. */
class MergeApplySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("merge result equals the sequential apply replay") {
    val base = RefQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

    val want = base.flatMap { case row @ (id, text, lang, source, nc) =>
      id % 7 match {
        case 0 => Seq.empty // delete
        case 1 => Seq((id, "upd:" + text, lang, source, nc + 4)) // update in place
        case 2 => Seq(row, (id + ExtQueries.VariantIdOffset, "ins:" + text, lang, source, nc + 4))
        case _ => Seq(row)
      }
    }.map(r => r._1 -> r).toMap

    val got = ExtQueries.mergeApply(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    spark.catalog.clearCache()

    assert(got == want, "merge must equal the sequential apply replay")
    assert(got.nonEmpty)
    assert(!got.keySet.exists(id => id < ExtQueries.VariantIdOffset && id % 7 == 0),
      "no deleted key may survive")
    assert(got.keySet.exists(_ >= ExtQueries.VariantIdOffset), "inserts must land")
    got.filter { case (id, _) => id < ExtQueries.VariantIdOffset && id % 7 == 1 }
      .values.foreach { case (_, text, _, _, _) =>
        assert(text.startsWith("upd:"), "updated rows must carry the new version")
      }
  }
}
