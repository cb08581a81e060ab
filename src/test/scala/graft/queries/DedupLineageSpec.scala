package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_dedup_lineage` — per-family drop provenance. Replays the union of
  * the three pair detectors' outputs driver-side and pins that the
  * lineage is exactly (family, victim) → earliest kept partner, with
  * kept_id < doc_id always (pairs are emitted doc_a < doc_b). */
class DedupLineageSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("lineage equals the per-family min-partner replay") {
    def pairs(df: org.apache.spark.sql.DataFrame): Array[(Long, Long)] = {
      val out = df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      spark.catalog.clearCache()
      out
    }
    val fams = Seq(
      "minhash" -> pairs(ExtQueries.minhashDedup(spark, dir)),
      "simhash" -> pairs(ExtQueries.simhashDedup(spark, dir)),
      "media" -> pairs(ExtQueries.mediaDedup(spark, dir)))

    val want = fams.flatMap { case (fam, ps) =>
      ps.groupBy(_._2).map { case (victim, group) =>
        (fam, victim) -> group.map(_._1).min
      }
    }.toMap

    val got = ExtQueries.dedupLineage(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache()

    assert(got == want, "lineage must equal the min-partner replay")
    assert(got.nonEmpty)
    assert(got.forall { case ((_, victim), kept) => kept < victim },
      "kept_id must precede its victim (doc_a < doc_b pair order)")
    assert(fams.map(_._1).toSet == got.keySet.map(_._1),
      "every family must contribute lineage rows on the fixture")
  }
}
