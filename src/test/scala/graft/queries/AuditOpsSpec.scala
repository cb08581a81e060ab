package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_filter_bias` / `e_pack_stats` — the composition audits. Each must be
  * EXACTLY the per-group rollup of the graded operator it composes (no
  * second derivation), with shares/utilization obeying their identities. */
class AuditOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("filter bias is the quality filter's own (lang, verdict) rollup; shares sum to 1") {
    val q = ExtQueries.qualityFilter(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(8)))
    spark.catalog.clearCache()
    val want = q.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = ExtQueries.filterBias(spark, dir).collect()
    spark.catalog.clearCache()
    assert(got.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap == want)
    for ((lang, rows) <- got.groupBy(_.getString(0))) {
      assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-12,
        s"$lang: verdict shares must partition the language")
      val nLang = rows.head.getLong(3)
      assert(rows.map(_.getLong(2)).sum == nLang)
    }
  }

  test("pack stats is the packing's own per-source rollup; utilization in (0, 1]") {
    val p = ExtQueries.seqPack(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(5))) // source, n_tokens, last_block
    spark.catalog.clearCache()
    val want = p.groupBy(_._1).map { case (s, rs) =>
      s -> (rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).max + 1)
    }
    val got = ExtQueries.packStats(spark, dir).collect()
    spark.catalog.clearCache()
    for (r <- got) {
      val (src, nDocs, nTok, nBlk, util) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert((nDocs, nTok, nBlk) == want(src), s"$src: rollup must equal the packing's sums")
      assert(util > 0.0 && util <= 1.0, s"$src: utilization $util out of range")
      assert(util == nTok.toDouble / (nBlk * ExtQueries.PackBlockTokens).toDouble)
    }
    assert(got.map(_.getString(0)).toSet == want.keySet)
  }
}
