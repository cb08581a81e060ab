package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_emb_stats` — the embedding-sanity audit. Replays the fixed-point
  * moment arithmetic sequentially (same quantization, same integer sums)
  * and pins exact equality; then checks the outlier rule against a direct
  * per-vector 2σ test over the same exact integers. */
class EmbStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("moments and outlier counts equal the sequential fixed-point replay") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    def nfp(v: Array[Float]): Long = {
      val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      math.floor(norm * ExtQueries.EmbNormScale + 0.5).toLong
    }
    val byLabel = emb.groupBy(_._1).view.mapValues(_.map(x => nfp(x._2))).toMap

    val got = ExtQueries.embStats(spark, dir).collect()
    spark.catalog.clearCache()
    assert(got.map(_.getInt(0)).toSet == byLabel.keySet)
    for (r <- got) {
      val (label, n, nZero, nOut) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val xs = byLabel(label)
      val (s1, s2) = (xs.sum, xs.map(x => x * x).sum)
      assert(n == xs.length)
      assert(nZero == xs.count(_ == 0L))
      val wantOut = xs.count { x =>
        val dev = (x * n - s1).toDouble
        dev * dev > 4.0 * (n * s2 - s1 * s1).toDouble
      }
      assert(nOut == wantOut, s"label $label: outlier count")
      assert(r.getDouble(4) ==
        s1.toDouble / (n.toDouble * ExtQueries.EmbNormScale))
      assert(r.getDouble(5) ==
        math.sqrt((n * s2 - s1 * s1).toDouble) / (n.toDouble * ExtQueries.EmbNormScale))
      // sanity: unit-ish synthetic embeddings — no zero vectors expected,
      // and 2 sigma keeps outliers a small minority
      assert(nOut <= n / 4, s"label $label: 2-sigma flagged more than a quarter")
    }
  }
}
