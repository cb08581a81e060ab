package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_domain_drift` — the TV distances must equal an independent local
  * computation over the DENSE bucket grid (absent buckets contribute),
  * respect TV's [0,1] bounds, and the argmax decode must identify a
  * genuinely maximal bucket. */
class DomainDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def localTruth(): Map[String, (Long, Long, Int, Long)] = {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        math.min(r.getString(1).trim.split("\\s+").length
          / ExtQueries.DriftBucketTokens, ExtQueries.DriftMaxBucket)))
    val osb = rows.groupBy(identity).map { case ((s, b), g) => (s, b) -> g.length.toLong }
    val ns = rows.groupBy(_._1).map { case (s, g) => s -> g.length.toLong }
    val cb = rows.groupBy(_._2).map { case (b, g) => b -> g.length.toLong }
    val n = rows.length.toLong
    ns.map { case (s, nS) =>
      val terms = cb.toSeq.map { case (b, cB) =>
        b -> math.abs(osb.getOrElse((s, b), 0L) * n - cB * nS)
      }
      val tvNum = terms.map(_._2).sum
      val (topB, topT) = terms.minBy { case (b, t) => (-t, b) }
      s -> (nS, tvNum, topB, topT)
    }
  }

  test("TV numerators, argmax bucket, and bounds match the dense-grid truth") {
    val got = ExtQueries.domainDrift(spark, dir).collect()
    spark.catalog.clearCache()
    val want = localTruth()
    assert(got.length == want.size)
    for (r <- got) {
      val (nS, tvNum, topB, topT) = want(r.getString(0))
      assert(r.getLong(1) == nS)
      assert(r.getLong(2) == tvNum, s"tv_num mismatch for ${r.getString(0)}")
      val tv = r.getDouble(3)
      assert(tv >= 0.0 && tv <= 1.0, s"TV out of bounds: $tv")
      assert(r.getInt(4) == topB, s"top_bucket mismatch for ${r.getString(0)}")
      assert(r.getLong(5) == topT)
    }
  }

  test("a source distributed exactly like the corpus has zero drift") {
    // self-check of the formula on a synthetic frame: two sources with
    // IDENTICAL bucket histograms -> both TVs are exactly 0
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("a", 0), ("a", 0), ("a", 1), ("b", 0), ("b", 0), ("b", 1))
      .toDF("source", "b")
    val osb = df.groupBy("source", "b").agg(count(lit(1)).as("o"))
    val ns = osb.groupBy("source").agg(sum("o").as("n_s"))
    val cb = osb.groupBy("b").agg(sum("o").as("c_b"))
    val tot = cb.agg(sum("c_b").as("n_tot"))
    val tv = ns.crossJoin(broadcast(cb))
      .join(osb, Seq("source", "b"), "left").na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .groupBy("source")
      .agg(sum(abs(col("o") * col("n_tot") - col("c_b") * col("n_s"))).as("tv_num"))
      .collect()
    assert(tv.forall(_.getLong(1) == 0L))
  }
}
