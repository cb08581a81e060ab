package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_datasheet` — the dataset card. Every number must equal the composed
  * graded operator's own aggregate, recomputed here from those operators'
  * collected outputs (the composition contract, end to end). */
class DatasheetSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("every card number equals its composed operator's own aggregate") {
    def clear(): Unit = spark.catalog.clearCache()
    val ts = ExtQueries.textStats(spark, dir).collect(); clear()
    val ds = ExtQueries.domainStats(spark, dir).collect(); clear()
    val sp = ExtQueries.corpusSplit(spark, dir).collect(); clear()
    val qf = ExtQueries.qualityFilter(spark, dir).collect(); clear()
    val mh = ExtQueries.minhashDedup(spark, dir).collect(); clear()
    val dc = ExtQueries.decontaminate(spark, dir).collect(); clear()
    val mod = ExtQueries.modularity(spark, dir).collect(); clear()
    val sil = ExtQueries.silhouette(spark, dir).collect(); clear()
    val gr = ExtQueries.graphRecall(spark, dir).collect(); clear()
    val cal = ExtQueries.calibration(spark, dir).collect(); clear()

    val rows = ExtQueries.datasheet(spark, dir).collect()
    val got = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    clear()
    // audit integers recomputed from the composed operators' own outputs
    // with the card's exactness devices (scaladoc): Σd_sum/2 recovers m,
    // and the card's one-pass identity Σ(4m·e_in − d_sum²) =
    // 2·Σd_sum·Σe_in − Σd_sum² must equal the per-cluster sum
    val sd = mod.map(_.getAs[Long]("d_sum")).sum
    val m = sd / 2
    val modQn = mod.map { r =>
      val d = r.getAs[Long]("d_sum")
      4L * m * r.getAs[Long]("e_in") - d * d
    }.sum
    assert(modQn ==
      2L * sd * mod.map(_.getAs[Long]("e_in")).sum -
        mod.map { r => val d = r.getAs[Long]("d_sum"); d * d }.sum)
    val silFp = sil.map(r => math.floor(r.getAs[Double]("s") * 1e6).toLong).sum
    val eceFp = cal.map(r => math.abs(
      r.getAs[Long]("n_correct") * 1000000L - r.getAs[Long]("sum_conf_fp"))).sum
    val want = Map(
      ("corpus", "n_docs") -> ts.length.toLong,
      ("corpus", "n_tokens") -> ts.map(_.getAs[Number]("n_tokens").longValue).sum,
      ("corpus", "n_chars") -> ts.map(_.getAs[Number]("n_chars").longValue).sum,
      ("corpus", "n_langs") -> ts.map(_.getAs[String]("lang")).distinct.length.toLong,
      ("corpus", "n_sources") -> ds.length.toLong,
      ("quality", "n_keep") -> qf.count(_.getAs[Boolean]("keep")).toLong,
      ("dedup", "n_near_dup_pairs") -> mh.length.toLong,
      ("dedup", "n_contaminated_docs") -> dc.length.toLong,
      ("audit", "modularity_q") -> modQn,
      ("audit", "silhouette_mean") -> silFp,
      ("audit", "knn_edge_recall") -> gr.map(_.getAs[Long]("n_hit")).sum,
      ("audit", "calibration_ece") -> eceFp) ++
      sp.groupBy(_.getAs[String]("split")).map { case (s, rs) =>
        ("split", s"n_$s") -> rs.length.toLong
      }
    assert(got == want, s"card numbers diverge:\n got  $got\n want $want")

    // audit ratios: ONE divide from the exact integers just replayed
    val gotDbl = rows.filter(_.getString(0) == "audit")
      .map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(gotDbl("modularity_q") ==
      modQn.toDouble / (sd.toDouble * sd.toDouble))
    assert(gotDbl("silhouette_mean") == silFp.toDouble / (sil.length * 1e6))
    assert(gotDbl("knn_edge_recall") ==
      gr.map(_.getAs[Long]("n_hit")).sum.toDouble /
        gr.map(_.getAs[Long]("n_true")).sum.toDouble)
    assert(gotDbl("calibration_ece") ==
      eceFp.toDouble / (1e6 * cal.map(_.getAs[Long]("n_docs")).sum.toDouble))
  }
}
