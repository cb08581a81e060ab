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

    val got = ExtQueries.datasheet(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    clear()
    val want = Map(
      ("corpus", "n_docs") -> ts.length.toLong,
      ("corpus", "n_tokens") -> ts.map(_.getAs[Number]("n_tokens").longValue).sum,
      ("corpus", "n_chars") -> ts.map(_.getAs[Number]("n_chars").longValue).sum,
      ("corpus", "n_langs") -> ts.map(_.getAs[String]("lang")).distinct.length.toLong,
      ("corpus", "n_sources") -> ds.length.toLong,
      ("quality", "n_keep") -> qf.count(_.getAs[Boolean]("keep")).toLong,
      ("dedup", "n_near_dup_pairs") -> mh.length.toLong,
      ("dedup", "n_contaminated_docs") -> dc.length.toLong) ++
      sp.groupBy(_.getAs[String]("split")).map { case (s, rs) =>
        ("split", s"n_$s") -> rs.length.toLong
      }
    assert(got == want, s"card numbers diverge:\n got  $got\n want $want")
  }
}
