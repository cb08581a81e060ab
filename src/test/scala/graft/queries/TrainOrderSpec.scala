package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_train_order` — deterministic global shuffle. Pins that `pos` is a
  * contiguous permutation, that the whole ordering matches a local
  * recomputation of the salted content-hash sort (so the two-level
  * segment/offset device produces EXACTLY the single-sort integers), and
  * that the permutation actually interleaves sources (the property a
  * training run buys it for). */
class TrainOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def hash64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("pos is the contiguous permutation of the salted content-hash sort") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val want = docs
      .map { case (id, text) => (hash64(ExtQueries.TrainOrderSalt + text), id) }
      .sortBy(identity)
      .zipWithIndex
      .map { case ((_, id), i) => id -> (i + 1L) }
      .toMap

    val got = ExtQueries.trainOrder(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    spark.catalog.clearCache() // the keyed frame persists

    assert(got.keySet == want.keySet)
    assert(got.values.toSeq.sorted == (1L to docs.length).toSeq,
      "pos must be a contiguous 1..N permutation")
    for ((id, p) <- want)
      assert(got(id) == p, s"doc $id: two-level pos != single-sort pos")
  }

  test("the permutation interleaves sources") {
    val rows = ExtQueries.trainOrder(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    spark.catalog.clearCache()
    val n = rows.length
    val bySource = rows.groupBy(_._1)
    // every source with enough mass appears in every fifth of the order —
    // a content-hash order that clumped a source would fail this
    for ((src, rs) <- bySource if rs.length >= 50) {
      val fifths = rs.map { case (_, p) => (p - 1) * 5 / n }.toSet
      assert(fifths == (0L until 5L).toSet,
        s"source $src (${rs.length} docs) missing from a fifth of the order")
    }
  }
}
