package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_curriculum_order` — the staged easy-first schedule. Pins that `pos`
  * is the contiguous (bucket, salted-hash, doc_id) rank (two-level device
  * ≡ single sort), that stages are CONTIGUOUS position ranges in bucket
  * order (the property a curriculum buys), and that within a stage the
  * order is the salted hash, not doc id (actually shuffled). */
class CurriculumOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def hash64(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("two-level pos equals the single-sort rank; stages are contiguous and shuffled") {
    val buckets = ExtQueries.lmBuckets(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    spark.catalog.clearCache()
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = buckets.toSeq
      .map { case (id, b) =>
        (b, hash64(ExtQueries.CurriculumSalt + texts(id)), id) }
      .sorted.zipWithIndex
      .map { case ((_, _, id), i) => id -> (i + 1L) }.toMap

    val rows = ExtQueries.curriculumOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    for ((id, b, pos) <- rows) {
      assert(b == buckets(id))
      assert(pos == want(id), s"doc $id: two-level pos != single-sort pos")
    }
    // stage contiguity: positions of bucket b all precede bucket b+1
    val byBucket = rows.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    for (b <- byBucket.keys.toSeq.sorted.init) {
      val nextB = byBucket.keys.filter(_ > b)
      if (nextB.nonEmpty)
        assert(byBucket(b).max < byBucket(nextB.min).min,
          s"stage $b must fully precede stage ${nextB.min}")
    }
    // within the largest stage, hash order must differ from doc-id order
    val big = byBucket.maxBy(_._2.length)._1
    val stage = rows.filter(_._2 == big).sortBy(_._3).map(_._1)
    assert(stage.length < 3 || stage != stage.sorted,
      "within-stage order should be the salted hash, not ascending doc id")
  }
}
