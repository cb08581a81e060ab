package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.queries.RefQueries

/** The multimodal decode plumbing: typed binary payloads through a
  * mapPartitions feature extractor with per-PARTITION codec init. */
class MediaDecodeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("features are deterministic and byte-derived") {
    val docs = RefQueries.table(spark, "/root/testdata/sf0.001", "documents")
    val media = MediaDecode.mediaFromDocuments(docs)
    val feats = MediaDecode.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(feats.size === 500)
    // recompute one row's expectation independently
    val row = docs.filter("doc_id = 0").collect()(0)
    val payload = row.getAs[String]("text").getBytes("UTF-8")
    val codec = new MediaDecode.StubCodec
    val (w, h, fr) = codec.decode(payload)
    assert(feats(0L).n_bytes === payload.length)
    assert(feats(0L).checksum === codec.checksum(payload))
    assert((feats(0L).width, feats(0L).height, feats(0L).n_frames) === ((w, h, fr)))
    // running it twice yields identical output (pure, deterministic)
    val again = MediaDecode.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(again === feats)
  }

  test("codec initializes once per partition, not per row") {
    val docs = RefQueries.table(spark, "/root/testdata/sf0.001", "documents").repartition(7)
    val media = MediaDecode.mediaFromDocuments(docs)
    val acc = spark.sparkContext.longAccumulator("codecInits")
    val n = MediaDecode.extractFeatures(media, Some(acc)).count()
    assert(n === 500L)
    assert(acc.value === 7L, "codec must init per partition (7), not per row (500)")
  }
}
