package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_vec_quantize` against an independent scalar reimplementation of
  * symmetric INT8 quantization, plus the analytic error bounds the scheme
  * guarantees by construction. */
class VecQuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("scale and max error match the scalar reimplementation exactly") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = ExtQueries.vecQuantize(spark, dir).collect()
    assert(got.length == vecs.size)
    got.foreach { r =>
      val e = vecs(r.getLong(0))
      val scale = e.map(v => math.abs(v.toDouble)).max / 127.0
      val recon = e.map(v =>
        if (scale == 0) 0.0 else math.floor(v.toDouble / scale + 0.5) * scale)
      val maxErr = e.zip(recon).map { case (x, rr) => math.abs(x.toDouble - rr) }.max
      assert(r.getDouble(1) == scale)
      assert(r.getDouble(2) == maxErr)
    }
  }

  test("error bounded by scale/2; codes never clip; cosine survives to 4 nines") {
    val rows = ExtQueries.vecQuantize(spark, dir).collect()
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.foreach { r =>
      val (scale, maxErr) = (r.getDouble(1), r.getDouble(2))
      // round-to-nearest within [-amax, amax]: per-element error ≤ scale/2
      assert(maxErr <= scale / 2 + math.ulp(scale))
      // symmetric scale means the max element lands exactly on ±127
      val e = vecs(r.getLong(0))
      e.foreach { v =>
        val code = math.floor(v.toDouble / scale + 0.5)
        assert(code >= -127 && code <= 127, s"code $code clipped")
      }
      assert(!r.isNullAt(3) && r.getDouble(3) > 0.9999,
        s"cosine(orig, recon) ${r.getDouble(3)} below 4 nines")
    }
  }
}
