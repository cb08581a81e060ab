package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_chunk_split` against an independent sequential walk of the
  * chunking rule (T-token chunks at stride S, last chunk reaches the
  * tail), plus the coverage/overlap properties the downstream encoder
  * relies on. */
class ChunkSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  private val T = ExtQueries.SplitChunkTokens
  private val S = ExtQueries.SplitChunkStride

  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
    .select("doc_id", "text").collect()
    .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").toSeq))
    .sortBy(_._1)

  private lazy val got = ExtQueries.chunkSplit(spark, dir).collect()
    .map(r => (r.getLong(0), r.getInt(2), r.getLong(3).toInt,
      r.getAs[Number]("n_chunk_tokens").intValue(), r.getString(5)))

  test("matches the sequential chunking walk exactly") {
    val want = docs.flatMap { case (id, t) =>
      val n = t.length
      val nChunks = (math.max(n - T, 0) + S - 1) / S + 1
      (0 until nChunks).map { i =>
        val start = i * S
        val chunk = t.slice(start, start + T)
        (id, i, start, chunk.length, chunk.mkString(" "))
      }
    }
    assert(got.sortBy(r => (r._1, r._2)).toSeq == want.toSeq)
  }

  test("coverage and overlap: every token in ≥1 chunk, stride-S starts, tail reached") {
    val byDoc = got.groupBy(_._1)
    docs.foreach { case (id, t) =>
      val chunks = byDoc(id).sortBy(_._2)
      assert(chunks.head._3 == 0, s"doc $id: first chunk starts at 0")
      assert(chunks.map(_._3).toSeq == chunks.indices.map(_ * S), s"doc $id: stride-S starts")
      val last = chunks.last
      assert(last._3 + last._4 == t.length, s"doc $id: last chunk reaches the tail")
      if (t.length <= T) assert(chunks.length == 1, s"doc $id: short doc = one chunk")
      // adjacent chunks overlap by T−S tokens (except a shorter final chunk,
      // which still overlaps by at least 1 — S < T guarantees no gaps)
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 < a._3 + a._4, s"doc $id: no gap between chunks")
        case _ => ()
      }
    }
  }
}
