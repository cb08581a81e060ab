package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The seq-pack floor-div contract: block indices use integer `div`
  * (truncates toward zero) while the DuckDB oracle floors (`//`) — they
  * agree only while `cum − 1 ≥ 0`, i.e. while every document has
  * n_tokens ≥ 1. The guard must fail LOUD on the edge instead of silently
  * diverging cross-engine. */
class SeqPackSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def messages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("zero-token row raises with the offending doc_id") {
    import spark.implicits._
    val bad = Seq((1L, "web", 3L), (7L, "web", 0L))
      .toDF("doc_id", "source", "n_tokens")
    val ex = intercept[Throwable] {
      ExtQueries.packTokens(bad).collect()
    }
    spark.catalog.clearCache() // packTokens persists its guarded count frame
    val msg = messages(ex)
    assert(msg.contains("e_seq_pack") && msg.contains("7"), msg.take(500))
  }

  test("NULL token count raises too (a NULL text upstream must not pack)") {
    import spark.implicits._
    val bad = Seq((1L, "web", Some(3L)), (9L, "web", None))
      .toDF("doc_id", "source", "n_tokens")
    val ex = intercept[Throwable] {
      ExtQueries.packTokens(bad).collect()
    }
    spark.catalog.clearCache()
    assert(messages(ex).contains("e_seq_pack"))
  }

  test("two-level prefix scan equals the sequential per-source running sum") {
    import spark.implicits._
    // 600 docs across 5 segments (width 128), 3 sources interleaved, token
    // counts varied — every segment boundary and an off-boundary source mix
    val counts = (0L until 600L).map(i =>
      (i, s"src${i % 3}", 1L + (i * 7919) % 512))
    val got = ExtQueries.packTokens(counts.toDF("doc_id", "source", "n_tokens"))
      .select("doc_id", "start_off", "first_block", "last_block", "n_blocks")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    spark.catalog.clearCache()
    val b = ExtQueries.PackBlockTokens
    val want = counts.groupBy(_._2).values.flatMap { group =>
      var cum = 0L
      group.sortBy(_._1).map { case (id, _, n) =>
        cum += n
        val first = (cum - n) / b; val last = (cum - 1) / b
        id -> ((cum - n, first, last, last - first + 1))
      }
    }.toMap
    assert(got == want)
  }

  test("block arithmetic on a hand-computed fixture (boundary-straddling doc)") {
    import spark.implicits._
    val b = ExtQueries.PackBlockTokens // 256
    val counts = Seq(
      (1L, "web", 200L), // blocks [0,0], start 0
      (2L, "web", 100L), // cum 300: start 200, blocks [0,1] — straddles
      (3L, "web", 212L), // cum 512: start 300, blocks [1,1] — ends exactly
      (4L, "web", 1L),   // cum 513: start 512, blocks [2,2]
      (5L, "lab", 256L)  // independent source: start 0, blocks [0,0]
    ).toDF("doc_id", "source", "n_tokens")
    val got = ExtQueries.packTokens(counts)
      .select("doc_id", "start_off", "first_block", "last_block", "n_blocks")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(b === 256L) // fixture above is hand-computed against this
    assert(got(1L) === ((0L, 0L, 0L, 1L)))
    assert(got(2L) === ((200L, 0L, 1L, 2L)))
    assert(got(3L) === ((300L, 1L, 1L, 1L)))
    assert(got(4L) === ((512L, 2L, 2L, 1L)))
    assert(got(5L) === ((0L, 0L, 0L, 1L)))
  }
}
