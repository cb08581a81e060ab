package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_span_mask` structural contract: the plan must be a valid, budgeted,
  * non-overlapping span set — the properties a batch builder relies on. */
class SpanMaskSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val byDoc = {
    val rows = ExtQueries.spanMask(spark, dir)
      .select("doc_id", "span_idx", "start_tok", "span_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1)
  }

  private lazy val nTokens: Map[Long, Long] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").length.toLong).toMap

  test("span count is the exact 15% budget and every span stays in bounds") {
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (doc, spans) =>
      val n = nTokens(doc)
      assert(spans.length == (n / ExtQueries.SpanEvery).toInt,
        s"doc $doc: ${spans.length} spans for $n tokens")
      spans.foreach { case (_, _, start, len) =>
        assert(len == ExtQueries.SpanLen)
        assert(start >= 0 && start + len <= n, s"doc $doc span at $start out of [0, $n)")
      }
    }
    // short documents are excluded, not given a zero-span placeholder
    val planned = byDoc.keySet
    nTokens.foreach { case (doc, n) =>
      assert(planned.contains(doc) == (n >= ExtQueries.SpanEvery), s"doc $doc n=$n")
    }
  }

  test("spans never overlap (segment confinement)") {
    byDoc.foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._2).map(s => (s._3, s._3 + s._4))
      sorted.sliding(2).foreach {
        case Array((_, e1), (s2, _)) =>
          assert(e1 <= s2, s"doc $doc: span ending $e1 overlaps next starting $s2")
        case _ =>
      }
    }
  }
}
