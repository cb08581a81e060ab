package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_frame_dedup` — temporal frame-sequence near-dup. The whole pipeline
  * (fixed-width code-point frame grid → coarse frame hashes →
  * adjacent-pair shingles → df-capped postings candidates → Jaccard ≥ ½
  * verify) is replayed sequentially driver-side and compared as an
  * EQUALITY; the clip fixture (every doc minus its first frame) must
  * actually be detected — the property [[ExtQueries.mediaDedup]]'s
  * whole-payload signature is blind to. */
class FrameDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Code-point substring [a, a+len) — matches Spark/DuckDB `substr`. */
  private def cpSub(s: String, a: Int, len: Int): String = {
    val start = s.offsetByCodePoints(0, a)
    s.substring(start, s.offsetByCodePoints(start, len))
  }

  private val w = ExtQueries.FrameWindowChars.toInt

  /** Distinct adjacent-frame shingle set of one payload. */
  private def shingles(text: String): Set[Long] = {
    val n = text.codePointCount(0, text.length)
    val nf = n / w
    val fh = (0 until nf).map(f =>
      h60("fv:" + cpSub(text, f * w, w)) % ExtQueries.FrameHashMod)
    (0 until nf - 1).map(f =>
      h60(s"fs:${fh(f)}:${fh(f + 1)}")
        % graft.functions.GraftFunctions.IntModulus).toSet
  }

  test("banded output equals the sequential replay; clip pairs are caught") {
    val docs = RefQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val uni = docs ++ docs.map { case (id, t) =>
      val n = t.codePointCount(0, t.length)
      // clamped so a fixture document shorter than one frame replays as
      // the empty clip (as the operator does) instead of throwing
      (id + ExtQueries.VariantIdOffset, cpSub(t, math.min(w, n), math.max(n - w, 0)))
    }
    val sets = uni.map { case (id, t) => (id, shingles(t)) }

    // df-capped rare postings → candidates → verify, replayed sequentially
    val df = sets.flatMap { case (id, ss) => ss.map(h => (h, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rare = df.filter(_._2.size <= 16)
    val cand: Set[(Long, Long)] = rare.values.flatMap { ids =>
      val s = ids.toSeq
      for (a <- s; b <- s if a < b) yield (a, b)
    }.toSet
    val byId = sets.toMap
    val want = cand.flatMap { case (a, b) =>
      val (sa, sb) = (byId(a), byId(b))
      val inter = (sa & sb).size
      val union = sa.size + sb.size - inter
      if (2 * inter >= union) Some((a, b, inter, union)) else None
    }

    val got = ExtQueries.frameDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    spark.catalog.clearCache()
    assert(got == want, "operator must equal the sequential replay exactly")
    assert(got.nonEmpty)
    val clipPairs = got.count { case (a, b, _, _) =>
      b == a + ExtQueries.VariantIdOffset }
    assert(clipPairs * 2 > docs.length,
      s"most one-frame clips must be detected, got $clipPairs of ${docs.length}")
  }

  test("df cap replay matches rareShinglePostings' constant") {
    // the spec's literal 16 must BE the operator's cap — fails loudly if
    // DedupEvalDfCap is ever retuned without updating the replay
    assert(ExtQueries.DedupEvalDfCap == 16)
  }

  test("plan: postings equi-join, no cartesian product, one persisted signature frame") {
    val plan = ExtQueries.frameDedup(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("InMemoryTableScan"),
      "signature frame feeds postings and verify and must persist:\n" + plan.take(800))
    spark.catalog.clearCache()
  }
}
