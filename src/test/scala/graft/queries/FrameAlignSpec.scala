package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_frame_align` — modal-delta temporal alignment for detected clip
  * pairs. Replays the vote → modal-pick sequentially from the pairs the
  * detector reports, and pins the fixture truth: a one-frame prefix clip
  * aligns at offset +1 with full-coverage matches. */
class FrameAlignSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def cpSub(s: String, a: Int, len: Int): String = {
    val start = s.offsetByCodePoints(0, a)
    s.substring(start, s.offsetByCodePoints(start, len))
  }

  private val w = ExtQueries.FrameWindowChars.toInt

  private def frameHashes(text: String): Vector[Long] = {
    val n = text.codePointCount(0, text.length)
    (0 until n / w).map(f =>
      h60("fv:" + cpSub(text, f * w, w)) % ExtQueries.FrameHashMod).toVector
  }

  test("alignment equals the sequential vote replay; clips align at +1") {
    val docs = RefQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val uni = (docs ++ docs.map { case (id, t) =>
      val n = t.codePointCount(0, t.length)
      // clamped so a fixture document shorter than one frame replays as
      // the empty clip (as the operator does) instead of throwing
      (id + ExtQueries.VariantIdOffset, cpSub(t, math.min(w, n), math.max(n - w, 0)))
    }).toMap
    val fhs = uni.view.mapValues(frameHashes).toMap

    val pairs = ExtQueries.frameDedup(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()

    val want = pairs.map { case (a, b) =>
      val (fa, fb) = (fhs(a), fhs(b))
      val votes = (for {
        (va, pa) <- fa.zipWithIndex
        (vb, pb) <- fb.zipWithIndex if va == vb
      } yield (pa - pb).toLong).groupBy(identity).view.mapValues(_.size.toLong)
      val (offset, n) = votes.minBy { case (d, c) => (-c, d) }
      (a, b) -> ((offset, n, votes.values.sum,
        fa.length.toLong, fb.length.toLong))
    }.toMap

    val got = ExtQueries.frameAlign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    spark.catalog.clearCache()
    assert(got == want, "alignment must equal the sequential vote replay")
    assert(got.nonEmpty)

    val clips = got.filter { case ((a, b), _) => b == a + ExtQueries.VariantIdOffset }
    assert(clips.nonEmpty)
    val atPlusOne = clips.count { case (_, (off, _, _, _, _)) => off == 1L }
    assert(atPlusOne * 2 > clips.size,
      s"most one-frame clips must align at +1, got $atPlusOne of ${clips.size}")
    // full coverage on aligned clips: every variant frame matches its
    // shifted original (n_matches at +1 == nf_b) unless in-doc hash
    // repeats add off-diagonal mass that outvotes it — which the replay
    // equality above already adjudicates
    clips.foreach { case ((a, b), (off, n, _, nfA, nfB)) =>
      assert(nfB == nfA - 1, s"($a, $b): one-frame clip loses exactly one frame")
      if (off == 1L) assert(n >= nfB, s"($a, $b): +1 alignment must cover the clip")
    }
  }
}
