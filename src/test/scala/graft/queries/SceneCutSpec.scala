package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_scene_cut` — run-length temporal segmentation of the frame grid.
  * Replays the whole pipeline sequentially (code-point windows → frame
  * hash → quantized level → run-length → packed-int keyframe argmin) and
  * pins exact equality, plus the structural invariants: segments
  * partition [0, nf) contiguously and the keyframe lies inside its
  * segment. */
class SceneCutSpec extends AnyFunSuite {
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

  test("segments equal the sequential run-length replay and tile the grid") {
    val docs = RefQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val want = docs.flatMap { case (id, t) =>
      val n = t.codePointCount(0, t.length)
      val fhs = (0 until n / w).map(f =>
        h60("fv:" + cpSub(t, f * w, w)) % ExtQueries.FrameHashMod).toVector
      val levels = fhs.map(_ / ExtQueries.SceneLevelDiv)
      if (fhs.isEmpty) Seq.empty
      else {
        // run-length over (pos, level); keyframe = min (v, pos) packed
        val segs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
        var segStart = 0
        for (p <- 1 to fhs.length) {
          if (p == fhs.length || levels(p) != levels(segStart)) {
            val frames = (segStart until p).map(i =>
              fhs(i) * ExtQueries.SceneKeyBase + i)
            val kf = frames.min
            segs += ((segStart.toLong, (p - segStart).toLong, levels(segStart),
              kf % ExtQueries.SceneKeyBase, kf / ExtQueries.SceneKeyBase))
            segStart = p
          }
        }
        segs.zipWithIndex.map { case ((st, nf, lv, kp, kh), si) =>
          (id, si.toLong) -> ((st, nf, lv, kp, kh))
        }
      }
    }.toMap

    val got = ExtQueries.sceneCut(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    spark.catalog.clearCache()

    assert(got == want, "segmentation must equal the sequential replay")
    assert(got.nonEmpty)
    // structural: per doc, segments are contiguous and tile [0, nf)
    got.groupBy(_._1._1).foreach { case (_, m) =>
      val ordered = m.toSeq.sortBy(_._1._2)
      assert(ordered.map(_._1._2) == ordered.indices.map(_.toLong),
        "seg ids must be dense from 0")
      var next = 0L
      ordered.foreach { case (_, (st, nf, _, kp, _)) =>
        assert(st == next, "segments must be contiguous")
        assert(kp >= st && kp < st + nf, "keyframe must lie in its segment")
        next = st + nf
      }
    }
    // the level knob produces genuine multi-frame runs somewhere
    assert(got.values.exists(_._2 > 1L), "fixture must contain a run > 1")
  }
}
