package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_fim_split` — PSM re-serialization must be LOSSLESS (prefix + middle
  * + suffix reassembles the original token sequence exactly), the cut
  * geometry must match the emitted text, pass-through rows must be
  * byte-identical to the source, and hash-fate selection must sit near
  * the pinned 1-in-FimRate rate. */
class FimSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("PSM segments reassemble the original document; geometry matches") {
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    val rows = ExtQueries.fimSplit(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSet == src.keySet)

    val pre = ExtQueries.FimPre
    val suf = ExtQueries.FimSuf
    val mid = ExtQueries.FimMid
    var nFim = 0
    for (r <- rows) {
      val (id, n, fim, lo, hi, text) = (r.getLong(0), r.getLong(1),
        r.getBoolean(2), r.getLong(3), r.getLong(4), r.getString(5))
      val orig = src(id)
      assert(n == orig.length)
      if (!fim) {
        assert(text == orig.mkString(" "), s"doc $id: pass-through mutated")
        assert(lo == n && hi == n)
      } else {
        nFim += 1
        assert(0 <= lo && lo <= hi && hi <= n)
        // parse PSM by sentinels: <pre> P <suf> S <mid> M
        assert(text.startsWith(pre))
        val afterPre = text.drop(pre.length)
        val iSuf = afterPre.indexOf(suf)
        val iMid = afterPre.indexOf(mid, iSuf)
        assert(iSuf >= 0 && iMid >= 0, s"doc $id: sentinels missing in '$text'")
        def toks(s: String): Seq[String] =
          s.trim.split("\\s+").toSeq.filter(_.nonEmpty)
        val p = toks(afterPre.take(iSuf))
        val sSeg = toks(afterPre.slice(iSuf + suf.length, iMid))
        val m = toks(afterPre.drop(iMid + mid.length))
        assert(p == orig.take(lo.toInt), s"doc $id: prefix mismatch")
        assert(m == orig.slice(lo.toInt, hi.toInt), s"doc $id: middle mismatch")
        assert(sSeg == orig.drop(hi.toInt), s"doc $id: suffix mismatch")
        // losslessness: P + M + S is exactly the original sequence
        assert((p ++ m ++ sSeg) == orig.filter(_.nonEmpty))
      }
    }
    // hash fate targets 1-in-FimRate; tolerate sampling noise on 150 docs
    val rate = nFim.toDouble / rows.length
    assert(rate > 0.3 && rate < 0.7, s"FIM rate $rate implausible for 1/2")
  }
}
