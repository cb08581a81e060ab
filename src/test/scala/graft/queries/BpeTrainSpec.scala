package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_bpe_train` claims: the distributed count→argmax→string-rewrite chain
  * equals the CLASSIC sequential BPE trainer (greedy left-to-right
  * non-overlapping merge scan per word, frequency-weighted pair counts,
  * (n DESC, lhs, rhs) tie-break) — the string-replace device must be
  * indistinguishable from the per-word scan it replaces — and its first
  * round is exactly `e_bpe_merges`' top-ranked pair. */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  /** Sequential greedy merge: one left-to-right pass, non-overlapping. */
  private def applyMerge(s: Vector[String], l: String, r: String): Vector[String] = {
    val buf = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { buf += (l + r); i += 2 }
      else { buf += s(i); i += 1 }
    }
    buf.result()
  }

  private def localTrain(rounds: Int): Seq[(Int, String, String, Long)] = {
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    var vocab: Map[Vector[String], Long] = words.groupBy(_._1.split("").filter(_.nonEmpty).toVector)
      .map { case (syms, ws) => syms -> ws.values.sum }
    (1 to rounds).map { it =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, wc) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + wc
        }
      }
      val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.toSeq.map { case (syms, wc) => (applyMerge(syms, l, r), wc) }
        .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      (it, l, r, n)
    }
  }

  test("matches the sequential BPE trainer round for round") {
    import spark.implicits._
    val got = ExtQueries.bpeTrain(spark, dir)
      .as[(Int, String, String, Long)].collect().toSeq
    spark.catalog.clearCache()
    val want = localTrain(ExtQueries.BpeTrainRounds)
    assert(got == want, s"distributed chain diverged:\n got=$got\nwant=$want")
    // non-vacuous: by round 6 at least one merge must build on an earlier
    // merged symbol (a multi-char lhs or rhs), or the chain never chained
    assert(got.exists { case (_, l, r, _) => l.length > 1 || r.length > 1 },
      "no merge consumed a previously merged symbol — chain is vacuous")
  }

  test("encoder serves the trained rules: local replay of the merge table") {
    import spark.implicits._
    val enc = ExtQueries.bpeEncode(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    spark.catalog.clearCache()
    val rules = localTrain(ExtQueries.BpeTrainRounds).map(m => (m._2, m._3))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, t) =>
      val words = t.trim.split("\\s+").filter(_.nonEmpty)
      val nBpe = words.map { w =>
        var syms = w.split("").filter(_.nonEmpty).toVector
        rules.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
        syms.length.toLong
      }.sum
      (id, words.length.toLong, nBpe)
    }.filter(_._2 > 0).sortBy(_._1)
    assert(enc.map(e => (e._1, e._2, e._3)).toSeq == want.toSeq)
    enc.foreach(e => assert(e._4 == e._3.toDouble / e._2.toDouble))
    // non-vacuous: the learned merges must actually compress — some doc's
    // BPE count is strictly below its character count
    val chars = docs.toMap
    assert(enc.exists { e =>
      e._3 < chars(e._1).trim.split("\\s+").filter(_.nonEmpty).map(_.length.toLong).sum })
  }

  test("round 1 is e_bpe_merges' top-ranked pair") {
    import spark.implicits._
    val first = ExtQueries.bpeTrain(spark, dir)
      .as[(Int, String, String, Long)].collect().minBy(_._1)
    spark.catalog.clearCache()
    val top = ExtQueries.bpeMerges(spark, dir)
      .as[(String, Long)].collect().head
    spark.catalog.clearCache()
    assert(first._2 + first._3 == top._1 && first._4 == top._2)
  }
}
