package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** [[TopKByScoreAggregator]] unit semantics: compaction losslessness and
  * merge-order independence — the two properties that make the distributed
  * aggregate bit-identical to a sequential sort. */
class TopKAggregatorSpec extends AnyFunSuite {
  private val k = 3
  private def agg = new TopKByScoreAggregator(k)

  // deterministic pseudo-random stream without Random (stable fixture)
  private val items: Seq[ScoredId] =
    (0 until 200).map(i => ScoredId(((i * 7919) % 997) / 997.0, i.toLong))

  private def expected(xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  test("reduce through the compaction path equals the full sort") {
    val a = agg
    val buf = items.foldLeft(a.zero)(a.reduce) // 200 items > cap=12: compacts
    assert(a.finish(buf) == expected(items))
  }

  test("merge is order-independent and lossless across splits") {
    val a = agg
    for (split <- Seq(1, 50, 100, 199)) {
      val (l, r) = items.splitAt(split)
      val bl = l.foldLeft(a.zero)(a.reduce)
      val br = r.foldLeft(a.zero)(a.reduce)
      assert(a.finish(a.merge(bl, br)) == expected(items))
      val bl2 = l.foldLeft(a.zero)(a.reduce)
      val br2 = r.foldLeft(a.zero)(a.reduce)
      assert(a.finish(a.merge(br2, bl2)) == expected(items))
    }
  }

  test("token variant: compaction, split-merge, and tie order match the full sort") {
    val a = new TopKTokensAggregator(k)
    val toks = (0 until 150).map(i => CountedToken((i * 31) % 17, f"t$i%03d"))
    def expect(xs: Seq[CountedToken]) = xs.sortBy(t => (-t.n, t.token)).take(k)
    assert(a.finish(toks.foldLeft(a.zero)(a.reduce)) == expect(toks))
    val (l, r) = toks.splitAt(77)
    assert(a.finish(a.merge(l.foldLeft(a.zero)(a.reduce),
      r.foldLeft(a.zero)(a.reduce))) == expect(toks))
    val tied = Seq(CountedToken(5, "zz"), CountedToken(5, "aa"), CountedToken(5, "mm"))
    assert(a.finish(tied.foldLeft(a.zero)(a.reduce)).map(_.token) == Seq("aa", "mm", "zz"))
  }

  test("ties break toward the lowest id; short groups return all") {
    val a = agg
    val tied = Seq(ScoredId(0.5, 9), ScoredId(0.5, 2), ScoredId(0.5, 7), ScoredId(0.5, 1))
    val buf = tied.foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf).map(_.id) == Seq(1L, 2L, 7L))
    val short = Seq(ScoredId(0.1, 5))
    assert(a.finish(short.foldLeft(a.zero)(a.reduce)) == short)
  }
}
