package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_token_budget` — the allocation must replay the greedy walk over the
  * quality ranking exactly, spend the whole budget (Σ alloc = min(budget,
  * total)), and have the greedy SHAPE: fully-taken prefix, at most one
  * partial boundary source, zeros after. */
class TokenBudgetSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("allocation replays the greedy quality-ranked walk; budget identities hold") {
    import org.apache.spark.sql.functions.col
    val qs = ExtQueries.qualitySignals(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("source"), col("text")))
      .select("source", "n_tokens", "keep").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getBoolean(2)))
    val bySrc = qs.groupBy(_._1).map { case (s, rows) =>
      (s, rows.length.toLong, rows.map(_._2).sum, rows.count(_._3).toLong)
    }.toSeq
    val total = bySrc.map(_._3).sum
    val budget = total * ExtQueries.BudgetNum / ExtQueries.BudgetDen
    val rankedOrder = bySrc
      .sortBy { case (s, nd, _, nk) => (-(nk.toDouble / nd.toDouble), s) }
    val want = rankedOrder.scanLeft(("", 0L, 0L)) {
      case ((_, cumAfter, _), (s, _, tok, _)) =>
        (s, cumAfter + tok, math.max(0L, math.min(tok, budget - cumAfter)))
    }.drop(1).map(t => t._1 -> t._3).toMap

    val got = ExtQueries.tokenBudget(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(got.map(t => t._1 -> t._6).toMap == want)
    // counts per source replay
    val stats = bySrc.map(t => t._1 -> (t._2, t._3, t._4)).toMap
    for ((s, nd, tok, nk, _, _, _) <- got)
      assert((nd, tok, nk) == stats(s), s"source $s stats")
    // the budget is spent exactly (it is < total by construction here)
    assert(got.map(_._6).sum == math.min(budget, total))
    // greedy shape along the ranking: full prefix, <=1 partial, zeros after
    val inOrder = rankedOrder.map(_._1).map(s => got.find(_._1 == s).get)
    val partials = inOrder.count(t => t._6 > 0 && t._6 < t._3)
    assert(partials <= 1)
    val firstZero = inOrder.indexWhere(_._6 == 0L)
    if (firstZero >= 0)
      assert(inOrder.drop(firstZero).forall(_._6 == 0L), "zeros must be a suffix")
    for (t <- got) assert(t._7 == (t._6 == t._3))
  }
}
