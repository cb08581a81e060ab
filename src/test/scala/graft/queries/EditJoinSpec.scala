package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_edit_join` claims two things: (1) EXACTNESS — positional-q-gram
  * prefix candidate generation plus banded verify equals the naive
  * length-filtered Levenshtein truth (the Ed-Join count/position lemmas
  * are exact, not recall heuristics), and (2) SCALE — the filters generate
  * strictly fewer candidates than the naive pair space. The DuckDB oracle
  * re-checks (1) independently at sf0.01 with its own levenshtein(). */
class EditJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  /** Textbook full-matrix Levenshtein — deliberately NOT the banded form
    * the operator uses, so the two implementations can't share a bug. */
  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("prefix-filtered output equals the naive length-filtered truth") {
    import spark.implicits._
    val got = ExtQueries.editJoin(spark, dir)
      .as[(Long, Long, Int)].collect().toSet
    spark.catalog.clearCache()

    val keys = spark.read.parquet(s"$dir/documents.parquet")
      .filter("lang = 'en'").select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).replaceAll("[^a-zA-Z ]", "").toLowerCase))
      .filter(_._2.length >= ExtQueries.EditMinKeyLen)
    val truth = (for {
      (a, ka) <- keys; (b, kb) <- keys
      if a < b && math.abs(ka.length - kb.length) <= ExtQueries.EditTau
      d = lev(ka, kb) if d <= ExtQueries.EditTau
    } yield (a, b, d)).toSet
    assert(truth.nonEmpty, "fixture produced no pairs — the test is vacuous")
    assert(got == truth)
  }

  test("prefix + positional + length filters prune the naive pair space") {
    val (cand, naive) = ExtQueries.editJoinCandidateCounts(spark, dir)
    assert(cand < naive, s"filters pruned nothing: $cand vs $naive")
    assert(cand.toDouble / naive < 0.5,
      s"filters pruned <50%: $cand of $naive")
  }

  test("the df dictionary joins broadcast; no cartesian anywhere") {
    val plan = ExtQueries.editJoin(spark, dir)
      .queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
