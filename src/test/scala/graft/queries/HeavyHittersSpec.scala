package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_heavy_hitters` — the exact set {token : freq·k > N} found through
  * the Misra-Gries candidate pass; checked against a driver-side exact
  * count, plus the plan shape that makes it scale (no vocabulary-wide
  * aggregate before the candidate filter). */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("output is exactly the > N/k token set with exact frequencies") {
    val got = ExtQueries.heavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    val toks = RefQueries.table(spark, dir, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
    val n = toks.length.toLong
    val freq = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = freq.collect {
      case (t, f) if f * ExtQueries.HeavyHittersK > n => (t, f, n)
    }.toSet
    assert(got.toSet == want)
    assert(got.nonEmpty, "fixture corpus should have at least one heavy hitter")
    // report order: freq DESC, token ASC
    assert(got.toSeq == got.toSeq.sortBy(t => (-t._2, t._1)))
  }

  test("plan: sketch pass is one ObjectHashAggregate; recount joins a broadcast " +
      "candidate side; the vocabulary is never grouped before filtering") {
    val plan = ExtQueries.heavyHitters(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("ObjectHashAggregate"),
      s"the MG sketch should aggregate via ObjectHashAggregate:\n${plan.take(800)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the candidate filter must broadcast the <=k-1 rows:\n${plan.take(800)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(800))
  }
}
