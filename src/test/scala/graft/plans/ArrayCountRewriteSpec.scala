package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, ArrayFilter}
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** [[ArrayCountRewrite]] — the `size(filter)` replant must be invisible in
  * results (null elements, null-dropping predicates, empty and null
  * arrays) and visible in the plan (no filtered-array materialization);
  * two-argument `(x, i)` lambdas must be left alone. Plan checks walk the
  * EXPRESSION TREE, not the plan string — `filter(arr, lambdafunction…)`
  * renders the argument first, so substring tests are vacuous. */
class ArrayCountRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** (#ArrayFilter, #ArrayAggregate) nodes in the optimized plan. */
  private def nodeCounts(q: DataFrame): (Int, Int) = {
    var filters = 0
    var aggs = 0
    q.queryExecution.optimizedPlan.transformAllExpressions {
      case e: ArrayFilter => filters += 1; e
      case e: ArrayAggregate => aggs += 1; e
    }
    (filters, aggs)
  }

  test("the natural spelling is replanted and results stay identical") {
    import spark.implicits._
    // range-driven arrays keep the expressions live (the intersect-spec
    // lesson: literals constant-fold before the rule is observable)
    // id 0: [0,1,2]        → evens: 2
    // id 1: [null,2,3]     → evens: 1 (null predicate drops the element)
    // id 2: [2,3,4]        → evens: 2
    val df = spark.range(0, 3).select($"id",
      when($"id" === 1, array(lit(null).cast("long"), $"id" + 1, $"id" + 2))
        .otherwise(array($"id", $"id" + 1, $"id" + 2)).as("a"))
    val q = df.select($"id",
      size(filter($"a", x => x % 2 === 0)).as("c"),
      size(filter(lit(null).cast("array<bigint>"), x => x > 0)).as("cn"),
      size(filter(array().cast("array<bigint>"), x => x > 0)).as("ce"))
    val (filters, aggs) = nodeCounts(q)
    assert(filters === 0,
      s"ArrayFilter still materializes:\n${q.queryExecution.optimizedPlan}")
    assert(aggs >= 1, s"rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
    val rows = q.orderBy("id").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(2, 1, 2))
    // null array → null count (size's non-legacy contract, preserved)
    assert(rows.forall(_.isNullAt(2)))
    assert(rows.forall(_.getInt(3) == 0))
  }

  test("two-argument (x, i) filter lambdas are left untouched") {
    import spark.implicits._
    val df = spark.range(0, 3).select(
      array($"id", $"id" + 1, $"id" + 2).as("a"))
    val q = df.select(expr("size(filter(a, (x, i) -> i % 2 = 0))").as("c"))
    val (filters, aggs) = nodeCounts(q)
    assert(filters === 1 && aggs === 0,
      s"indexed filter must not be rewritten (no index in the fold):\n" +
        q.queryExecution.optimizedPlan)
    assert(q.collect().map(_.getInt(0)).toSeq === Seq(2, 2, 2))
  }

  test("the quality battery's own spelling picks up the counting plan") {
    // qualitySignals spells size(filter(tk, ...)) twice per document —
    // the rule must fire on the real operator, not just synthetic frames
    val q = graft.queries.ExtQueries
      .qualityFilter(spark, "/root/testdata/sf0.001")
    val (filters, aggs) = nodeCounts(q)
    assert(filters === 0 && aggs >= 2,
      s"rule missed qualitySignals: filters=$filters aggs=$aggs")
  }
}
