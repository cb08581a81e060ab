package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.SparkFixture
import graft.functions.SetOps

/** [[SetIntersectCountRewrite]] — the `size(array_intersect)` replant must
  * be invisible in results (multisets, duplicates, null elements, null
  * arrays) and visible in the plan (no ArrayIntersect materialization). */
class SetIntersectCountRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val bagGen: Gen[Seq[Option[Long]]] =
    Gen.listOf(Gen.frequency(
      9 -> Gen.chooseNum(-20L, 20L).map(Some(_)),
      1 -> Gen.const(None)))

  test("kernel equals array_intersect set semantics on random MULTISETS " +
      "with null elements (ScalaCheck)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val p = Prop.forAll(bagGen, bagGen) { (a: Seq[Option[Long]], b: Seq[Option[Long]]) =>
      val got = SetOps.intersectCountDistinct(
        ArrayData.toArrayData(a.map(_.map(Long.box).orNull).toArray),
        ArrayData.toArrayData(b.map(_.map(Long.box).orNull).toArray))
      // array_intersect emits each shared DISTINCT value once, null included
      val want = (a.toSet intersect b.toSet).size.toLong
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("the natural spelling is replanted and results stay identical, " +
      "including duplicates, shared nulls, and a null array") {
    import spark.implicits._
    // range-driven arrays keep the expressions live — a literal frame
    // constant-folds into a LocalRelation before the rule is observable
    // id 0: a=[0,0,1],  b=[0,1,null]  → 2   (dup counts once)
    // id 1: a=[null,2], b=[1,null,3]  → 1   (shared null counts once)
    // id 2: a=[2,2,3],  b=[2,3,6]     → 2
    val df = spark.range(0, 3).select($"id",
      when($"id" === 1, array(lit(null).cast("long"), $"id" + 1))
        .otherwise(array($"id", $"id", $"id" + 1)).as("a"),
      when($"id" === 1, array($"id", lit(null).cast("long"), $"id" + 2))
        .otherwise(array($"id", $"id" + 1, when($"id" === 2, $"id" + 4))).as("b"))
    val q = df.select($"id",
      size(array_intersect($"a", $"b")).as("c"),
      size(array_intersect(lit(null).cast("array<bigint>"), $"a")).as("cn"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("intersect_count_distinct"),
      s"rewrite did not fire:\n$plan")
    assert(!plan.contains("array_intersect"),
      s"ArrayIntersect still materializes:\n$plan")
    val rows = q.orderBy("id").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(2, 1, 2))
    // null array → null count (size's non-legacy contract, preserved)
    assert(rows.forall(_.isNullAt(2)))
  }

  test("distinct_count kernel equals array_distinct size on random multisets " +
      "(ScalaCheck)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val p = Prop.forAll(bagGen) { (a: Seq[Option[Long]]) =>
      val got = SetOps.distinctCount(
        ArrayData.toArrayData(a.map(_.map(Long.box).orNull).toArray))
      got == a.toSet.size.toLong
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("size(array_distinct) is replanted and results stay identical") {
    import spark.implicits._
    // id 0: [0,0,1] -> 2;  id 1: [null,2,null,2] -> 2;  id 2: [2,2,3] -> 2
    val df = spark.range(0, 3).select($"id",
      when($"id" === 1, array(lit(null).cast("long"), $"id" + 1,
          lit(null).cast("long"), $"id" + 1))
        .otherwise(array($"id", $"id", $"id" + 1)).as("a"))
    val q = df.select($"id",
      size(array_distinct($"a")).as("c"),
      size(array_distinct(lit(null).cast("array<bigint>"))).as("cn"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("distinct_count"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("array_distinct"),
      s"ArrayDistinct still materializes:\n$plan")
    val rows = q.orderBy("id").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(2, 2, 2))
    assert(rows.forall(_.isNullAt(2)))
  }

  test("rewrite leaves non-long element types to the built-in path") {
    import spark.implicits._
    val q = Seq((Seq("x", "y"), Seq("y"))).toDF("a", "b")
      .select(size(array_intersect($"a", $"b")).as("c"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("intersect_count_distinct"), plan)
    assert(q.collect().head.getInt(0) == 1)
  }
}
