package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}
import graft.functions.{DistinctCount, IntersectCountDistinct}

/** Custom optimizer rule (§2.10 extension surface, the
  * [[NanosDatePushdown]] sibling): `size(array_intersect(a, b))` over
  * long arrays never needs the intersection ARRAY — Spark's
  * `ArrayIntersect` routes both inputs through a boxed hash set and
  * materializes the result array, which `size` immediately throws away.
  * This rule replants the pattern as the primitive counting kernel
  * [[IntersectCountDistinct]] (cast back to `size`'s integer type), so
  * the natural spelling a user writes gets the no-allocation counter the
  * repo's Jaccard verifies call explicitly. The unary sibling
  * `size(array_distinct(x))` gets the same treatment via
  * [[DistinctCount]] — ArrayDistinct's boxed-set dedup array exists only
  * to be counted and discarded.
  *
  * SOUNDNESS on arbitrary inputs (not just the repo's set-typed columns):
  * the kernel reproduces `array_intersect`'s full semantics — each shared
  * DISTINCT value counts once regardless of duplicates, a null element
  * present on both sides counts once, and a null ARRAY yields null, which
  * matches `size`'s non-legacy null-in → null-out contract. The rewrite
  * therefore only fires when `legacySizeOfNull` is false (the modern
  * default); under the legacy `-1` contract the original expression is
  * kept. Results are bit-identical by construction — only the physical
  * work changes.
  *
  * Idempotent (the replanted expression no longer matches the pattern),
  * so the fixed-point optimizer batch converges. */
object SetIntersectCountRewrite extends Rule[LogicalPlan] {

  private def longArrays(a: Expression, b: Expression): Boolean =
    (a.dataType, b.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // a count is < 2³¹ by construction (array sizes are ints), so the
      // long→int cast can never overflow under either eval mode
      case Size(ai: ArrayIntersect, false) if longArrays(ai.left, ai.right) =>
        Cast(IntersectCountDistinct(ai.left, ai.right), IntegerType)
      // the unary sibling: size(array_distinct(x)) is a distinct COUNT —
      // ArrayDistinct's boxed-set dedup array is thrown away by size
      case Size(ad: ArrayDistinct, false)
          if ad.child.dataType.isInstanceOf[ArrayType] &&
            ad.child.dataType.asInstanceOf[ArrayType].elementType == LongType =>
        Cast(DistinctCount(ad.child), IntegerType)
    }
}
