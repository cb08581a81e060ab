package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Custom optimizer rule (the [[SetIntersectCountRewrite]] sibling for
  * higher-order functions): `size(filter(arr, f))` never needs the
  * filtered ARRAY — Spark's `ArrayFilter` copies every passing element
  * into a fresh result array, which `size` immediately throws away. The
  * rule replants the pattern as a fold,
  * `aggregate(arr, 0, (acc, x) -> if(f(x), acc + 1, acc))`, which counts
  * in a single int accumulator with zero per-row allocation. The repo's
  * own quality battery spells exactly this shape twice per document
  * (`n_long_tokens`, `n_stop` in `qualitySignals`), as does `textStats` —
  * the natural spelling now gets the counting plan automatically.
  *
  * SOUNDNESS: `ArrayFilter` keeps an element iff the predicate evaluates
  * to `true` — a null predicate result DROPS the element — and `If`
  * likewise takes the else branch on a null condition, so the fold counts
  * exactly the kept elements. A null input array folds to null, matching
  * `size`'s non-legacy null-in → null-out contract, so the rewrite only
  * fires when `legacySizeOfNull` is false (the `Size(_, false)` pattern —
  * same guard as the intersect rewrite). The count type stays `size`'s
  * INT: array lengths are ints, so the accumulator cannot overflow.
  * Two-argument `(x, i)` filter lambdas are left untouched (the aggregate
  * form has no index to offer). The filter's own bound lambda variable is
  * REUSED as the fold's element argument, so the predicate body's
  * references stay valid without alpha-renaming.
  *
  * Idempotent (the replanted expression no longer matches the pattern),
  * so the fixed-point optimizer batch converges. */
object ArrayCountRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayFilter(arg, f: LambdaFunction), false)
          if f.resolved && f.arguments.length == 1 &&
            f.arguments.head.isInstanceOf[NamedLambdaVariable] =>
        val elem = f.arguments.head.asInstanceOf[NamedLambdaVariable]
        val acc = NamedLambdaVariable("acc", IntegerType, nullable = false)
        val out = NamedLambdaVariable("count", IntegerType, nullable = false)
        ArrayAggregate(
          arg,
          Literal(0),
          LambdaFunction(
            If(f.function, Add(acc, Literal(1)), acc), Seq(acc, elem)),
          LambdaFunction(out, Seq(out)))
    }
}
