package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType
import graft.functions.NanosToMicros

/** Custom optimizer rule (§2.10 extension surface): date/timestamp
  * predicates over the derived nanos→micros timestamp push NOTHING to
  * parquet — the scan sees only a computed column. By the time extended
  * optimizer rules run, Spark's own unwrap rules have already turned
  * `to_date(x) = d` into timestamp-range comparisons, so the shape this
  * rule matches is `timestamp_micros(NanosToMicros(raw)) <cmp> tsLiteral`.
  * It APPENDS the equivalent raw-nanos range predicate on the underlying
  * column, which the v1 parquet source then pushes to row-group pruning.
  * Soundness comes from [[NanosToMicros]]'s monotone floor-div contract:
  * floorDiv(ns,1000) ≥ T ⟺ ns ≥ 1000·T (and the dual for <).
  *
  * The original predicate is kept (the extra conjunct is redundant but
  * free), so the rewrite can never change results — only the scan shape.
  * Idempotent: conjuncts already present are not re-added, so the fixed-
  * point optimizer batch converges.
  */
object NanosDatePushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** Post-build installation path for externally-constructed sessions
    * (extensions can only be injected at builder time;
    * `experimental.extraOptimizations` runs as a late optimizer batch).
    * Idempotent. Prefer `.withExtensions(new GraftExtensions)` where the
    * builder is yours — the extension point runs inside the main fixed-point
    * batch, before join planning. */
  def ensureInstalled(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(NanosDatePushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NanosDatePushdown
  }

  // stay far from Long overflow when scaling micros→nanos
  private def inRange(micros: Long): Boolean = math.abs(micros) < 9000000000000000L
  private def nanos(micros: Long): Expression = Literal(micros * 1000L)

  /** `timestamp_micros(NanosToMicros(raw))` — micros since epoch, derived
    * from the raw nanos column by guaranteed floor division. */
  private object NanosTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(NanosToMicros(raw)) => Some(raw)
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(t: Long, TimestampType) => Some(t)
      case _ => None
    }
  }

  private def rewrite(c: Expression): Seq[Expression] = c match {
    // floorDiv(ns,1000) = T  ⟺  ns ∈ [1000T, 1000T+1000)
    case EqualTo(NanosTs(raw), TsLit(t)) if inRange(t) =>
      Seq(GreaterThanOrEqual(raw, nanos(t)), LessThan(raw, nanos(t + 1L)))
    case EqualTo(TsLit(t), NanosTs(raw)) if inRange(t) =>
      Seq(GreaterThanOrEqual(raw, nanos(t)), LessThan(raw, nanos(t + 1L)))
    case GreaterThanOrEqual(NanosTs(raw), TsLit(t)) if inRange(t) =>
      Seq(GreaterThanOrEqual(raw, nanos(t)))
    case LessThanOrEqual(NanosTs(raw), TsLit(t)) if inRange(t) =>
      Seq(LessThan(raw, nanos(t + 1L)))
    case GreaterThan(NanosTs(raw), TsLit(t)) if inRange(t) =>
      Seq(GreaterThanOrEqual(raw, nanos(t + 1L)))
    case LessThan(NanosTs(raw), TsLit(t)) if inRange(t) =>
      Seq(LessThan(raw, nanos(t)))
    // literal-on-left mirrors
    case GreaterThanOrEqual(TsLit(t), NanosTs(raw)) if inRange(t) =>
      Seq(LessThan(raw, nanos(t + 1L)))
    case LessThanOrEqual(TsLit(t), NanosTs(raw)) if inRange(t) =>
      Seq(GreaterThanOrEqual(raw, nanos(t)))
    case GreaterThan(TsLit(t), NanosTs(raw)) if inRange(t) =>
      Seq(LessThan(raw, nanos(t)))
    case LessThan(TsLit(t), NanosTs(raw)) if inRange(t) =>
      Seq(GreaterThanOrEqual(raw, nanos(t + 1L)))
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extras = conjuncts.flatMap(rewrite)
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
      if (extras.isEmpty) f
      else Filter((conjuncts ++ extras).reduce(And), child)
  }
}

/** SparkSessionExtensions installer:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NanosDatePushdown)
    ext.injectOptimizerRule(_ => SetIntersectCountRewrite)
    ext.injectOptimizerRule(_ => ArrayCountRewrite)
  }
}
