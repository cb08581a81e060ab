package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Floor-division nanosecond→microsecond conversion as a NAMED Catalyst
  * expression. Semantically it is just `floorDiv(ns, 1000)`, but giving the
  * conversion its own node is what makes the optimizer extension sound:
  * [[graft.plans.NanosDatePushdown]] rewrites date predicates over
  * `timestamp_micros(NanosToMicros(raw))` into raw-range predicates, and it
  * may do so precisely BECAUSE this node guarantees the monotone floor-div
  * semantics (floorDiv(ns,1000) ≥ X·1000 ⟺ ns ≥ X·1000) — an anonymous
  * arithmetic tree could not be matched or trusted the same way.
  */
case class NanosToMicros(child: Expression) extends UnaryExpression {

  // LONG ONLY, no implicit coercion: applied to a TIMESTAMP/_NTZ column this
  // would "work" (internal micros reinterpreted as nanos) and silently shift
  // every timestamp by 1000× — exactly what happened when the events fixture
  // changed physical type under round 8's unconditional conversion. Failing
  // analysis is the correct behavior.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nanos_to_micros expects a raw-nanos BIGINT column, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "nanos_to_micros"

  override def nullSafeEval(input: Any): Any =
    Math.floorDiv(input.asInstanceOf[Long], 1000L)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.floorDiv($c, 1000L)")

  override protected def withNewChildInternal(newChild: Expression): NanosToMicros =
    copy(child = newChild)
}
