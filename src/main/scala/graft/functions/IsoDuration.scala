package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** ISO-8601 duration → total seconds.
  *
  * Re-expresses the reference's `convert_pt_to_seconds`
  * (reference: dags/trending_daily_ingestion.py:40-42, which delegates to
  * `isodate.parse_duration("PT3M59S").total_seconds()`; raw input form at
  * reference assets/2025-10-06.json:64). Supported forms: `P[nW]`,
  * `P[nD][T[nH][nM][nS]]` — the shapes YouTube emits plus day/week variants.
  *
  * Implemented as a single-pass char scanner (no regex, no allocation) so the
  * generated code stays inside whole-stage codegen via [[ParseIso8601Duration]].
  */
object IsoDuration {
  /** @return seconds, or Long.MinValue to signal a malformed input (mapped to null). */
  def parseSecondsOrMin(u: UTF8String): Long = {
    if (u == null) return Long.MinValue
    val s = u.toString
    val n = s.length
    if (n < 2 || s.charAt(0) != 'P') return Long.MinValue
    var i = 1
    var inTime = false
    var total = 0L
    var sawField = false
    while (i < n) {
      val c = s.charAt(i)
      if (c == 'T') { inTime = true; i += 1 }
      else {
        var v = 0L
        var digits = 0
        var j = i
        while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9') {
          v = v * 10 + (s.charAt(j) - '0'); digits += 1; j += 1
        }
        // Overflow guard: >18 digits overflows the accumulator itself — map
        // to the malformed sentinel (null downstream) instead of silently
        // wrapping to wrong/negative seconds.
        if (digits == 0 || digits > 18 || j >= n) return Long.MinValue
        val unit = s.charAt(j)
        val mult = unit match {
          case 'W' if !inTime => 604800L
          case 'D' if !inTime => 86400L
          case 'H' if inTime  => 3600L
          case 'M' if inTime  => 60L
          case 'S' if inTime  => 1L
          case _              => -1L
        }
        if (mult < 0) return Long.MinValue
        // v*mult and total+… must not wrap (same sentinel-on-overflow policy).
        if (v > (Long.MaxValue - 1) / mult) return Long.MinValue
        val add = v * mult
        if (total > Long.MaxValue - 1 - add) return Long.MinValue
        total += add
        sawField = true
        i = j + 1
      }
    }
    if (sawField) total else Long.MinValue
  }
}

/** Catalyst-native scalar expression for [[IsoDuration]]: codegen-friendly
  * (a static call — stays inside WholeStageCodegen), null-safe, returns null
  * on malformed input (mirrors the reference's implicit "trust the API" path
  * while being defensive at 100 TB where malformed rows are a certainty).
  */
case class ParseIso8601Duration(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "iso_duration_seconds"

  override def nullSafeEval(input: Any): Any = {
    val r = IsoDuration.parseSecondsOrMin(input.asInstanceOf[UTF8String])
    if (r == Long.MinValue) null else java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val r = ctx.freshName("isoSecs")
    ev.copy(code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = true;
         |long ${ev.value} = 0L;
         |if (!${childGen.isNull}) {
         |  long $r = graft.functions.IsoDuration.parseSecondsOrMin(${childGen.value});
         |  if ($r != Long.MIN_VALUE) { ${ev.isNull} = false; ${ev.value} = $r; }
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ParseIso8601Duration =
    copy(child = newChild)
}
